import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stllm_tpu.common.config import Config, ConfigDict, apply_dotlist, deep_merge, wrap
from stllm_tpu.common.logging import MetricLogger, SmoothedValue
from stllm_tpu.common.optim import (
    cosine_lr_schedule,
    linear_warmup_cosine_hf,
    make_optimizer,
    step_lr_schedule,
    weight_decay_mask,
)
from stllm_tpu.common.registry import registry
from stllm_tpu.parallel.mesh import fsdp_param_sharding, make_mesh


def test_registry_roundtrip():
    @registry.register_model("_test_model")
    class M:
        pass

    assert registry.get_model_class("_test_model") is M
    assert "_test_model" in registry.list_models()
    with pytest.raises(KeyError):
        registry.register_model("_test_model")(int)


def test_config_merge_and_dotlist(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text(
        "model:\n  arch: foo\n  max_txt_len: 256\nrun:\n  learning_rate: 2e-5\n  bf16: True\n"
    )
    cfg = Config(p, options=["run.learning_rate=1e-4", "model.video_input=all"])
    assert cfg.model_cfg.max_txt_len == 256
    assert cfg.run_cfg.learning_rate == 1e-4
    assert cfg.model_cfg.video_input == "all"
    assert cfg.run_cfg.bf16 is True
    # attribute + get access
    assert cfg.run_cfg.get("missing", 7) == 7
    json.loads(cfg.pretty_print())


def test_deep_merge_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    deep_merge(base, {"a": {"b": 10}, "e": 4})
    assert base == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_dotlist_alternating_form():
    cfg = {}
    apply_dotlist(cfg, ["a.b", "5", "c=hello"])
    assert cfg == {"a": {"b": 5}, "c": "hello"}


def test_runner_config_validator():
    """ConfigValidator (reference config.py:174-471, never invoked there
    either): unknown keys, bad types and out-of-choices values all raise;
    valid run sections pass through."""
    import pytest

    from stllm_tpu.common.config import create_runner_config_validator

    v = create_runner_config_validator()
    ok = {"max_epoch": 3, "init_lr": 1e-4, "seed": 42,
          "output_dir": "out", "device": "tpu", "num_beams": 5}
    assert v.validate(ok) is ok
    with pytest.raises(ValueError, match="not a valid argument"):
        v.validate({"no_such_flag": 1})
    with pytest.raises(ValueError, match="must be one of"):
        v.validate({"device": "mps"})
    with pytest.raises(ValueError, match="not a valid"):
        v.validate({"max_epoch": "three point five.."})
    assert "Runner configurations" in v.format_help()
    assert "inference_method" in v.format_help()


def test_smoothed_value_and_metric_logger():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.global_avg == 2.5
    assert v.median == 3.0
    ml = MetricLogger()
    ml.update(loss=1.0, lr=0.1)
    assert "loss" in str(ml)
    out = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert out == list(range(5))


def test_lr_schedules():
    sched = cosine_lr_schedule(1e-4, 1e-5, warmup_steps=10, total_steps=100, warmup_start_lr=1e-6)
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(10)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)
    # monotone decay after warmup
    vals = [float(sched(s)) for s in range(10, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))

    s2 = step_lr_schedule(1e-4, 1e-6, decay_rate=0.5, steps_per_epoch=10, warmup_steps=5)
    assert float(s2(20)) == pytest.approx(1e-4 * 0.25)

    s3 = linear_warmup_cosine_hf(2e-5, warmup_ratio=0.1, total_steps=100)
    assert float(s3(10)) == pytest.approx(2e-5, rel=1e-2)
    assert float(s3(100)) < 1e-7


def test_weight_decay_mask_and_optimizer():
    params = {
        "proj": {"kernel": jnp.ones((8, 8)), "bias": jnp.ones((8,))},
        "ln_f": {"scale": jnp.ones((8, 8))},
        "embed_tokens": {"weight": jnp.ones((16, 8))},
    }
    mask = weight_decay_mask(params)
    assert mask["proj"]["kernel"] is True
    assert mask["proj"]["bias"] is False
    assert mask["ln_f"]["scale"] is False
    assert mask["embed_tokens"]["weight"] is False

    frozen = jax.tree_util.tree_map(lambda _: True, params)
    frozen["embed_tokens"]["weight"] = False
    tx = make_optimizer(1e-3, weight_decay=0.01, max_grad_norm=1.0, trainable_mask=frozen)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["embed_tokens"]["weight"]).max()) == 0.0
    assert float(jnp.abs(updates["proj"]["kernel"]).max()) > 0.0


def test_mesh_and_fsdp_sharding():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params = {"big": jnp.zeros((512, 1024)), "small": jnp.zeros((4,))}
    shardings = fsdp_param_sharding(make_mesh(), params, min_size=1024)
    # big param sharded over data on its largest divisible axis
    assert "data" in str(shardings["big"].spec)
    assert shardings["small"].spec == jax.sharding.PartitionSpec()
    sharded = jax.device_put(params["big"], shardings["big"])
    np.testing.assert_array_equal(np.asarray(sharded), np.zeros((512, 1024)))
