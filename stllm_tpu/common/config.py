"""YAML config system: deep-merged experiment configs with dotlist overrides.

Re-provides the reference's OmegaConf 3-way merge semantics
(reference: stllm/common/config.py:17-129) without the OmegaConf dependency:
experiment YAML (`model:` / `datasets:` / `run:`) is merged over per-model-type
default YAML (resolved via the model class' PRETRAINED_MODEL_CONFIG_DICT) and
per-dataset default YAML, then CLI `--options a.b=c` dotlist overrides apply last.
"""

from __future__ import annotations

import copy
import json
from pathlib import Path
from typing import Any, Dict, Iterable, List, Mapping, Optional

import yaml


class ConfigDict(dict):
    """dict with attribute access and recursive wrapping (OmegaConf-lite)."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getitem__(self, key):
        value = dict.__getitem__(self, key)
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
            dict.__setitem__(self, key, value)
        return value

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default

    def copy(self) -> "ConfigDict":
        return wrap(copy.deepcopy(unwrap(self)))


def wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return ConfigDict({k: wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [wrap(v) for v in obj]
    return obj


def unwrap(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {k: unwrap(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [unwrap(v) for v in obj]
    return obj


def deep_merge(base: Dict, override: Mapping) -> Dict:
    """Recursively merge ``override`` into ``base`` (override wins). Returns base."""
    for key, value in override.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, Mapping):
            deep_merge(base[key], value)
        else:
            base[key] = copy.deepcopy(unwrap(value)) if isinstance(value, Mapping) else copy.deepcopy(value)
    return base


def _parse_scalar(text: str) -> Any:
    """Parse a CLI override value: YAML scalar rules + lenient float forms
    (YAML 1.1 leaves '1e-4' a string; configs use that form freely)."""
    try:
        value = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def apply_dotlist(cfg: Dict, overrides: Iterable[str]) -> Dict:
    """Apply ``a.b.c=value`` overrides in place.

    Accepts both ``k=v`` strings and alternating ``[k, v, k, v]`` lists, matching the
    reference CLI's two accepted forms (reference: stllm/common/config.py:117-129).
    """
    items: List[str] = []
    buf = list(overrides or [])
    i = 0
    while i < len(buf):
        tok = buf[i]
        if "=" in tok:
            items.append(tok)
            i += 1
        else:
            if i + 1 >= len(buf):
                raise ValueError(f"dangling override key {tok!r}")
            items.append(f"{tok}={buf[i + 1]}")
            i += 2
    for item in items:
        key, _, raw = item.partition("=")
        node = cfg
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_scalar(raw)
    return cfg


def load_yaml(path: str | Path) -> Dict:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


class Config:
    """Experiment config: model + datasets + run sections, fully merged.

    The merge order (lowest priority first) mirrors the reference:
      1. per-model-type default YAML (``PRETRAINED_MODEL_CONFIG_DICT[model_type]``)
      2. per-dataset default YAML (builder defaults), when a builder is registered
      3. the experiment YAML passed on the CLI
      4. ``--options`` dotlist overrides
    """

    def __init__(self, cfg_path: str | Path | None = None,
                 options: Optional[Iterable[str]] = None,
                 cfg_dict: Optional[Mapping] = None):
        user: Dict = {}
        if cfg_path is not None:
            user = load_yaml(cfg_path)
        if cfg_dict is not None:
            deep_merge(user, cfg_dict)
        if options:
            apply_dotlist(user, options)

        merged: Dict = {}
        deep_merge(merged, {"model": self._model_defaults(user.get("model", {}))})
        deep_merge(merged, user)
        self._cfg = wrap(merged)

    @staticmethod
    def _model_defaults(model_cfg: Mapping) -> Dict:
        arch = model_cfg.get("arch")
        model_type = model_cfg.get("model_type")
        if not arch or not model_type:
            return {}
        from stllm_tpu.common.registry import registry

        try:
            model_cls = registry.get_model_class(arch)
        except KeyError:
            return {}
        table = getattr(model_cls, "PRETRAINED_MODEL_CONFIG_DICT", {})
        default_path = table.get(model_type)
        if not default_path:
            return {}
        root = Path(__file__).resolve().parent.parent
        defaults = load_yaml(root / default_path)
        return defaults.get("model", defaults)

    # ---- section properties (same surface as the reference Config) ----
    @property
    def model_cfg(self) -> ConfigDict:
        return self._cfg.get("model", ConfigDict())

    @property
    def datasets_cfg(self) -> ConfigDict:
        return self._cfg.get("datasets", ConfigDict())

    @property
    def run_cfg(self) -> ConfigDict:
        return self._cfg.get("run", ConfigDict())

    @property
    def config(self) -> ConfigDict:
        return self._cfg

    def get(self, key, default=None):
        return self._cfg.get(key, default)

    def pretty_print(self) -> str:
        return json.dumps(unwrap(self._cfg), indent=2, default=str)

    def to_dict(self) -> Dict:
        return unwrap(self._cfg)


# ---------------------------------------------------------------------------
# Runner-flag validator (reference: stllm/common/config.py:174-471 —
# ConfigValidator + create_runner_config_validator; never invoked by the
# reference's own Config either, kept as the central flag schema/help text).
# Re-designed as a compact declarative table instead of 200 lines of
# add_argument calls; semantics preserved: unknown key -> error, type
# coercion failure -> ValueError, out-of-choices -> error.
# ---------------------------------------------------------------------------

class ConfigValidator:
    """Validates a ``run:`` section against a declared flag schema."""

    def __init__(self, description: str, schema: Mapping[str, tuple]):
        # schema: name -> (type | None, choices | None, help)
        self.description = description
        self.schema = dict(schema)

    def validate(self, config: Mapping) -> Mapping:
        for k, v in config.items():
            if k not in self.schema:
                raise ValueError(
                    f"{k} is not a valid argument. Supported arguments are "
                    f"{sorted(self.schema)}")
            typ, choices, _ = self.schema[k]
            if typ is not None and not isinstance(v, typ):
                try:
                    typ(v)
                except (TypeError, ValueError):
                    raise ValueError(f"{k} is not a valid {typ}.")
            if choices is not None and v not in choices:
                raise ValueError(f"{k} must be one of {choices}.")
        return config

    def format_help(self) -> str:
        lines = [self.description]
        for k in sorted(self.schema):
            typ, choices, help_ = self.schema[k]
            s = f"  {k}"
            if typ is not None:
                s += f" ({getattr(typ, '__name__', typ)})"
            if choices is not None:
                s += f" choices={list(choices)}"
            if help_:
                s += f" — {help_}"
            lines.append(s)
        return "\n".join(lines)

    def __str__(self) -> str:
        return self.format_help()


def create_runner_config_validator() -> ConfigValidator:
    """The reference's runner flag schema (config.py:264-471) with TPU device
    choices added. Choices for lr_sched/task come from the live registry."""
    from stllm_tpu.common.registry import registry

    t = lambda typ, choices=None, help_="": (typ, choices, help_)  # noqa: E731
    schema = {
        "runner": t(str, ["runner_base", "runner_iter"], "runner flavor"),
        "train_dataset_ratios": t(dict, None, "iter-runner dataset ratios"),
        "max_iters": t(float, None, "max iterations"),
        "max_epoch": t(int, None, "max epochs"),
        "iters_per_inner_epoch": t(float, None, "iters per inner epoch"),
        "lr_sched": t(str, registry.list_lr_schedulers(), "LR scheduler"),
        "task": t(str, registry.list_tasks(), "task name"),
        "init_lr": t(float, None, "post-warmup initial LR"),
        "min_lr": t(float, None, "LR after decay"),
        "warmup_lr": t(float, None, "warmup starting LR"),
        "lr_decay_rate": t(float, None, "decay rate"),
        "weight_decay": t(float, None, "weight decay"),
        "batch_size_train": t(int, None, "train batch size"),
        "batch_size_eval": t(int, None, "eval batch size"),
        "num_workers": t(None, None, "data-loading workers"),
        "warmup_steps": t(int, None, "warmup steps"),
        "seed": t(int, None, "random seed"),
        "output_dir": t(str, None, "checkpoint/log dir"),
        "evaluate": t(None, None, "eval-only mode"),
        "train_splits": t(list, None, "training splits"),
        "valid_splits": t(list, None, "validation splits"),
        "test_splits": t(list, None, "test splits"),
        "accum_grad_iters": t(int, None, "gradient accumulation"),
        "device": t(str, ["cpu", "cuda", "tpu"], "compute device"),
        "world_size": t(int, None, "process count"),
        "dist_url": t(str, None, ""),
        "distributed": t(bool, None, ""),
        "use_dist_eval_sampler": t(bool, None, "distributed eval sampler"),
        "max_len": t(int, None, "max text output length"),
        "min_len": t(int, None, "min text output length"),
        "num_beams": t(int, None, "beam count"),
        "num_ans_candidates": t(int, None, "answer-ranking candidates"),
        "inference_method": t(str, ["genearte", "rank"],
                              "QA inference method (typo as in reference)"),
        "k_test": t(int, None, "ITC/VTC top-k to test"),
    }
    return ConfigValidator("Runner configurations", schema)
