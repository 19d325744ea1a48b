"""Context-parallel LLaMA forward equals the dense forward on a CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from stllm_tpu.models.llama import LlamaConfig, init_llama, llama_forward
from stllm_tpu.parallel.context import context_parallel_forward

CFG = LlamaConfig(vocab_size=97, hidden=32, num_layers=2, heads=2,
                  intermediate=64, max_positions=128, dtype=jnp.float32)


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("cp",))


@pytest.fixture(scope="module")
def setup():
    params = init_llama(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(2, 64, 32)) * 0.1, jnp.float32)
    return params, embeds


def test_cp_matches_dense(setup):
    params, embeds = setup
    dense, _ = llama_forward(params, inputs_embeds=embeds, cfg=CFG)
    cp = context_parallel_forward(params, embeds, _mesh(), CFG, axis_name="cp")
    np.testing.assert_allclose(np.asarray(cp), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)


def test_cp_with_padding_mask(setup):
    params, embeds = setup
    mask = np.ones((2, 64), np.int32)
    mask[0, 50:] = 0
    mask[1, 30:] = 0
    dense, _ = llama_forward(params, inputs_embeds=embeds,
                             attention_mask=jnp.asarray(mask), cfg=CFG)
    cp = context_parallel_forward(params, embeds, _mesh(), CFG,
                                  axis_name="cp",
                                  attention_mask=jnp.asarray(mask))
    # compare only the valid positions (masked-query outputs are undefined)
    for b in range(2):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(np.asarray(cp)[b][valid],
                                   np.asarray(dense)[b][valid],
                                   rtol=2e-5, atol=2e-6)


def test_cp_gradients(setup):
    # 1 layer on a 2-way mesh: the grad-of-shard_map-ring compile is the
    # suite's top cost (77 s at 2 layers x 4-way); forward equivalence
    # above keeps the 2-layer 4-way coverage
    params, embeds = setup
    cfg1 = LlamaConfig(**{**CFG.__dict__, "num_layers": 1})
    params = {**params, "layers": params["layers"][:1]}
    embeds = embeds[:, :32]  # 16 tokens per shard — grad graph scales with S

    def loss_cp(p):
        return (context_parallel_forward(p, embeds, _mesh(2), cfg1,
                                         axis_name="cp") ** 2).sum()

    def loss_dense(p):
        h, _ = llama_forward(p, inputs_embeds=embeds, cfg=cfg1)
        return (h ** 2).sum()

    g_cp = jax.grad(loss_cp)(params)
    g_dense = jax.grad(loss_dense)(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        g_cp, g_dense)
