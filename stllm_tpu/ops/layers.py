"""Core NN primitives with the framework's dtype policy.

Matmuls run in the io dtype (bf16 on TPU); normalization statistics always
compute in fp32, mirroring the reference's fp32-LayerNorm islands inside an
fp16 model (reference: stllm/models/blip2.py:103-109).

Parameter layout conventions (used by every model in stllm_tpu/models and by
the torch converters in stllm_tpu/convert):
  linear:     {"w": (in, out), "b": (out,)}        # note: transposed vs torch
  layer_norm: {"scale": (dim,), "bias": (dim,)}
  rms_norm:   {"scale": (dim,)}
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def linear(params, x: jax.Array) -> jax.Array:
    if "w_q" in params or "w_q16" in params:  # int8 forms (see ops/quant.py)
        from stllm_tpu.ops.quant import quant_linear

        return quant_linear(params, x)
    if "w4" in params:  # int4-packed weights (W4A16, see ops/quant.py)
        from stllm_tpu.ops.quant import w4_linear

        return w4_linear(params, x)
    y = jnp.dot(x, params["w"].astype(x.dtype))
    b = params.get("b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layer_norm(params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm with fp32 statistics, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm (LLaMA style): fp32 statistics, scale applied in x.dtype
    after the cast, matching HF LlamaRMSNorm order."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * params["scale"].astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch.nn.GELU default, used by EVA-ViT and BERT."""
    return jax.nn.gelu(x, approximate=False)


def mlp(params, x: jax.Array, act=gelu) -> jax.Array:
    """Two-layer MLP: fc1 -> act -> fc2."""
    return linear(params["fc2"], act(linear(params["fc1"], x)))


def swiglu_mlp(params, x: jax.Array) -> jax.Array:
    """LLaMA MLP: down( silu(gate(x)) * up(x) ). A ``gateup`` key holds the
    two projections fused along N (decode-bandwidth form: one weight-stream
    kernel call instead of two, see llama.quantize_llama_params_int4)."""
    if "gateup" in params:
        g, u = jnp.split(linear(params["gateup"], x), 2, axis=-1)
        return linear(params["down"], jax.nn.silu(g) * u)
    return linear(
        params["down"],
        jax.nn.silu(linear(params["gate"], x)) * linear(params["up"], x),
    )


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def init_linear(rng, d_in: int, d_out: int, dtype=jnp.float32, bias: bool = True,
                std: Optional[float] = 0.02):
    w = (jax.random.truncated_normal(rng, -2.0, 2.0, (d_in, d_out)) * std).astype(dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}
