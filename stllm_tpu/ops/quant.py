"""W8A8 dynamic-quantization matmul for inference.

Int8 path for the ViT's projection/MLP matmuls (the encode hot spot). The
reference ships no quantization at all (its ViT runs fp16,
stllm/models/eva_vit.py:440-442); this is a TPU-native extension.

Two implementations, both measured on v5e at the ViT-g fc1 shape
(64x257x1408 @ 1408x6144), bf16 dense dot = 1.55 ms baseline:

1. ``quant_matmul`` (DEFAULT) — plain XLA composition: per-row dynamic int8
   activation quant (one cheap fused pass), then ``dot_general`` on int8
   operands upcast to bf16 with fp32 accumulation, scales applied in the
   fused epilogue. XLA folds the int8->bf16 convert into the MXU feed and
   runs the dot at ~2x the bf16 rate: **0.94 ms (1.65x)**. int8 storage
   also halves weight HBM traffic.
2. ``quant_matmul_pallas`` — fully fused Pallas kernel (quantize in VMEM,
   int8 x int8 -> int32 MXU dot, fp32 scale-accumulate). Measures **1.31 ms
   (1.18x)**: Mosaic's int8->int32 dot runs at ~half the rate of XLA's
   convert-folded path, and an in-kernel ``astype(bf16)`` does NOT fold
   (2.08 ms — real VPU converts of the weight tile per grid step). Kept as
   the reference for a future Mosaic int8 fast path.

Numerics: weights per-output-channel symmetric int8; activations per-row
(XLA path) or per-(row, k-block) (Pallas path) symmetric int8, quantized
dynamically — no calibration. Products of int8 values are exact in
bf16 x bf16 -> fp32 MXU arithmetic (both operands are small integers).

Forward-only: the bf16 path remains the training path (quantized training
is out of scope, matching the reference's inference-precision split).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weights(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. w: (K, N) -> (w_q int8, scale (N,) fp32)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activations(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (last-axis) symmetric int8: (..., K) -> (int8, (..., 1) fp32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x_q = jnp.round(xf / scale).astype(jnp.int8)
    return x_q, scale


# int8 matmul form. Round 1 measured the bf16-upcast composition and the
# native s8xs8->s32 dot EQUAL; re-measured in round 3 (jax 0.9 toolchain)
# the native dot is consistently faster at ViT shapes when the epilogue is
# cheap (222.6 vs 196.8 TOP/s on the fc1 requant chain, /tmp benchmarks
# recorded in DESIGN.md) and never slower. Both are numerically exact for
# int8 operands, so this is a pure dispatch choice.
INT8_NATIVE_DOT = True


def _int8_dot(x_q: jax.Array, w_q: jax.Array) -> jax.Array:
    """s8 x s8 matmul over the last/first axes, fp32 result."""
    dims = (((x_q.ndim - 1,), (0,)), ((), ()))
    if INT8_NATIVE_DOT:
        return jax.lax.dot_general(
            x_q, w_q, dims, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    return jax.lax.dot_general(
        x_q.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32)


def quant_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array) -> jax.Array:
    """Dynamic W8A8 matmul, XLA path (see module docstring). x: (..., K),
    w_q: (K, N) int8, w_scale: (N,). Returns (..., N) in x.dtype."""
    x_q, x_scale = quantize_activations(x)
    y = _int8_dot(x_q, w_q)
    return (y * x_scale * w_scale.astype(jnp.float32)).astype(x.dtype)


def quantize_linear_params(params: Dict, free_dense: bool = False) -> Dict:
    """Convert a dense linear param dict {'w': (K,N), 'b': (N,)?} into the
    quantized form used by ``quant_linear``. ``free_dense=True`` deletes the
    dense weight's device buffer once quantized (in-place conversion of
    trees too large for dense+quantized to coexist on one chip)."""
    w_q, scale = quantize_weights(params["w"])
    w_q = jax.block_until_ready(w_q)
    out = {"w_q": w_q, "w_scale": scale}
    if "b" in params and params["b"] is not None:
        out["b"] = params["b"]
    if free_dense and isinstance(params["w"], jax.Array):
        params["w"].delete()
    return out


def w8a16_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array
                 ) -> jax.Array:
    """Weight-only int8 matmul: int8 weights upcast into the dot, bf16
    activations UNquantized — fully differentiable w.r.t. ``x`` (the W8A8
    path's activation round() has zero gradient), so this is the QLoRA-style
    frozen-base form for training through a quantized LLM."""
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * w_scale.astype(jnp.float32)).astype(x.dtype)


def quant_linear(params_q: Dict, x: jax.Array) -> jax.Array:
    """Drop-in for ops.layers.linear on quantized params. x: (..., K).
    A ``w_q16`` key (instead of ``w_q``) selects the weight-only
    differentiable form — the mode is encoded in the pytree STRUCTURE, not a
    leaf, so it stays static under jit."""
    if "w_q16" in params_q:
        out = w8a16_matmul(x, params_q["w_q16"], params_q["w_scale"])
    else:
        out = quant_matmul(x, params_q["w_q"], params_q["w_scale"])
    if "b" in params_q:
        out = out + params_q["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Fully fused Pallas kernel (slower than the XLA path on current Mosaic —
# see module docstring; kept as the int8-MXU reference implementation)
# ---------------------------------------------------------------------------

def _quant_block(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 of an fp32 tile. x: (S, bk) -> (int8, (S,1) scale)."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x_q = jnp.round(x / scale).astype(jnp.int8)
    return x_q, scale


def _quant_matmul_kernel(x_ref, wq_ref, ws_ref, o_ref, acc_ref, *, n_k: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)               # (S, bk)
    x_q, x_scale = _quant_block(x)
    acc = jax.lax.dot_general(
        x_q, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                              # (S, bn) int32
    acc_ref[:] += acc.astype(jnp.float32) * x_scale

    @pl.when(k_idx == n_k - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] * ws_ref[0]).astype(o_ref.dtype)


def _pick_tile(dim: int, preferred: int) -> int:
    """Largest 128-multiple divisor of ``dim`` that is <= preferred, or the
    whole dim. Returns 0 if neither exists (caller falls back)."""
    if dim <= preferred:
        return dim
    for cand in range(preferred, 127, -128):
        if cand % 128 == 0 and dim % cand == 0:
            return cand
    return 0


def quant_matmul_pallas(
    x: jax.Array,          # (B, S, K) activations (bf16/fp32)
    w_q: jax.Array,        # (K, N) int8
    w_scale: jax.Array,    # (N,) fp32
    *,
    interpret: bool = False,
) -> Optional[jax.Array]:
    """Fused dynamic-quant matmul kernel: returns (B, S, N) in x.dtype, or
    None if the shapes don't admit 128-aligned tiles. Quantization is
    per-(row, k-block) — finer than the XLA path's per-row."""
    b, s, k = x.shape
    n = w_q.shape[1]
    bk = _pick_tile(k, 2048)
    bn = _pick_tile(n, 1536)
    if bk == 0 or bn == 0:
        return None
    if jax.default_backend() == "cpu":
        interpret = True  # no Mosaic on CPU; tests run the interpreter
    n_k = k // bk
    kernel = functools.partial(_quant_matmul_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        grid=(b, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((1, s, bk), lambda i, j, kk: (i, 0, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, s, bn), lambda i, j, kk: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, s, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((s, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, n).astype(jnp.float32))


def quant_matmul_pallas_reference(x: jax.Array, w_q: jax.Array,
                                  w_scale: jax.Array,
                                  bk: Optional[int] = None) -> jax.Array:
    """XLA emulation of the Pallas kernel's exact math (same blockwise
    activation quantization, same accumulation order) — test ground truth."""
    b, s, k = x.shape
    bk = bk or _pick_tile(k, 2048) or k
    xf = x.astype(jnp.float32)
    acc = jnp.zeros((b, s, w_q.shape[1]), jnp.float32)
    for kk in range(k // bk):
        blk = xf[:, :, kk * bk:(kk + 1) * bk]
        x_q, scale = _quant_block(blk)
        part = jax.lax.dot_general(
            x_q, w_q[kk * bk:(kk + 1) * bk],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * scale
    return (acc * w_scale.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Producer-fused activation quantization (Pallas)
#
# In the XLA-composed path the dynamic activation quant costs two extra HBM
# passes per matmul (read for amax, read for quantize) over an activation the
# producer just wrote in bf16 — measured ~19 ms of the 64-frame int8 ViT
# encode. Every quantized ViT matmul input has exactly ONE consumer, so the
# producer (LayerNorm or GELU) can emit int8 + per-row scales directly: one
# read of the producer input, one int8 write, no bf16 intermediate.
# ---------------------------------------------------------------------------

def _rowwise_quant_emit(y, xq_ref, s_ref):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    xq_ref[0] = jnp.round(y / s).astype(jnp.int8)
    s_ref[0] = s


def _ln_quant_kernel(x_ref, g_ref, b_ref, xq_ref, s_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)                     # (S, K)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    _rowwise_quant_emit(y, xq_ref, s_ref)


def _gelu_quant_kernel(x_ref, xq_ref, s_ref, *, approx: bool):
    x = x_ref[0].astype(jnp.float32)
    y = jax.nn.gelu(x, approximate=approx)
    _rowwise_quant_emit(y, xq_ref, s_ref)


def _rowwise_pallas(kernel, x3, extra, interpret):
    # natural-batch tiling: block (1, S, K) over (B, S, K) — S spans its full
    # dim so no divisor constraints; fp32 working tile budget ~8 MB
    from stllm_tpu.ops.spmd import kernel_shard_count, shard_batched

    b, s, k = x3.shape
    if s * k * 4 > 8 * 1024 * 1024 or b % kernel_shard_count():
        return None
    if jax.default_backend() == "cpu":
        interpret = True
    n_extra = len(extra)

    def raw(x3, *extra):
        bb = x3.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bb,),
            in_specs=[pl.BlockSpec((1, s, k), lambda i: (i, 0, 0))]
            + [pl.BlockSpec((1, k), lambda i: (0, 0))] * n_extra,
            out_specs=[
                pl.BlockSpec((1, s, k), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, s, 1), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bb, s, k), jnp.int8),
                jax.ShapeDtypeStruct((bb, s, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(x3, *extra)

    return shard_batched(raw, x3, *extra)


def layer_norm_quant(params: Dict, x: jax.Array, eps: float = 1e-6,
                     *, interpret: bool = False):
    """Fused LayerNorm -> per-row int8. x: (B, S, K). Returns
    (x_q int8 (B, S, K), scale fp32 (B, S, 1)). Matches
    ops.layers.layer_norm followed by quantize_activations."""
    out = _rowwise_pallas(
        functools.partial(_ln_quant_kernel, eps=eps), x,
        [params["scale"].reshape(1, -1), params["bias"].reshape(1, -1)],
        interpret,
    )
    if out is None:  # working tile too large: unfused fallback
        from stllm_tpu.ops.layers import layer_norm

        return quantize_activations(layer_norm(params, x, eps))
    return out


def gelu_quant(x: jax.Array, *, approx: bool = False,
               interpret: bool = False):
    """Fused GELU -> per-row int8 (same contract as layer_norm_quant).

    Exact (erf) GELU has no Mosaic lowering on this TPU backend (erfc is an
    unimplemented Pallas primitive — caught by script/verify_tpu.py, invisible
    to the CPU interpret-mode suite), so approx=False always takes the XLA
    fallback; the fused kernel serves the tanh-approx serving config."""
    out = None
    if approx or interpret or jax.default_backend() == "cpu":
        out = _rowwise_pallas(
            functools.partial(_gelu_quant_kernel, approx=approx), x, [],
            interpret,
        )
    if out is None:
        return quantize_activations(jax.nn.gelu(x, approximate=approx))
    return out


def quant_matmul_pre(x_q: jax.Array, x_scale: jax.Array, params_q: Dict,
                     out_dtype) -> jax.Array:
    """int8 matmul on PRE-quantized activations (from layer_norm_quant /
    gelu_quant): same XLA dot + fused epilogue as quant_matmul."""
    y = _int8_dot(x_q, params_q["w_q"])
    y = y * x_scale * params_q["w_scale"].astype(jnp.float32)
    if "b" in params_q:
        y = y + params_q["b"].astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Static (calibrated) activation scales
#
# Dynamic per-row quantization needs a data-dependent amax reduction before
# the scale divide, which forces the activation through HBM once per matmul
# even with the producer-fused Pallas kernels above (measured ~39 ms of the
# 64-frame int8 ViT encode: 20 ms LN-quant + 19 ms gelu-quant). A static
# per-tensor scale makes quantization purely ELEMENTWISE, so XLA fuses it
# into whatever produced the activation: LayerNorm emits int8 from its own
# fusion, and GELU+quantize folds into the preceding matmul's epilogue — the
# fp32/bf16 intermediate never touches HBM. Scales come from a calibration
# pass (models/vit.py:calibrate_vit_scales); out-of-range activations are
# saturated (clip to ±127), the standard static-W8A8 serving contract.
# ---------------------------------------------------------------------------

def quantize_static(x: jax.Array, scale) -> jax.Array:
    """Elementwise static-scale symmetric int8: round(x/scale), saturating.
    ``scale`` is a scalar (per-tensor); fuses into the producer of ``x``."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127
                    ).astype(jnp.int8)


def layer_norm_quant_static(params: Dict, x: jax.Array, scale, eps: float = 1e-6
                            ) -> jax.Array:
    """LayerNorm -> static int8 in one XLA fusion, fp32 throughout (no bf16
    intermediate; same stats policy as ops.layers.layer_norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return quantize_static(y, scale)


def quant_mlp_static(hq: jax.Array, in_scale, fc1_q: Dict, gelu_scale,
                     fc2_q: Dict, out_dtype, *, approx: bool = False
                     ) -> jax.Array:
    """fc1 -> GELU -> quantize -> fc2 with static scales: the whole
    scale+bias+GELU+quantize chain is elementwise on the fc1 accumulator, so
    XLA fuses it into the dot epilogue and only int8 reaches HBM between the
    two matmuls."""
    gq = quant_fc1_gelu_static(hq, in_scale, fc1_q, gelu_scale, approx=approx)
    return quant_matmul_pre(gq, gelu_scale, fc2_q, out_dtype)


def quant_fc1_gelu_static(hq: jax.Array, in_scale, fc1_q: Dict, gelu_scale,
                          *, approx: bool = False) -> jax.Array:
    """First half of quant_mlp_static: fc1 -> GELU -> static int8 (all
    elementwise work folds into the dot epilogue). Split out so the fc2 can
    run through the epilogue-carried-LN kernel below."""
    y = _int8_dot(hq, fc1_q["w_q"])
    y = y * (in_scale * fc1_q["w_scale"].astype(jnp.float32))
    if "b" in fc1_q:
        y = y + fc1_q["b"].astype(jnp.float32)
    g = jax.nn.gelu(y, approximate=approx)
    return quantize_static(g, gelu_scale)


# ---------------------------------------------------------------------------
# Epilogue-carried LayerNorm (round 3)
#
# In the static-scale block, the two LayerNorms are the only remaining
# standalone HBM passes (~6 ms of the 142 ms 64-frame encode, in-situ
# ablation in DESIGN.md): XLA computes LN stats as a separate reduction
# read over the residual stream it just wrote. But every LN here directly
# follows a residual add whose delta comes from an int8 matmul (proj ->
# norm2, fc2 -> next block's norm1) — and at the matmul kernel's k-exit the
# COMPLETE output row sits in VMEM. So the whole chain
#   s8 dot -> dequant scales -> +bias -> +residual -> LN -> static int8
# is one kernel with two outputs (the new residual stream in bf16, the
# normalized int8 for the next matmul); the LN stats never re-read HBM.
# ---------------------------------------------------------------------------

def _qmm_res_ln_kernel(hq_ref, hs_ref, wq_ref, ws_ref, b_ref, x_ref, g_ref,
                       lb_ref, os_ref, xo_ref, yq_ref, acc_ref, *,
                       n_k: int, eps: float):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        hq_ref[0], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(ki == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * hs_ref[0] * ws_ref[0]
        y = y + b_ref[0]
        xn = x_ref[0].astype(jnp.float32) + y
        xo_ref[0] = xn.astype(xo_ref.dtype)
        mean = jnp.mean(xn, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xn - mean), axis=-1, keepdims=True)
        z = (xn - mean) * jax.lax.rsqrt(var + eps)
        z = z * g_ref[0] + lb_ref[0]
        yq_ref[0] = jnp.clip(jnp.round(z * os_ref[0, 0]), -127, 127
                             ).astype(jnp.int8)


def quant_matmul_res_ln_static(hq: jax.Array, hs, params_q: Dict,
                               x_prev: jax.Array, ln_params: Dict, out_scale,
                               eps: float = 1e-6, *, interpret: bool = False
                               ) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Fused s8-matmul + residual + LayerNorm + static-int8 epilogue.

    hq: (B, S, K) int8 pre-quantized activations; hs: their scale — per-row
    (B, S, 1) fp32 or a scalar (static). params_q: int8 linear params
    ({'w_q', 'w_scale', 'b'?}). x_prev: (B, S, N) residual stream.
    Returns (x_new bf16 (B,S,N), yq int8 (B,S,N)) where
    x_new = x_prev + linear(hq*hs) and yq = static-quantized
    LayerNorm(x_new), or None when shapes don't tile (caller unfuses).
    """
    from stllm_tpu.ops.spmd import kernel_shard_count

    b, s, k = hq.shape
    n = params_q["w_q"].shape[1]
    bk = _pick_tile(k, 2048)
    if (bk == 0 or n % 128 != 0 or s * n * 4 > 4 * 1024 * 1024
            or kernel_shard_count() != 1):
        return None
    if jax.default_backend() == "cpu":
        interpret = True
    n_k = k // bk
    if jnp.ndim(hs) == 0 or (getattr(hs, "size", 1) == 1):
        hs3 = jnp.full((b, s, 1), hs, jnp.float32)
    else:
        hs3 = hs.astype(jnp.float32)
    bias = params_q.get("b")
    bias = (jnp.zeros((n,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
    inv_os = (1.0 / jnp.asarray(out_scale, jnp.float32)).reshape(1, 1)
    kern = functools.partial(_qmm_res_ln_kernel, n_k=n_k, eps=eps)
    row = pl.BlockSpec((1, n), lambda i, ki: (0, 0))
    x_new, yq = pl.pallas_call(
        kern,
        grid=(b, n_k),
        in_specs=[
            pl.BlockSpec((1, s, bk), lambda i, ki: (i, 0, ki)),
            pl.BlockSpec((1, s, 1), lambda i, ki: (i, 0, 0)),
            pl.BlockSpec((bk, n), lambda i, ki: (ki, 0)),
            row, row,
            pl.BlockSpec((1, s, n), lambda i, ki: (i, 0, 0)),
            row, row,
            pl.BlockSpec((1, 1), lambda i, ki: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, s, n), lambda i, ki: (i, 0, 0)),
            pl.BlockSpec((1, s, n), lambda i, ki: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, n), x_prev.dtype),
            jax.ShapeDtypeStruct((b, s, n), jnp.int8),
        ],
        scratch_shapes=[pltpu.VMEM((s, n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(hq, hs3, params_q["w_q"],
      params_q["w_scale"].reshape(1, n).astype(jnp.float32), bias.reshape(1, n),
      x_prev, ln_params["scale"].reshape(1, n).astype(jnp.float32),
      ln_params["bias"].reshape(1, n).astype(jnp.float32), inv_os)
    return x_new, yq


def quant_matmul_res_ln_static_reference(hq, hs, params_q, x_prev, ln_params,
                                         out_scale, eps: float = 1e-6):
    """XLA ground truth with the kernel's exact math (fp32 residual add,
    stats over the fp32 sum)."""
    y = _int8_dot(hq, params_q["w_q"])
    hs3 = jnp.asarray(hs, jnp.float32)
    if hs3.ndim == 0:
        hs3 = hs3.reshape(1, 1, 1)
    y = y * hs3 * params_q["w_scale"].astype(jnp.float32)
    if "b" in params_q:
        y = y + params_q["b"].astype(jnp.float32)
    xn = x_prev.astype(jnp.float32) + y
    mean = jnp.mean(xn, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xn - mean), axis=-1, keepdims=True)
    z = (xn - mean) * jax.lax.rsqrt(var + eps)
    z = (z * ln_params["scale"].astype(jnp.float32)
         + ln_params["bias"].astype(jnp.float32))
    yq = jnp.clip(jnp.round(z / jnp.asarray(out_scale, jnp.float32)),
                  -127, 127).astype(jnp.int8)
    return xn.astype(x_prev.dtype), yq


# ---------------------------------------------------------------------------
# W4A16: int4 WEIGHT storage with bf16 compute (decode bandwidth lever)
#
# 7B greedy decode is weight-bandwidth-bound (DESIGN.md: 13.8 ms/token int8
# ~ 62% of the 8.5 ms int8 weight-read floor). int4 dot_general is
# unimplemented on this TPU backend, but decode doesn't need int4 MATH —
# it needs int4 BYTES: halving weight reads halves the floor to ~4.3 ms.
# Layout: codes for the TOP half of the K axis live in the low nibble and
# the BOTTOM half in the high nibble of one (K/2, N) int8 array, so
# unpacking is two shifts and NO interleave; the matmul splits into
# x[:, :K/2] @ low + x[:, K/2:] @ high (contraction order is preserved
# within each half, fp32 accumulation keeps the sum exact).
#
# Two scale granularities:
#   per-channel (N,): scales fold into the output epilogue, the int4->bf16
#     convert feeds the dot directly (same convert-folding as int8);
#   per-group (K//group, N): tighter quantization; scales multiply the
#     dequantized weight (cannot fold into the epilogue).
# ---------------------------------------------------------------------------

def _w4_padded_k2(k2: int, n: int) -> int:
    """Half-K the Pallas kernel wants: k2 itself when it tiles, else the
    next 512-multiple (7B down matmul: 5504 -> 5632) — but only when that
    pad actually ENABLES a tiling (when the kernel declines for other
    reasons, e.g. an un-tileable N, padding would just inflate storage —
    up to 16x on small shapes — for a path that falls back to XLA anyway)."""
    if _w4_tiles(k2, n):
        return k2
    k2p = -(-k2 // 512) * 512
    return k2p if _w4_tiles(k2p, n) else k2


def quantize_weights_int4(w: jax.Array, group: Optional[int] = None
                          ) -> Tuple[jax.Array, jax.Array]:
    """w (K, N) -> (packed int8 (K/2, N), scales fp32 (N,) or (K//group, N)).
    Symmetric int4 codes in [-7, 7] (symmetric range; -8 unused)."""
    k, n = w.shape
    assert k % 2 == 0, k
    wf = w.astype(jnp.float32)
    if group is None:
        amax = jnp.max(jnp.abs(wf), axis=0)
        scale = jnp.where(amax == 0.0, 1.0, amax / 7.0)
        q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    else:
        assert k % group == 0 and (k // 2) % group == 0, (k, group)
        gview = wf.reshape(k // group, group, n)
        amax = jnp.max(jnp.abs(gview), axis=1)
        scale = jnp.where(amax == 0.0, 1.0, amax / 7.0)
        q = jnp.clip(jnp.round(gview / scale[:, None]), -7, 7
                     ).astype(jnp.int8).reshape(k, n)
    top, bottom = q[: k // 2], q[k // 2:]
    packed = (top & jnp.int8(0x0F)) | jax.lax.shift_left(bottom, jnp.int8(4))
    return packed, scale


def _unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(K/2, N) int8 -> (top codes, bottom codes), each (K/2, N) int8."""
    four = jnp.int8(4)
    top = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, four), four)
    bottom = jax.lax.shift_right_arithmetic(packed, four)
    return top, bottom


def w4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array) -> jax.Array:
    """x (..., K) @ int4-packed (K/2, N) -> (..., N) in x.dtype. Accepts
    packed arrays K-pre-padded for the Pallas kernel (trailing zero rows):
    the true half-K comes from x."""
    k2, n = packed.shape
    top, bottom = _unpack_int4(packed)
    k2t = x.shape[-1] // 2
    if k2t != k2:  # pre-padded storage: padded rows are zero codes
        top, bottom = top[:k2t], bottom[:k2t]
        k2 = k2t
        if scale.ndim == 2:
            raise ValueError("per-group scales cannot be K-padded")
    xt, xb = x[..., :k2], x[..., k2:]
    dims = (((x.ndim - 1,), (0,)), ((), ()))
    if scale.ndim == 1:  # per-channel: codes feed the dot, scale in epilogue
        y = (jax.lax.dot_general(xt.astype(jnp.bfloat16),
                                 top.astype(jnp.bfloat16), dims,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(xb.astype(jnp.bfloat16),
                                   bottom.astype(jnp.bfloat16), dims,
                                   preferred_element_type=jnp.float32))
        return (y * scale).astype(x.dtype)
    # per-group: scales vary along K — dequantize the halves (XLA fuses the
    # shift/convert/mul chain into the dot feed where it can)
    g = 2 * k2 // scale.shape[0]
    gt = scale[: k2 // g].astype(jnp.bfloat16)
    gb = scale[k2 // g:].astype(jnp.bfloat16)
    wt = (top.reshape(k2 // g, g, n).astype(jnp.bfloat16) * gt[:, None]
          ).reshape(k2, n)
    wb = (bottom.reshape(k2 // g, g, n).astype(jnp.bfloat16) * gb[:, None]
          ).reshape(k2, n)
    y = (jax.lax.dot_general(xt.astype(jnp.bfloat16), wt, dims,
                             preferred_element_type=jnp.float32)
         + jax.lax.dot_general(xb.astype(jnp.bfloat16), wb, dims,
                               preferred_element_type=jnp.float32))
    return y.astype(x.dtype)


def _w4_pallas_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, k2: int,
                      bk: int, n_k: int, k_axis: int = 1):
    """One (n-tile, k-tile[, m-tile]) step: unpack a packed block in VMEM
    via int32 shifts (int8 shl/sra have NO Mosaic lowering on this
    backend — verified by bisection; int8->bf16 astype does), dot both
    halves, accumulate."""
    ki = pl.program_id(k_axis)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = p_ref[:].astype(jnp.int32)
    top = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p32, jnp.int32(28)), jnp.int32(28))
    bottom = jax.lax.shift_right_arithmetic(p32, jnp.int32(4))
    ks = ki * bk
    xt = x_ref[:, pl.dslice(ks, bk)]
    xb = x_ref[:, pl.dslice(k2 + ks, bk)]
    acc_ref[:] += jax.lax.dot_general(
        xt, top.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xb, bottom.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def _w4_tiles(k2: int, n: int) -> Optional[Tuple[int, int]]:
    """(bk, bn) for the decode kernel, or None if no aligned tiling exists.
    VMEM budget: int32 unpack temps dominate (2 * bk * bn * 4 bytes).
    Large bk wins in PRODUCTION (capping bk at 1024 measured 12.46 vs
    11.58 ms/token end-to-end) even though a chained-reps microbenchmark
    shows (2048, bn) tiles pathologically slow (probe_w4_unpack.py) — the
    serialized-chain schedule is not representative of the decode loop;
    tile decisions must come from script/bench_decode.py."""
    bn = _pick_tile(n, 512)
    if bn == 0:
        return None
    # bk candidates must be 128-multiples: the kernel slices x at lane
    # offsets k2 + ki*bk, and Mosaic rejects loads it cannot prove
    # 128-aligned (a bk=704 candidate failed exactly that way at the
    # verify_tpu kdim=1408 shape; such k2 now take the K-pad path).
    for bk in (2048, 1408, 1024, 512, 256):
        if k2 % bk == 0 and 2 * bk * bn * 4 <= 9 * 1024 * 1024:
            return bk, bn
    return None


def w4_matmul_pallas(x: jax.Array, packed: jax.Array, scale: jax.Array
                     ) -> Optional[jax.Array]:
    """Pallas W4A16 matmul: packed weights cross HBM once (HALF the int8
    bytes), unpack happens in VMEM. Per-channel scales only. x: (..., K).
    Returns None when shapes don't tile (caller falls back to w4_matmul)."""
    k2, n = packed.shape
    if scale.ndim != 1:
        return None
    # K-pad when the TRUE half-K (x.shape[-1]//2) has no aligned tiling
    # (7B down matmul: k2=5504 -> 5632, tiles as (1408, 512)). Zero
    # codes/zero activations contribute nothing. `quantize_weights_int4`
    # pre-pads `packed` at CONVERSION time — profiling the decode loop
    # (script/profile_decode.py) showed XLA does NOT hoist a loop-invariant
    # jnp.pad of the packed weights out of the scan: it re-padded 23 MB per
    # layer per token (~0.6 ms/token at 7B). Only the tiny per-row x pad
    # remains a runtime op; a legacy runtime weight pad is kept for packed
    # arrays stored unpadded.
    k2t = x.shape[-1] // 2
    k2p = _w4_padded_k2(k2t, n)
    tiles = _w4_tiles(k2p, n)
    if tiles is None:
        return None
    bk, bn = tiles
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    # M handling, two regimes. m <= 512 (decode steps, B=1 prefill): ONE
    # x tile with a CONSTANT index map — Pallas keeps it as a resident
    # buffer, off the scoped-vmem stack, and weights stream exactly once.
    # m > 512 (batched prefill): tile m at 128 with a moving index map —
    # moving blocks are double-buffered ON the stack (~16 MB limit), which
    # is what OOMed the untiled B=8 prefill (33 MB x block) and caps bm
    # (2*bm*2k2*2 + 2*bk*bn*4 must fit; 128 fits every 7B shape). The
    # m-tiles re-stream weights, so the small-m regime deliberately keeps
    # the constant-x form (a bm=128-everywhere variant cost +0.25 ms/token
    # at B=1 end-to-end).
    bm = 128 if m > 512 else max(16, -(-m // 16) * 16)
    mp = -(-m // bm) * bm
    x2 = x.reshape(m, x.shape[-1]).astype(jnp.bfloat16)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    if k2 == k2t != k2p:  # legacy unpadded storage: pad weights at runtime
        packed = jnp.pad(packed, ((0, k2p - k2t), (0, 0)))
    elif k2 != k2p:
        return None  # stored padding disagrees with the tiling rule
    if k2p != k2t:
        zpad = jnp.zeros((mp, k2p - k2t), jnp.bfloat16)
        x2 = jnp.concatenate(
            [x2[:, :k2t], zpad, x2[:, k2t:], zpad], axis=1)
    k2 = k2p
    n_k = k2 // bk
    scale2 = scale.reshape(1, n).astype(jnp.float32)
    if mp == bm:  # single m-tile: constant x index map (resident buffer)
        kern = functools.partial(_w4_pallas_kernel, k2=k2, bk=bk, n_k=n_k,
                                 k_axis=1)
        out = pl.pallas_call(
            kern,
            grid=(n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, 2 * k2), lambda j, ki: (0, 0)),
                pl.BlockSpec((bk, bn), lambda j, ki: (ki, j)),
                pl.BlockSpec((1, bn), lambda j, ki: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda j, ki: (0, j)),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=jax.default_backend() == "cpu",
        )(x2, packed, scale2)
    else:
        kern = functools.partial(_w4_pallas_kernel, k2=k2, bk=bk, n_k=n_k,
                                 k_axis=2)
        out = pl.pallas_call(
            kern,
            grid=(mp // bm, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, 2 * k2), lambda i, j, ki: (i, 0)),
                pl.BlockSpec((bk, bn), lambda i, j, ki: (ki, j)),
                pl.BlockSpec((1, bn), lambda i, j, ki: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, ki: (i, j)),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=jax.default_backend() == "cpu",
        )(x2, packed, scale2)
    return out[:m].reshape(*lead, n).astype(x.dtype)


def quantize_linear_params_int4(params: Dict, group: Optional[int] = None,
                                free_dense: bool = False) -> Dict:
    """{'w': (K,N), 'b'?} -> {'w4', 'w4_scale', 'b'?} (see w4_linear).
    Per-channel packed weights are K-pre-padded to the Pallas kernel's
    tiling here, at conversion time — XLA does not hoist a loop-invariant
    runtime pad out of the decode scan (measured ~0.6 ms/token at 7B,
    script/profile_decode.py)."""
    packed, scale = quantize_weights_int4(params["w"], group)
    if group is None:
        k2, n = packed.shape
        k2p = _w4_padded_k2(k2, n)
        if k2p != k2:
            packed = jnp.pad(packed, ((0, k2p - k2), (0, 0)))
    packed = jax.block_until_ready(packed)
    out = {"w4": packed, "w4_scale": scale}
    if "b" in params and params["b"] is not None:
        out["b"] = params["b"]
    if free_dense and isinstance(params["w"], jax.Array):
        params["w"].delete()
    return out


def w4_linear(params: Dict, x: jax.Array) -> jax.Array:
    """Drop-in for ops.layers.linear on int4-packed params. On TPU with
    per-channel scales the Pallas kernel keeps the unpack in VMEM (the XLA
    composition materializes unpacked bf16 weights in HBM — measured SLOWER
    than int8 at 7B decode, 15.8 vs 12.7 ms/token)."""
    out = None
    if jax.default_backend() not in ("cpu",):
        out = w4_matmul_pallas(x, params["w4"], params["w4_scale"])
    if out is None:
        out = w4_matmul(x, params["w4"], params["w4_scale"])
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    return out


def quantize_tree_linears(tree, free_dense: bool = False):
    """Recursively convert every linear param dict ({'w': 2-D array, ...})
    in a pytree to W8A8 form. Non-linear leaves (norms, embeddings, biases)
    pass through untouched."""
    if isinstance(tree, dict):
        w = tree.get("w")
        if w is not None and getattr(w, "ndim", 0) == 2:
            return quantize_linear_params(tree, free_dense=free_dense)
        return {k: quantize_tree_linears(v, free_dense) for k, v in tree.items()}
    if isinstance(tree, list):
        return [quantize_tree_linears(v, free_dense) for v in tree]
    return tree
