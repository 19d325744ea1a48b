"""On-TPU kernel smoke gate: compile AND execute every Pallas kernel variant
and dispatch tier on the real chip, asserting numerics against the XLA
references.

Why this exists: the pytest suite runs on CPU (tests/conftest.py forces
``JAX_PLATFORMS=cpu``), so Pallas kernels are only ever exercised in
interpret mode there. A Mosaic compilation regression — the exact failure
class that exists on this backend (e.g. in-kernel 3D transpose fails to
compile, CLAUDE.md) — would pass the whole suite and only surface in a
manual bench run. This script is the pre-commit gate for any ops/ change:

    python script/verify_tpu.py          # ~6 min over the axon tunnel
                                         # (compile-dominated; kernels are ms)

First catch (round 3, first-ever run): exact-GELU gelu_quant crashed Mosaic
compilation — erfc has no Pallas TPU lowering; invisible to the CPU suite.

Covers (dispatch map in stllm_tpu/ops/attention.py:flash_attention):
  - Pallas flash forward, causal + non-causal + kv-masked   (S >= 1024 tier)
  - Pallas flash two-kernel backward (dq / dkv)
  - fused single-pass short-seq kernel, fwd + bwd           (S < 1024 tier)
  - packed-qkv kernel, dense + int8-epilogue variants       (ViT shape)
  - static-int8-qkv kernel, s8-dot + bf16-upcast variants   (ViT shape)
  - epilogue-carried-LN kernel (s8 dot + residual + LN + static int8)
  - dynamic-quant matmul kernel (quant_matmul_pallas)
  - producer-fused LN->int8 and GELU->int8 kernels
  - ring attention via shard_map (1-device mesh)
  - static-scale int8 forms (XLA fusions, not Pallas — cheap to include)

Exits non-zero on any numeric mismatch or compile failure.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PASS = []
FAIL = []


def check(name, got, want, atol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want))
    ok = err <= atol
    (PASS if ok else FAIL).append(name)
    print(f"  {'ok ' if ok else 'FAIL'} {name:44s} max_err={err:.3e}"
          + ("" if ok else f" (atol {atol})"))


def run(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"[{name}] {time.perf_counter()-t0:.1f}s")
    except Exception as e:
        FAIL.append(name)
        print(f"[{name}] EXCEPTION: {type(e).__name__}: {e}")


def attention_tiers():
    from stllm_tpu.ops.attention import flash_attention, mha_reference

    rng = np.random.default_rng(0)

    # --- flash tier (S >= 1024): causal, non-causal, kv-masked ---
    b, s, h, d = 1, 1280, 4, 128
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    kv_mask = jnp.asarray(rng.random((b, s)) > 0.1, bool)

    for causal in (False, True):
        got = jax.jit(
            lambda q, k, v: flash_attention(q, k, v, causal=causal,
                                            use_pallas=True))(q, k, v)
        want = mha_reference(q, k, v, causal=causal)
        check(f"flash fwd causal={causal}", got, want, 3e-2)

    got = jax.jit(lambda q, k, v, m: flash_attention(
        q, k, v, kv_mask=m, use_pallas=True))(q, k, v, kv_mask)
    want = mha_reference(q, k, v, kv_mask=kv_mask)
    check("flash fwd kv-masked", got, want, 3e-2)

    # --- flash backward (two-kernel dq/dkv) ---
    def loss_pl(q, k, v):
        return flash_attention(q, k, v, causal=True, use_pallas=True
                               ).astype(jnp.float32).sum()

    def loss_ref(q, k, v):
        return mha_reference(q, k, v, causal=True).astype(jnp.float32).sum()

    gp = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("dq dk dv".split(), gp, gr):
        check(f"flash bwd {name}", a, b_, 0.5)  # bf16 grads, S-long sums

    # --- fused short tier (S < 1024), ViT-g head geometry ---
    b, s, h, d = 2, 257, 16, 88
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    got = jax.jit(lambda q, k, v: flash_attention(q, k, v))(q, k, v)
    want = mha_reference(q, k, v)
    check("fused short fwd (auto tier)", got, want, 3e-2)

    gp = jax.jit(jax.grad(
        lambda q, k, v: flash_attention(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: mha_reference(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("dq dk dv".split(), gp, gr):
        check(f"fused short bwd {name}", a, b_, 0.3)


def packed_qkv():
    from stllm_tpu.ops.attention import (
        _packed_reference, fused_qkv_attention, fused_qkv_attention_quant)
    from stllm_tpu.ops.quant import quantize_activations

    rng = np.random.default_rng(1)
    b, s, h, d = 2, 257, 16, 88
    qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * d)), jnp.bfloat16)

    got = jax.jit(lambda x: fused_qkv_attention(x, h, d))(qkv)
    want = _packed_reference(qkv, h, d, d ** -0.5)
    check("packed-qkv dense", got, want, 3e-2)

    oq, osc = jax.jit(lambda x: fused_qkv_attention_quant(x, h, d))(qkv)
    wq, wsc = quantize_activations(_packed_reference(qkv, h, d, d ** -0.5))
    # int8 codes may differ by 1 where the fp path rounds differently;
    # compare dequantized values
    check("packed-qkv quant (dequant)",
          oq.astype(np.float32) * np.asarray(osc),
          np.asarray(wq, np.float32) * np.asarray(wsc), 6e-2)

    # static-int8 qkv kernel (round 3): s8 QK^T + bf16-upcast variants
    from stllm_tpu.ops.attention import (
        _packed_s8_reference, fused_qkv_attention_quant_static)

    qkv_q = jnp.asarray(rng.integers(-127, 128, (b, s, 3 * h * d)), jnp.int8)
    sq, sk, sv = 0.009, 0.011, 0.008
    wq2, wsc2 = _packed_s8_reference(qkv_q, sq, sk, sv, h, d, d ** -0.5)
    want_deq = np.asarray(wq2, np.float32) * np.asarray(wsc2)
    for mode, int8_dot in (("s8-dot", True), ("bf16-dot", False)):
        got2 = jax.jit(lambda x: fused_qkv_attention_quant_static(
            x, sq, sk, sv, h, d, int8_dot=int8_dot))(qkv_q)
        if got2 is None:
            FAIL.append(f"packed-qkv s8 {mode} (declined)")
            continue
        check(f"packed-qkv s8 {mode} (dequant)",
              got2[0].astype(np.float32) * np.asarray(got2[1]),
              want_deq, 6e-2)


def quant_kernels():
    from stllm_tpu.ops.quant import (
        gelu_quant, layer_norm_quant, quant_matmul_pallas,
        quant_matmul_pallas_reference, quantize_activations)
    from stllm_tpu.ops.layers import layer_norm

    rng = np.random.default_rng(2)
    b, s, kdim, n = 2, 256, 1408, 1408
    x = jnp.asarray(rng.normal(size=(b, s, kdim)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (kdim, n)), jnp.int8)
    ws = jnp.asarray(rng.random((n,)) * 0.01, jnp.float32)

    got = jax.jit(lambda x: quant_matmul_pallas(x, wq, ws))(x)
    if got is None:
        FAIL.append("quant_matmul_pallas (no tile fit)")
    else:
        want = quant_matmul_pallas_reference(x, wq, ws)
        check("quant_matmul_pallas", got, want, 2e-2)

    ln = {"scale": jnp.asarray(rng.normal(size=(kdim,)), jnp.float32),
          "bias": jnp.asarray(rng.normal(size=(kdim,)), jnp.float32)}
    # W4A16 Pallas kernel (int32-shift unpack; int8 shifts have no Mosaic
    # lowering) vs the XLA composition
    from stllm_tpu.ops.quant import (
        quantize_weights_int4, w4_matmul, w4_matmul_pallas)

    w4w = jnp.asarray(rng.normal(size=(kdim, n)) * 0.05, jnp.float32)
    packed, pscale = quantize_weights_int4(w4w, group=None)
    x4 = jnp.asarray(rng.normal(size=(2, kdim)), jnp.bfloat16)
    got4 = jax.jit(lambda x: w4_matmul_pallas(x, packed, pscale))(x4)
    want4 = w4_matmul(x4, packed, pscale)
    check("w4_matmul_pallas", got4, want4, 5e-2)
    # m>512 dispatch tier: 3D grid with a MOVING x block (batched prefill;
    # round 3b) — a distinct Mosaic lowering the m<=512 path never compiles
    x4m = jnp.asarray(rng.normal(size=(640, kdim)), jnp.bfloat16)
    got4m = jax.jit(lambda x: w4_matmul_pallas(x, packed, pscale))(x4m)
    want4m = w4_matmul(x4m, packed, pscale)
    check("w4_matmul_pallas_mtiled", got4m, want4m, 5e-2)

    # epilogue-carried LN kernel (s8 dot + residual + LN + static int8)
    from stllm_tpu.ops.quant import (
        quant_matmul_res_ln_static, quant_matmul_res_ln_static_reference)

    hq = jnp.asarray(rng.integers(-127, 128, (b, s, kdim)), jnp.int8)
    hs = jnp.asarray(rng.uniform(0.001, 0.01, (b, s, 1)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)) * 0.02, jnp.float32)
    pq = {"w_q": wq, "w_scale": ws, "b": bias}
    fused = jax.jit(lambda hq, hs, x: quant_matmul_res_ln_static(
        hq, hs, pq, x, ln, 0.05))(hq, hs, x)
    if fused is None:
        FAIL.append("quant_matmul_res_ln_static (declined)")
    else:
        wx, wyq = quant_matmul_res_ln_static_reference(hq, hs, pq, x, ln, 0.05)
        check("res_ln_static (x_new)", fused[0].astype(jnp.float32),
              wx.astype(jnp.float32), 5e-2)
        check("res_ln_static (yq dequant)",
              fused[1].astype(np.float32) * 0.05,
              np.asarray(wyq, np.float32) * 0.05, 0.08)

    got_q, got_s = jax.jit(lambda x: layer_norm_quant(ln, x))(x)
    want_q, want_s = quantize_activations(layer_norm(ln, x))
    # codes may differ by 1 where bf16 rounding crosses a boundary; the
    # dequant error bound is one step of the larger row scale
    tol = 1.5 * float(np.maximum(np.asarray(got_s), np.asarray(want_s)).max())
    check("layer_norm_quant (dequant)",
          got_q.astype(np.float32) * np.asarray(got_s),
          np.asarray(want_q, np.float32) * np.asarray(want_s), tol)

    # approx=True exercises the fused kernel; approx=False must take the XLA
    # fallback (erf/erfc has no Mosaic lowering — the compile itself is the
    # regression test here)
    for approx in (True, False):
        got_q, got_s = jax.jit(lambda x: gelu_quant(x, approx=approx))(x)
        want_q, want_s = quantize_activations(
            jax.nn.gelu(x.astype(jnp.float32), approximate=approx))
        tol = 1.5 * float(np.maximum(np.asarray(got_s),
                                     np.asarray(want_s)).max())
        check(f"gelu_quant approx={approx} (dequant)",
              got_q.astype(np.float32) * np.asarray(got_s),
              np.asarray(want_q, np.float32) * np.asarray(want_s), tol)


def ring():
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from stllm_tpu.ops.attention import mha_reference
    from stllm_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(3)
    b, s, h, d = 1, 256, 4, 64
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp", causal=True),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    got = jax.jit(fn)(q, q, q)
    want = mha_reference(q, q, q, causal=True)
    check("ring attention (1-dev mesh)", got, want, 3e-2)


def static_int8():
    from stllm_tpu.ops.layers import layer_norm
    from stllm_tpu.ops.quant import (
        layer_norm_quant_static, quant_mlp_static, quantize_static,
        quantize_weights)

    rng = np.random.default_rng(4)
    b, s, kdim, n = 2, 256, 1408, 6144
    x = jnp.asarray(rng.normal(size=(b, s, kdim)), jnp.bfloat16)
    ln = {"scale": jnp.asarray(rng.normal(size=(kdim,)), jnp.float32),
          "bias": jnp.asarray(rng.normal(size=(kdim,)), jnp.float32)}
    got = jax.jit(lambda x: layer_norm_quant_static(ln, x, 0.05))(x)
    want = quantize_static(layer_norm(ln, x), 0.05)
    check("layer_norm_quant_static", got, want, 1.01)  # int8 codes, ±1 round

    w1, s1 = quantize_weights(jnp.asarray(rng.normal(size=(kdim, n)),
                                          jnp.float32) * 0.02)
    w2, s2 = quantize_weights(jnp.asarray(rng.normal(size=(n, kdim)),
                                          jnp.float32) * 0.02)
    hq = jnp.asarray(rng.integers(-127, 128, (b, s, kdim)), jnp.int8)
    got = jax.jit(lambda hq: quant_mlp_static(
        hq, 0.02, {"w_q": w1, "w_scale": s1}, 0.05,
        {"w_q": w2, "w_scale": s2}, jnp.bfloat16))(hq)
    # XLA reference of the same math
    y = (hq.astype(jnp.float32) @ w1.astype(jnp.float32)) * (0.02 * s1)
    g = jax.nn.gelu(y)
    gq = quantize_static(g, 0.05)
    want = (gq.astype(jnp.float32) @ w2.astype(jnp.float32)) * (0.05 * s2)
    check("quant_mlp_static", got, want, 0.5)


def main():
    assert jax.default_backend() != "cpu", (
        "verify_tpu.py must run on the TPU (the CPU suite already covers "
        "interpret mode)")
    t0 = time.perf_counter()
    run("attention tiers", attention_tiers)
    run("packed qkv", packed_qkv)
    run("quant kernels", quant_kernels)
    run("ring attention", ring)
    run("static int8", static_int8)
    dt = time.perf_counter() - t0
    print(f"\n{len(PASS)} ok, {len(FAIL)} failed in {dt:.0f}s")
    if FAIL:
        print("FAILED:", ", ".join(FAIL))
        sys.exit(1)


if __name__ == "__main__":
    main()
