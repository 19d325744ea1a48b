"""Where do the 7B decode milliseconds go? Production-STRUCTURE probe.

Builds a matmul-only skeleton of the decode step (32 layers x the 7 decoder
matmuls at Vicuna-7B shapes, data-dependent, M=1 row) inside the same
16-step lax.scan chunking the production generate loop uses, and times it
per variant on the real chip:

  null    no matmuls at all                   -> scan/step overhead floor
  int8    production W8A8 XLA path            -> what decode pays today
  w8p     Pallas kernel streaming int8 bytes, convert-only unpack
  w4      production W4A16 Pallas kernel (int32-shift nibble unpack, 6
          VPU ops per packed byte)
  w4v3    arithmetic packing (p = 16*bottom + top) unpacked entirely in
          bf16: pf = bf16(p); bot = round(pf/16); top = pf - 16*bot —
          4 VPU ops per packed byte, all values exact in bf16
  w4fuse  production w4 kernel, but q|k|v and gate|up each packed into ONE
          (K/2, 3N)/(K/2, 2N) weight -> 4 pallas calls/layer instead of 7

Interpretation: if w4 ~= w8p, the int4 kernel is VPU-bound on unpack (bytes
were halved but time didn't move); if w4 ~= w8p/2, it is bandwidth-bound and
only fewer bytes help. w4v3 tests cheaper unpack arithmetic; w4fuse tests
per-call overhead.

Run:  python script/probe_decode_budget.py [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stllm_tpu.ops.quant import (
    quant_linear, w4_linear, w4_matmul_pallas, _w4_tiles)

HID, FFN = 4096, 11008
LAYERS = int(os.environ.get("PROBE_LAYERS", "32"))
STEPS = int(os.environ.get("PROBE_STEPS", "16"))   # tokens per device call
CALLS = int(os.environ.get("PROBE_CALLS", "4"))


# --- w4v2: arithmetic nibble packing + cheap unpack ------------------------

def pack_arith(codes_top: np.ndarray, codes_bottom: np.ndarray) -> np.ndarray:
    """packed = bottom*16 + top, top/bottom in [-7,7] -> packed in [-119,119].
    bottom = round(packed/16) exactly (|top|/16 <= 0.4375 < 0.5)."""
    return (codes_bottom.astype(np.int16) * 16
            + codes_top.astype(np.int16)).astype(np.int8)


def _w4v3_kernel(x_ref, p_ref, s_ref, o_ref, acc_ref, *, k2, bk, n_k):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pf = p_ref[:].astype(jnp.bfloat16)         # packed = 16*bottom + top,
    bot = jnp.round(pf * 0.0625)               # |p| <= 119: exact in bf16
    top = pf - 16.0 * bot                      # exact small ints
    ks = ki * bk
    xt = x_ref[:, pl.dslice(ks, bk)]
    xb = x_ref[:, pl.dslice(k2 + ks, bk)]
    acc_ref[:] += jax.lax.dot_general(
        xt, top, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xb, bot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def w4v3_matmul(x, packed, scale):
    k2, n = packed.shape
    tiles = _w4_tiles(k2, n)
    if tiles is None:
        raise ValueError((k2, n))
    bk, bn = tiles
    m = x.shape[0]
    mp = max(16, -(-m // 16) * 16)
    x2 = x.astype(jnp.bfloat16)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    n_k = k2 // bk
    kern = functools.partial(_w4v3_kernel, k2=k2, bk=bk, n_k=n_k)
    out = pl.pallas_call(
        kern,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((mp, 2 * k2), lambda j, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda j, ki: (ki, j)),
            pl.BlockSpec((1, bn), lambda j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda j, ki: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() == "cpu",
    )(x2, packed, scale.reshape(1, n).astype(jnp.float32))
    return out[:m].astype(x.dtype)


# --- w8p: Pallas kernel streaming int8, convert-only ------------------------

def _w8p_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bk, n_k):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xt = x_ref[:, pl.dslice(ki * bk, bk)]
    acc_ref[:] += jax.lax.dot_general(
        xt, w_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0]).astype(o_ref.dtype)


def w8p_matmul(x, w_q, scale):
    k, n = w_q.shape
    tiles = _w4_tiles(k, n)   # same VMEM math applies
    if tiles is None:
        raise ValueError((k, n))
    bk, bn = tiles
    m = x.shape[0]
    mp = max(16, -(-m // 16) * 16)
    x2 = x.astype(jnp.bfloat16)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    n_k = k // bk
    kern = functools.partial(_w8p_kernel, bk=bk, n_k=n_k)
    out = pl.pallas_call(
        kern,
        grid=(n // bn, n_k),
        in_specs=[
            pl.BlockSpec((mp, k), lambda j, ki: (0, 0)),
            pl.BlockSpec((bk, bn), lambda j, ki: (ki, j)),
            pl.BlockSpec((1, bn), lambda j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda j, ki: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=jax.default_backend() == "cpu",
    )(x2, w_q, scale.reshape(1, n).astype(jnp.float32))
    return out[:m].astype(x.dtype)


# --- weight builders --------------------------------------------------------

SHAPES = [("q", HID, HID), ("k", HID, HID), ("v", HID, HID),
          ("o", HID, HID), ("gate", HID, FFN), ("up", HID, FFN),
          ("down", FFN, HID)]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _dev_codes(key, kk, n, arith):
    """Random small int4 codes built ON DEVICE (host RNG + tunnel transfer
    of 6.5 GB takes minutes on this 1-core host)."""
    top = jax.random.randint(key, (kk // 2, n), -3, 4, dtype=jnp.int8)
    bottom = jax.random.randint(
        jax.random.fold_in(key, 1), (kk // 2, n), -3, 4, dtype=jnp.int8)
    if arith:
        return (bottom.astype(jnp.int16) * 16
                + top.astype(jnp.int16)).astype(jnp.int8)
    return (top & jnp.int8(0x0F)) | jax.lax.shift_left(bottom, jnp.int8(4))


def build(variant, rng):
    """Per-layer dict of params in the variant's storage form. Codes are
    small ints, scales tiny, so activations stay bounded over 32 layers."""
    key = jax.random.PRNGKey(0)
    layers = []
    for li in range(LAYERS):
        l = {}
        for name, k, n in SHAPES:
            kk = k if k % 1024 == 0 else -(-k // 512) * 512  # pad 11008->11264
            key = jax.random.fold_in(key, 7)
            scale = jnp.full((n,), 1.0 / (8 * np.sqrt(k)), jnp.float32)
            if variant in ("int8", "w8p"):
                kuse = k if variant == "int8" else kk
                codes = jax.random.randint(key, (kuse, n), -3, 4,
                                           dtype=jnp.int8)
                l[name] = {"w_q": codes, "w_scale": scale}
            elif variant in ("w4", "w4fuse"):
                l[name] = {"w4": _dev_codes(key, kk, n, False),
                           "w4_scale": scale}
            elif variant == "w4v3":
                l[name] = {"w4": _dev_codes(key, kk, n, True),
                           "w4_scale": scale}
            elif variant == "null":
                l[name] = {"n": n}
        layers.append(l)
    if variant == "w4fuse":  # q|k|v and gate|up each as one wide weight
        fused = []
        for l in layers:
            f = {"qkv": {"w4": jnp.concatenate(
                             [l[n]["w4"] for n in ("q", "k", "v")], axis=1),
                         "w4_scale": jnp.concatenate(
                             [l[n]["w4_scale"] for n in ("q", "k", "v")])},
                 "o": l["o"],
                 "gateup": {"w4": jnp.concatenate(
                                [l[n]["w4"] for n in ("gate", "up")], axis=1),
                            "w4_scale": jnp.concatenate(
                                [l[n]["w4_scale"] for n in ("gate", "up")])},
                 "down": l["down"]}
            fused.append(f)
        layers = fused
    return layers


def apply_linear(variant, p, x):
    if variant == "int8":
        return quant_linear(p, x)
    if variant == "w8p":
        return w8p_matmul(x, p["w_q"], p["w_scale"])
    if variant in ("w4", "w4fuse"):
        out = w4_matmul_pallas(x, p["w4"], p["w4_scale"])
        assert out is not None
        return out
    if variant == "w4v3":
        return w4v3_matmul(x, p["w4"], p["w4_scale"])
    if variant == "null":
        return jnp.broadcast_to(jnp.mean(x, axis=-1, keepdims=True),
                                (x.shape[0], p["n"])).astype(x.dtype)
    raise ValueError(variant)


def kpad(variant, x, k):
    """Match the padded K the weights were built with."""
    kk = k if k % 1024 == 0 else -(-k // 512) * 512
    if variant in ("int8", "null") or kk == k:
        return x
    return jnp.pad(x, ((0, 0), (0, kk - k)))


def make_step(variant, layers):
    if variant == "w4fuse":
        def step(x, _):
            for l in layers:
                qkv = apply_linear(variant, l["qkv"], x)
                a, b, c = jnp.split(qkv, 3, axis=-1)
                h = apply_linear(variant, l["o"], (a + b + c) / 3.0)
                gu = apply_linear(variant, l["gateup"], h)
                g, u = jnp.split(gu, 2, axis=-1)
                x = apply_linear(variant, l["down"],
                                 kpad("w4", jnp.tanh(g) * u, FFN))
            return x, ()
        return step

    def step(x, _):
        for l in layers:
            a = apply_linear(variant, l["q"], x)
            b = apply_linear(variant, l["k"], x)
            c = apply_linear(variant, l["v"], x)
            h = apply_linear(variant, l["o"], (a + b + c) / 3.0)
            g = apply_linear(variant, l["gate"], h)
            u = apply_linear(variant, l["up"], h)
            x = apply_linear(variant, l["down"],
                             kpad(variant, jnp.tanh(g) * u, FFN))
        return x, ()
    return step


def measure(variant):
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    layers = build(variant, rng)
    jax.block_until_ready(layers)
    print(f"{variant}: weights built in {time.perf_counter()-t0:.1f}s",
          flush=True)
    if variant == "null":  # no arrays — closure keeps shapes static
        @jax.jit
        def chunk(_, x):
            y, __ = jax.lax.scan(make_step(variant, layers), x, (),
                                 length=STEPS)
            return y
    else:
        @jax.jit
        def chunk(layers, x):
            step = make_step(variant, layers)
            y, _ = jax.lax.scan(step, x, (), length=STEPS)
            return y

    x = jnp.asarray(rng.normal(size=(1, HID)), jnp.bfloat16)
    t0 = time.perf_counter()
    float(chunk(layers, x).sum())  # host pull = the only real barrier here
    print(f"{variant}: compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    float(chunk(layers, x).sum())
    t0 = time.perf_counter()
    for _ in range(CALLS):
        out = chunk(layers, x)
    s = float(out.sum())           # drains the async dispatch queue
    ms_tok = (time.perf_counter() - t0) * 1e3 / (CALLS * STEPS)
    assert np.isfinite(s), variant
    print(f"{variant:6s} {ms_tok:7.3f} ms/token (matmul skeleton)", flush=True)
    for l in layers:
        for p in l.values():
            for v in p.values():
                if isinstance(v, jax.Array):
                    v.delete()
    return ms_tok


def check_w4v3():
    """Numeric check of the arithmetic-pack unpack on the real backend."""
    rng = np.random.default_rng(1)
    k, n, m = 2048, 512, 3
    top = rng.integers(-7, 8, size=(k // 2, n)).astype(np.int8)
    bottom = rng.integers(-7, 8, size=(k // 2, n)).astype(np.int8)
    scale = rng.uniform(0.5, 2.0, size=(n,)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    want = (x[:, : k // 2] @ top.astype(np.float32)
            + x[:, k // 2:] @ bottom.astype(np.float32)) * scale
    got = np.asarray(w4v3_matmul(
        jnp.asarray(x, jnp.float32), jnp.asarray(pack_arith(top, bottom)),
        jnp.asarray(scale)), np.float32)
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.max() < 2e-2, rel.max()  # bf16 x-operand rounding only
    print(f"w4v3 numeric check OK (max rel err {rel.max():.2e})", flush=True)


def main():
    variants = sys.argv[1:] or ["null", "w4", "w4v3", "w4fuse", "w8p", "int8"]
    if "w4v3" in variants:
        check_w4v3()
    results = {v: measure(v) for v in variants}
    print(results)


if __name__ == "__main__":
    main()
