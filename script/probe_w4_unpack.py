"""Probe: W4A16 in-VMEM unpack strategies for the 7B decode kernel.

RESULTS (round 3, recorded in DESIGN.md):
1. The unpack ARITHMETIC is not the bottleneck: int32-shift, f32-floor
   (biased-nibble layout), and int8-bitwise-and unpacks all measure the
   same ~1.06 ms/rep at good tiles. int16 shifts and bf16 floor have no
   Mosaic lowering (compile failure), same class as the int8-shift gap.
2. This chained-reps harness shows (2048, bn) tiles 14x slower than
   (1024, bn) — but that is an artifact of the serialized-chain schedule:
   END-TO-END decode (script/bench_decode.py) measures the big-bk tiles
   FASTER (11.58 vs 12.46 ms/token). Tile decisions must come from the
   production bench; this probe is only evidence about lowerings and
   RELATIVE unpack-op cost within one tile shape.

The probe measures alternatives at a 7B decode shape (x(16,4096) @ w(4096,
11008), the gate/up matmul) with serialized reps inside one jit (per-call
timing lies through the ~30 ms axon tunnel; CLAUDE.md):

  int32   current production: astype int32, shl/sra, astype bf16 (6 passes)
  int16   astype int16, shl/sra (if Mosaic lowers int16 shifts)
  f32     biased-nibble layout p = 16*b + (t+8): v = astype f32;
          b = floor(v * 0.0625); t' = v - 16*b; the -8 bias folds into a
          per-ROW correction acc -= 8*sum(xt) (reduce, not elementwise)
  bf16    same arithmetic in bf16 (codes, products <= 256 all exact)
  and8    t8 = p & 15 (if int8 bitwise-and lowers), b = (v - t)*0.0625

Each variant is validated bit-exactly against the XLA reference unpack
before timing. Run on the real chip:  python script/probe_w4_unpack.py
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

M, K, N = 16, 4096, 11008
BK, BN = 2048, 256  # production _w4_tiles pick for (2048, 11008)
REPS = 30


def unpack_int32(p_ref):
    p32 = p_ref[:].astype(jnp.int32)
    top = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p32, jnp.int32(28)), jnp.int32(28))
    bottom = jax.lax.shift_right_arithmetic(p32, jnp.int32(4))
    return top.astype(jnp.bfloat16), bottom.astype(jnp.bfloat16), False


def unpack_int16(p_ref):
    p16 = p_ref[:].astype(jnp.int16)
    top = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(p16, jnp.int16(12)), jnp.int16(12))
    bottom = jax.lax.shift_right_arithmetic(p16, jnp.int16(4))
    return top.astype(jnp.bfloat16), bottom.astype(jnp.bfloat16), False


def unpack_f32(p_ref):
    # biased layout: p = 16*b + (t+8), b in [-7,7], t+8 in [1,15]
    v = p_ref[:].astype(jnp.float32)
    b = jnp.floor(v * jnp.float32(0.0625))
    t = v - jnp.float32(16.0) * b  # = t_signed + 8, bias corrected by caller
    return t.astype(jnp.bfloat16), b.astype(jnp.bfloat16), True


def unpack_bf16(p_ref):
    v = p_ref[:].astype(jnp.bfloat16)
    b = jnp.floor(v * jnp.bfloat16(0.0625))
    t = v - jnp.bfloat16(16.0) * b
    return t, b, True


def unpack_and8(p_ref):
    p = p_ref[:]
    t8 = jax.lax.bitwise_and(p, jnp.int8(0x0F))  # t+8 in low nibble (biased)
    t = t8.astype(jnp.bfloat16)
    v = p.astype(jnp.bfloat16)
    b = (v - t) * jnp.bfloat16(0.0625)
    return t, b, True


UNPACKS = {"int32": unpack_int32, "int16": unpack_int16, "f32": unpack_f32,
           "bf16": unpack_bf16, "and8": unpack_and8}


def kernel(x_ref, p_ref, o_ref, acc_ref, *, k2, bk, n_k, unpack):
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    top, bottom, biased = unpack(p_ref)
    ks = ki * bk
    xt = x_ref[:, pl.dslice(ks, bk)]
    xb = x_ref[:, pl.dslice(k2 + ks, bk)]
    acc_ref[:] += jax.lax.dot_general(
        xt, top, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xb, bottom, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if biased:
        # low-nibble codes carry a +8 bias: subtract 8*sum(xt) per row
        corr = jnp.sum(xt.astype(jnp.float32), axis=1, keepdims=True)
        acc_ref[:] += jnp.float32(-8.0) * corr

    @pl.when(ki == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def build(name, bk=None, bn=None):
    unpack = UNPACKS[name]
    bk = bk or BK
    bn = bn or BN
    k2 = K // 2
    n_k = k2 // bk
    kern = functools.partial(kernel, k2=k2, bk=bk, n_k=n_k, unpack=unpack)

    def one(x, p):
        return pl.pallas_call(
            kern,
            grid=(N // bn, n_k),
            in_specs=[
                pl.BlockSpec((M, K), lambda j, ki: (0, 0)),
                pl.BlockSpec((bk, bn), lambda j, ki: (ki, j)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda j, ki: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(x, p)

    @jax.jit
    def chained(x, p):
        def body(c, _):
            y = one(c, p)
            # feed a bf16 slice back so reps serialize (shape (M, K))
            c2 = jnp.tanh(y[:, :K]).astype(jnp.bfloat16)
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return c

    return one, chained


def pack_plain(t, b):
    return (t & jnp.int8(0x0F)) | jax.lax.shift_left(b, jnp.int8(4))


def pack_biased(t, b):
    return (jnp.int8(16) * b + t + jnp.int8(8)).astype(jnp.int8)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.integers(-7, 8, size=(K // 2, N)), jnp.int8)
    b = jnp.asarray(rng.integers(-7, 8, size=(K // 2, N)), jnp.int8)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.1, jnp.bfloat16)
    ref = (x[:, : K // 2].astype(jnp.float32) @ t.astype(jnp.float32)
           + x[:, K // 2:].astype(jnp.float32) @ b.astype(jnp.float32))
    packs = {"int32": pack_plain(t, b), "int16": pack_plain(t, b),
             "f32": pack_biased(t, b), "bf16": pack_biased(t, b),
             "and8": pack_biased(t, b)}

    results = {}
    tile_grid = [(2048, 256), (1024, 256), (512, 256), (1024, 128)]
    for name in UNPACKS:
        for bk, bn in tile_grid:
            one, chained = build(name, bk, bn)
            p = packs[name]
            tag = f"{name}[{bk}x{bn}]"
            try:
                y = jax.block_until_ready(one(x, p))
            except Exception as e:  # Mosaic lowering gap
                msg = str(e).splitlines()[0][:110]
                print(f"{tag:18s} FAILS to compile: {msg}", flush=True)
                results[tag] = None
                break  # lowering gaps are tile-independent
            err = float(jnp.max(jnp.abs(y - ref)))
            # warm + time the chained form
            out = jax.block_until_ready(chained(x, p))
            t0 = time.perf_counter()
            out = chained(x, p)
            _ = float(out.sum())  # force host transfer (tunnel barrier)
            dt = (time.perf_counter() - t0) / REPS
            gbps = (K // 2 * N) / dt / 1e9
            print(f"{tag:18s} max|err|={err:8.4f}  {dt*1e3:7.3f} ms/rep  "
                  f"packed-read {gbps:6.1f} GB/s", flush=True)
            results[tag] = dt * 1e3
    print({k: v for k, v in results.items() if v is not None})


if __name__ == "__main__":
    main()
