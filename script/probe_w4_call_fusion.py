"""Probe: does FUSING decode matmul Pallas calls (q|k|v -> one kernel,
gate|up -> one kernel) reduce W4A16 decode cost?

Hypothesis: the W4 decode loop runs 7 Pallas custom calls per layer
(q,k,v,o,gate,up,down); if each call carries a fixed scheduling cost, the
int4 path (11.59 ms/token) pays ~224 of them per token while the int8 XLA
path (12.80) pays none. Weight packing was probed for the int8 path and
rejected at 2.3% (DESIGN.md) — this probe re-asks the question for the
Pallas W4 kernel specifically, with a scan-chained workload at exact 7B
decode shapes (m=1 row, K=4096).

Result: see the table printed by a chip run (recorded in DESIGN.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from stllm_tpu.ops.quant import quantize_weights_int4, w4_matmul_pallas

D, FFN, STEPS = 4096, 11008, 32


def bench(name, step_fn, x0, iters=30):
    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (step_fn(c), 0.0), x,
                            None, length=STEPS)[0]

    out = run(x0)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x0)
    out.block_until_ready()
    float(np.asarray(out).sum())  # force host sync through the tunnel
    dt = (time.perf_counter() - t0) / iters / STEPS * 1000
    print(f"{name:28s} {dt:.3f} ms/step")
    return dt


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)

    def w4(shape):
        w = jnp.asarray(rng.normal(size=shape) * 0.02, jnp.bfloat16)
        return quantize_weights_int4(w, group=None)

    # --- qkv: 3 separate (D,D) vs 1 fused (D,3D) ---
    seps = [w4((D, D)) for _ in range(3)]
    fused_p, fused_s = w4((D, 3 * D))

    def step_sep(x):
        outs = [w4_matmul_pallas(x, p, s) for p, s in seps]
        return outs[0] + outs[1] + outs[2]

    def step_fused(x):
        y = w4_matmul_pallas(x, fused_p, fused_s)
        return y[:, :D] + y[:, D:2 * D] + y[:, 2 * D:]

    bench("qkv split (3 calls)", step_sep, x0)
    bench("qkv fused (1 call)", step_fused, x0)

    # --- gate|up: 2 separate (D,FFN) vs 1 fused (D,2*FFN) ---
    g = [w4((D, FFN)) for _ in range(2)]
    gf_p, gf_s = w4((D, 2 * FFN))
    down_p, down_s = w4((FFN, D))

    def step_gu_sep(x):
        a = w4_matmul_pallas(x, g[0][0], g[0][1])
        b = w4_matmul_pallas(x, g[1][0], g[1][1])
        return w4_matmul_pallas(jax.nn.silu(a) * b, down_p, down_s)

    def step_gu_fused(x):
        y = w4_matmul_pallas(x, gf_p, gf_s)
        return w4_matmul_pallas(jax.nn.silu(y[:, :FFN]) * y[:, FFN:],
                                down_p, down_s)

    bench("mlp split (3 calls)", step_gu_sep, x0)
    bench("mlp fused (2 calls)", step_gu_fused, x0)


if __name__ == "__main__":
    main()
