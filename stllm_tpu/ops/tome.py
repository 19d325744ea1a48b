"""Token merging (ToMe-style bipartite soft matching) for the ViT encode.

FLOP-reduction lever toward the 4x north star: DESIGN.md's roofline shows
the 800 fr/s target sits ABOVE int8 speed-of-light (716 fr/s at 100% MFU)
for the reference FLOP count — EVA-ViT-g runs 39 blocks x width 1408 over
257 tokens per frame (reference: stllm/models/eva_vit.py:416-428), and
adjacent-video-frame patches are heavily redundant at that resolution. The
only route past the wall is fewer tokens, with a measured answer-equivalence
envelope (TOME_EQUIV.json) legitimizing the reduction the same way
EQUIV_INT8.json legitimized int8.

TPU-first design — STAGED merging, not per-block ToMe:
  * The classic formulation removes r tokens in EVERY block, so every block
    runs at a different, oddly-sized sequence length and every block pays a
    matching pass. Here merging happens at 2-3 STAGE BOUNDARIES
    (cfg.merge_schedule), so 13+ consecutive blocks share one static,
    lane-friendly length (e.g. 257 -> 192 -> 144), the existing static-int8
    block path runs unmodified between stages, and XLA compiles one program
    per stage shape.
  * The merge itself is all MXU/top-k work: cosine scores are one
    (nA, d) x (d, nB) matmul, token selection is lax.top_k, and the
    scatter-average is a one-hot matmul — no dynamic shapes anywhere.
  * Bipartite rule (public ToMe algorithm, Bolya et al. 2022): tokens are
    split alternately into sets A (odd positions) and B (even, which keeps
    CLS at B[0]); each A token's best cosine match in B is found; the r
    most-similar A tokens are merged into their matches by size-weighted
    averaging; merges INTO the CLS token are forbidden. Token "sizes"
    (how many original patches each token represents) carry across stages
    so successive averages stay correctly weighted.

Proportional attention (ToMe's optional log-size logit bias) is NOT applied:
it would thread a bias through the fused Pallas attention kernels for a
refinement the paper reports as a sub-point of accuracy off-the-shelf; the
accuracy envelope is measured without it (script/tome_equivalence.py).

The merge-origin map (which merged token represents each original position)
is returned for unmerge — the BTAdapter branch needs full-resolution,
position-aligned trunk features (its temporal attention matches patch i of
frame t with patch i of frame t+1), so the trunk merges and the branch
gathers back through the map.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bipartite_merge(
    x: jax.Array,        # (B, N, D) tokens, CLS at index 0
    sizes: jax.Array,    # (B, N) fp32, #original tokens each row represents
    origin: jax.Array,   # (B, N0) int32, current index of each ORIGINAL token
    m: int,              # tokens to keep (N -> m)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One merge stage: N tokens -> m tokens (r = N - m merged away).

    Returns (x', sizes', origin') where x' is (B, m, D) with CLS still at
    index 0, and origin' maps every original token position to its current
    representative in x' (for unmerge: ``take_along_axis(x', origin')``).

    r is capped at the A-set size (alternating split => r <= floor(N/2));
    callers pick schedules that respect it.
    """
    b, n, d = x.shape
    r = n - m
    # A = odd positions, B = even (CLS lands in B at slot 0)
    xa, xb = x[:, 1::2], x[:, 0::2]
    sa, sb = sizes[:, 1::2], sizes[:, 0::2]
    na, nb = xa.shape[1], xb.shape[1]
    if r > na:
        raise ValueError(f"merge {n}->{m} removes {r} > A-set size {na}")

    # cosine similarity of every A token to every B token (fp32 matmul)
    xf = x.astype(jnp.float32)
    metric = xf / jnp.maximum(
        jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bad,bcd->bac", metric[:, 1::2], metric[:, 0::2])
    scores = scores.at[:, :, 0].set(-jnp.inf)       # never merge into CLS
    best_val = jnp.max(scores, axis=-1)             # (B, nA)
    best_dst = jnp.argmax(scores, axis=-1)          # (B, nA) index into B

    # the r most-similar A tokens get merged; the rest survive in order
    _, merge_src = jax.lax.top_k(best_val, r)       # (B, r) index into A
    picked = jnp.zeros((b, na), jnp.int32).at[
        jnp.arange(b)[:, None], merge_src].set(1)
    # stable sort brings unpicked (0) first, preserving original A order
    keep_src = jnp.argsort(picked, axis=1, stable=True)[:, : na - r]

    # size-weighted scatter-average of merged A tokens into their B targets
    sa_m = jnp.take_along_axis(sa, merge_src, axis=1)          # (B, r)
    xa_m = jnp.take_along_axis(
        xf[:, 1::2], merge_src[..., None], axis=1)             # (B, r, D)
    dst = jnp.take_along_axis(best_dst, merge_src, axis=1)     # (B, r)
    onehot = jax.nn.one_hot(dst, nb, dtype=jnp.float32)        # (B, r, nB)
    add_x = jnp.einsum("brn,brd->bnd", onehot, xa_m * sa_m[..., None])
    add_s = jnp.einsum("brn,br->bn", onehot, sa_m)
    sb_new = sb + add_s
    xb_new = (xf[:, 0::2] * sb[..., None] + add_x) / sb_new[..., None]

    xa_keep = jnp.take_along_axis(xa, keep_src[..., None], axis=1)
    sa_keep = jnp.take_along_axis(sa, keep_src, axis=1)
    x_out = jnp.concatenate([xb_new.astype(x.dtype), xa_keep], axis=1)
    s_out = jnp.concatenate([sb_new, sa_keep], axis=1)

    # --- origin map update (all static-shape index arithmetic) ------------
    # new index of B slot j is j; new index of surviving A slot k is nb + rank
    a_new = jnp.full((b, na), -1, jnp.int32)
    a_new = a_new.at[jnp.arange(b)[:, None], keep_src].set(
        nb + jnp.arange(na - r, dtype=jnp.int32)[None, :])
    # merged A tokens point at their B destination's new index (== dst)
    a_new = a_new.at[jnp.arange(b)[:, None], merge_src].set(
        dst.astype(jnp.int32))
    # stitch back into pre-merge positions: even -> B rank, odd -> A map
    new_of_old = jnp.zeros((b, n), jnp.int32)
    new_of_old = new_of_old.at[:, 0::2].set(
        jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (b, nb)))
    new_of_old = new_of_old.at[:, 1::2].set(a_new)
    origin_out = jnp.take_along_axis(new_of_old, origin, axis=1)
    return x_out, s_out, origin_out


def unmerge(x: jax.Array, origin: jax.Array) -> jax.Array:
    """Expand merged tokens back to the original resolution: each original
    position takes its representative's value. (B, m, D), (B, N0) ->
    (B, N0, D)."""
    return jnp.take_along_axis(x, origin[..., None], axis=1)


def init_merge_state(batch: int, n: int):
    """(sizes, origin) for an unmerged (batch, n, d) token tensor."""
    sizes = jnp.ones((batch, n), jnp.float32)
    origin = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), (batch, n))
    return sizes, origin
