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

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

# Named, MEASURED merge levels for EVA-ViT-g (depth 39, 257 tokens/frame).
# This table is THE single source for every bench / equivalence script
# (script/bench_tome.py, tome_equivalence.py, bench_pipeline*.py,
# bench_btadapter.py): the accuracy envelope in TOME_EQUIV.json is only
# valid for the exact schedules the throughput numbers were measured at,
# so the schedules must never drift apart between scripts.
#   merge_schedule   — ((block, tokens_after), ...); block == 39 (== depth)
#                      is the post-trunk spatial re-merge feeding the
#                      Q-Former fewer tokens.
#   temporal_schedule — ((block, fold_group, tokens_after), ...) cross-frame
#                      folds (see fold_frames).
MERGE_LEVELS: Dict[str, Dict[str, tuple]] = {
    "off": {},
    "mild": {"merge_schedule": ((13, 192), (26, 144))},
    "medium": {"merge_schedule": ((13, 160), (26, 96))},
    "aggressive": {"merge_schedule": ((10, 144), (20, 88), (30, 56))},
    "t_mild": {"temporal_schedule": ((8, 2, 320),),
               "merge_schedule": ((39, 128),)},
    "t_medium": {"temporal_schedule": ((8, 2, 288), (20, 2, 320)),
                 "merge_schedule": ((39, 96),)},
    "t_aggressive": {"temporal_schedule": ((6, 2, 288), (16, 2, 288),
                                           (28, 2, 320)),
                     "merge_schedule": ((39, 64),)},
}


# Redundancy-adaptive level selection (round 5, VERDICT #3). The envelope
# (TOME_EQUIV.json) shows exactly when each level is safe: temporal folding
# collapses on iid noise (zero cross-frame redundancy) while near-static
# video tolerates even t_aggressive. Adjacent-frame redundancy is measurable
# on the host for free at upload time, so "auto" maps a per-video statistic
# to a level instead of shipping one global knob.
#
# Statistic: frames are 8x8 average-pooled first — sub-pixel/slow motion
# (which the fold's bipartite matching absorbs) mostly vanishes under
# pooling, while iid noise stays fully decorrelated — then
#   r_t = mean |P[t+1] - P[t]| / std(P)   (temporal redundancy; 0 = static)
#   r_s = mean |P[:, x+1] - P[:, x]| / std(P)   (spatial redundancy)
# Measured separation (stllm_tpu/data/synth.py arms): static 0.00, smooth
# drifting video 0.29, noisy video 0.85, iid noise 1.13 (r_s: smooth 0.91,
# noise 1.14). Thresholds sit in the gaps, erring conservative: the
# near-lossless t_medium needs clear redundancy, t_aggressive only for
# near-static input, and high-entropy frames get NO merging at all.
_AUTO_T_AGGRESSIVE = 0.15
_AUTO_T_MEDIUM = 0.45
_AUTO_T_MILD = 0.70
_AUTO_SPATIAL = 1.05


def frame_redundancy(frames) -> Tuple[float, float]:
    """(r_t, r_s) pooled-frame redundancy statistics; host-side numpy.

    ``frames``: (T, H, W, C) or (B, T, H, W, C), any real dtype (uint8
    pixels or normalized floats — both ratios are scale-invariant). A
    batch reduces with elementwise max over videos: the LEAST redundant
    video governs, so a shared level is safe for the whole mixture."""
    f = _np.asarray(frames, _np.float32)
    if f.ndim == 5:
        if f.shape[0] > 1:
            per = [frame_redundancy(v) for v in f]
            return (max(p[0] for p in per), max(p[1] for p in per))
        f = f[0]
    t = f.shape[0]
    if t > 8:
        # bound host cost on long clips with a CONTIGUOUS window: folding
        # merges adjacent frames, so adjacent deltas are the statistic —
        # a strided subsample would inflate r_t by the stride's extra drift
        f = f[t // 2 - 4:t // 2 + 4]
    k = 8
    h2, w2 = f.shape[1] // k * k, f.shape[2] // k * k
    p = f[:, :h2, :w2].reshape(
        f.shape[0], h2 // k, k, w2 // k, k, -1).mean((2, 4))
    std = float(p.std()) + 1e-6
    r_t = (float(_np.abs(_np.diff(p, axis=0)).mean()) / std
           if p.shape[0] > 1 else 0.0)
    r_s = float(_np.abs(_np.diff(p, axis=2)).mean()) / std
    return r_t, r_s


def select_merge_level(frames, *, allow_temporal: bool = True) -> str:
    """Pick a named MERGE_LEVELS key from the video's own redundancy.

    ``allow_temporal=False`` restricts to spatial levels (single images,
    or callers whose frame axis isn't foldable). Temporal candidates are
    additionally demoted to the deepest level whose chained g=2 folds
    divide the clip's frame count."""
    t = frames.shape[-4] if getattr(frames, "ndim", 0) >= 4 else 1

    def fold_ok(level):
        folds = len(MERGE_LEVELS[level].get("temporal_schedule", ()))
        return t >= 2 ** folds and t % (2 ** folds) == 0

    r_t, r_s = frame_redundancy(frames)
    if allow_temporal and t > 1:
        want = ("t_aggressive" if r_t < _AUTO_T_AGGRESSIVE else
                "t_medium" if r_t < _AUTO_T_MEDIUM else
                "t_mild" if r_t < _AUTO_T_MILD else "")
        if want:
            ladder = ("t_aggressive", "t_medium", "t_mild")
            for level in ladder[ladder.index(want):]:
                if fold_ok(level):
                    return level
    if r_s < _AUTO_SPATIAL:
        return "medium" if r_s < 0.95 else "mild"
    return "off"


def scale_level_to_depth(level: str, depth: int,
                         full_depth: int = 39) -> Dict[str, tuple]:
    """Map a named full-trunk merge level onto a reduced-depth trunk.

    The trained-equivalence proxies (script/int8_equivalence_trained.py)
    keep full matmul WIDTHS but fewer blocks; merge/fold block indices
    scale proportionally (rounded, min 1) while token counts stay — they
    are per-frame properties, independent of depth. A merge_schedule entry
    at block == full_depth (the post-trunk re-merge) maps to block ==
    depth exactly."""
    kw = dict(MERGE_LEVELS[level])
    out: Dict[str, tuple] = {}
    if "merge_schedule" in kw:
        out["merge_schedule"] = tuple(
            (max(1, round(b * depth / full_depth)), m)
            for b, m in kw["merge_schedule"])
    if "temporal_schedule" in kw:
        out["temporal_schedule"] = tuple(
            (max(1, round(b * depth / full_depth)), g, m)
            for b, g, m in kw["temporal_schedule"])
    return out


def level_kwargs(level: str, *, post_trunk: bool = True) -> Dict[str, tuple]:
    """ViTConfig field overrides for a named merge level ('off' -> {}).

    ``post_trunk=False`` drops the post-trunk spatial re-merge of the
    temporal levels — the BTAdapter parity config skips it because its
    branch output is full-res per-frame by construction (the branch taps
    unmerge through the origin map, models/btadapter.py)."""
    kw = dict(MERGE_LEVELS[level])
    if not post_trunk and "temporal_schedule" in kw:
        kw.pop("merge_schedule", None)
    return kw


def bipartite_merge(
    x: jax.Array,        # (B, N, D) tokens, CLS at index 0
    sizes: jax.Array,    # (B, N) fp32, #original tokens each row represents
    origin: jax.Array,   # (B, N0) int32, current index of each ORIGINAL token
    m: int,              # tokens to keep (N -> m)
    *,
    nb: int = 0,         # 0 = alternating A/B split; >0 = B is the FIRST nb
                         # tokens, A the rest (cross-frame mode after
                         # fold_frames: B = CLS + reference frame, A = later
                         # frames, so duplicates across frames are matchable)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One merge stage: N tokens -> m tokens (r = N - m merged away).

    Returns (x', sizes', origin') where x' is (B, m, D) with CLS still at
    index 0, and origin' maps every original token position to its current
    representative in x' (for unmerge: ``take_along_axis(x', origin')``).

    r is capped at the A-set size (alternating split => r <= floor(N/2);
    contiguous split => r <= N - nb); callers pick schedules that respect it.
    """
    b, n, d = x.shape
    r = n - m
    if nb:
        b_pos = _np.arange(nb)
        a_pos = _np.arange(nb, n)
    else:
        b_pos = _np.arange(0, n, 2)   # CLS lands in B at slot 0
        a_pos = _np.arange(1, n, 2)
        nb = len(b_pos)
    xa, xb = x[:, a_pos], x[:, b_pos]
    sa, sb = sizes[:, a_pos], sizes[:, b_pos]
    na = xa.shape[1]
    if r > na:
        raise ValueError(f"merge {n}->{m} removes {r} > A-set size {na}")

    # cosine similarity of every A token to every B token (fp32 matmul)
    xf = x.astype(jnp.float32)
    metric = xf / jnp.maximum(
        jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bad,bcd->bac", metric[:, a_pos], metric[:, b_pos])
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
        xf[:, a_pos], merge_src[..., None], axis=1)            # (B, r, D)
    dst = jnp.take_along_axis(best_dst, merge_src, axis=1)     # (B, r)
    onehot = jax.nn.one_hot(dst, nb, dtype=jnp.float32)        # (B, r, nB)
    add_x = jnp.einsum("brn,brd->bnd", onehot, xa_m * sa_m[..., None])
    add_s = jnp.einsum("brn,br->bn", onehot, sa_m)
    sb_new = sb + add_s
    xb_new = (xf[:, b_pos] * sb[..., None] + add_x) / sb_new[..., None]

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
    # stitch back into pre-merge positions: B ranks + A map
    new_of_old = jnp.zeros((b, n), jnp.int32)
    new_of_old = new_of_old.at[:, b_pos].set(
        jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32), (b, nb)))
    new_of_old = new_of_old.at[:, a_pos].set(a_new)
    origin_out = jnp.take_along_axis(new_of_old, origin, axis=1)
    return x_out, s_out, origin_out


def merge_to(
    x: jax.Array,
    sizes: jax.Array,
    origin: jax.Array,
    m: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Merge N -> m tokens in however many alternating-split stages the
    per-stage cap requires (each stage removes at most floor(N/2) tokens,
    i.e. merges to at least ceil(N/2)). Used for the post-trunk re-merge
    after a temporal unfold, where 257 -> 64..128 exceeds one stage's cap;
    in-trunk schedule entries stay single-stage by construction."""
    while x.shape[1] > m:
        n = x.shape[1]
        step = max(m, n - n // 2)
        x, sizes, origin = bipartite_merge(x, sizes, origin, step)
    return x, sizes, origin


def fold_frames(
    x: jax.Array,        # (R, N, D) per-frame token rows, CLS at index 0
    sizes: jax.Array,    # (R, N)
    origin: jax.Array,   # (R, W) current index of each original position
    g: int,              # adjacent frames per group (R must divide by g)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Temporal fold: concatenate groups of ``g`` adjacent frame rows into one
    "super-frame" row so a following :func:`bipartite_merge` can collapse
    CROSS-FRAME redundancy — the dominant redundancy in video (adjacent
    frames repeat most patches; reference FLOP source:
    stllm/models/eva_vit.py:416-428, 257 tokens/frame x 39 blocks).

    Layout of the folded row: ``[cls, frame0 patches, frame1 patches, ...]``
    where ``cls`` is the size-weighted mean of the g frame CLS tokens (they
    are near-duplicates for adjacent frames; the Q-Former interface gets each
    frame's CLS back through the origin map, shared within the group). All
    origin entries of the g old rows are remapped into the folded row, so a
    final :func:`unmerge` + reshape restores per-frame full resolution.

    Returns (x', sizes', origin') with shapes ((R/g, 1+g*(N-1), D),
    (R/g, 1+g*(N-1)), (R/g, g*W)). Rows must be frame-minor within one video
    (callers assert num_frames % g == 0 so groups never span videos).
    """
    r, n, d = x.shape
    w = origin.shape[1]
    if r % g:
        raise ValueError(f"{r} rows not divisible by group {g}")
    rg = r // g
    xf = x.astype(jnp.float32).reshape(rg, g, n, d)
    sz = sizes.reshape(rg, g, n)

    cls_s = sz[:, :, 0]                                    # (rg, g)
    cls_x = (xf[:, :, 0] * cls_s[..., None]).sum(axis=1) / (
        cls_s.sum(axis=1)[..., None])                      # (rg, d)
    patches = xf[:, :, 1:].reshape(rg, g * (n - 1), d)
    x_out = jnp.concatenate([cls_x[:, None].astype(x.dtype),
                             patches.astype(x.dtype)], axis=1)
    s_out = jnp.concatenate(
        [cls_s.sum(axis=1)[:, None], sz[:, :, 1:].reshape(rg, g * (n - 1))],
        axis=1)

    # origin remap: old row j's current index o -> 0 (shared CLS) if o == 0,
    # else 1 + j*(n-1) + (o-1)
    o = origin.reshape(rg, g, w)
    off = (jnp.arange(g, dtype=jnp.int32) * (n - 1)).reshape(1, g, 1)
    o_out = jnp.where(o == 0, 0, o + off).reshape(rg, g * w)
    return x_out, s_out, o_out


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
