"""Draft distillation for speculative decoding.

Trains a shallow same-width LLaMA tower (the draft) to match the target's
next-token ARGMAX on a prompt distribution — exactly the quantity greedy
speculative acceptance tests (models/speculative.py: a draft token is
accepted iff it equals the target argmax). Hard-label cross-entropy to the
teacher argmax is therefore the aligned objective; a soft-KL term at
temperature 1 is mixed in for gradient signal on near-ties.

The reference has no speculative path (HF generate loop,
reference: stllm/conversation/conversation.py:231-243); this utility plus
`speculative_generate` is the TPU-native serving upgrade: the draft's
decode steps stream ~1/16 of the target's weight bytes, and verification
rides the idle MXU dimension of the bandwidth-bound target step.

Training sequences must cover BOTH input paths generation exercises: the
prompt arrives as fused embeddings, but every generated token re-enters
through the model's OWN token-embedding table — a draft distilled on prompt
embeds alone never trains its embed_tokens and accepts ~nothing past the
first proposal. ``sample_batch`` therefore supplies (prompt_embeds,
continuation_token_ids); the natural continuation corpus is the target's
own greedy outputs on deployment prompts.

Usage:
    dft_params = init_llama(rng, dft_cfg)           # same hidden/vocab
    dft_params = distill_draft(tgt_params, dft_params, sample_batch,
                               tgt_cfg=cfg7b, dft_cfg=dft_cfg, steps=2000)
where ``sample_batch(i) -> (embeds (B,S,hidden), ids (B,S2) int32)``.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from stllm_tpu.models.llama import LlamaConfig, llama_forward, lm_head


def _next_token_logits(params, embeds, ids, cfg):
    """Logits over [embeds ; embed_tokens[ids]] — each model embeds the
    continuation ids with its OWN table, as generation does."""
    tok = params["embed_tokens"][ids].astype(cfg.dtype)
    full = jnp.concatenate([embeds.astype(cfg.dtype), tok], axis=1)
    hidden, _ = llama_forward(params, inputs_embeds=full, cfg=cfg)
    return lm_head(params, hidden)  # (B, S+S2, V) fp32


@functools.partial(jax.jit,
                   static_argnames=("tgt_cfg", "dft_cfg", "opt", "kl_mix"))
def _distill_step(tgt_params, dft_params, opt_state, embeds, ids, *,
                  tgt_cfg: LlamaConfig, dft_cfg: LlamaConfig, opt,
                  kl_mix: float = 0.1):
    t_logits = jax.lax.stop_gradient(
        _next_token_logits(tgt_params, embeds, ids, tgt_cfg))
    t_hard = jnp.argmax(t_logits, axis=-1)
    t_soft = jax.nn.log_softmax(t_logits, axis=-1)

    def loss_fn(p):
        s_logits = _next_token_logits(p, embeds, ids, dft_cfg)
        s_log = jax.nn.log_softmax(s_logits, axis=-1)
        ce = -jnp.take_along_axis(s_log, t_hard[..., None], axis=-1).mean()
        kl = (jnp.exp(t_soft) * (t_soft - s_log)).sum(-1).mean()
        acc = (jnp.argmax(s_logits, -1) == t_hard).mean()
        return ce + kl_mix * kl, acc

    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(dft_params)
    updates, opt_state = opt.update(grads, opt_state, dft_params)
    return optax.apply_updates(dft_params, updates), opt_state, loss, acc


def distill_draft(
    tgt_params: Dict,
    dft_params: Dict,
    sample_batch: Callable[[int], Tuple[jax.Array, jax.Array]],
    *,
    tgt_cfg: LlamaConfig,
    dft_cfg: LlamaConfig,
    steps: int = 1000,
    learning_rate: float = 3e-4,
    kl_mix: float = 0.1,
    log_every: int = 0,
) -> Dict:
    """Returns the distilled draft params. ``sample_batch(step)`` supplies
    (prompt embeds (B, S, hidden), continuation token ids (B, S2))."""
    assert dft_cfg.hidden == tgt_cfg.hidden
    opt = optax.adamw(learning_rate)
    opt_state = opt.init(dft_params)
    for it in range(steps):
        embeds, ids = sample_batch(it)
        dft_params, opt_state, loss, acc = _distill_step(
            tgt_params, dft_params, opt_state, embeds, ids,
            tgt_cfg=tgt_cfg, dft_cfg=dft_cfg, opt=opt, kl_mix=kl_mix)
        if log_every and (it + 1) % log_every == 0:
            print(f"distill step {it+1}: loss {float(loss):.4f} "
                  f"argmax-match {float(acc):.3f}", flush=True)
    return dft_params
