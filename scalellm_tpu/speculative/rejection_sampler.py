"""Batched rejection sampling for speculative decoding, fully jittable.

TPU-native equivalent of the reference's RejectionSampler
(reference: src/speculative/rejection_sampler.h:9-63, build_accepted_mask
at :35). Given k draft tokens + probs and the target model's k+1
distributions, produces per-sequence accepted tokens [S, k+1] padded with
-1 after the first rejection:

  - position i < r (first rejection): the accepted draft token
  - position r < k: a token resampled from normalize(max(p_target - p_draft, 0))
  - position k (all drafts accepted): a bonus token from the target's last
    distribution
  - greedy sequences (do_sample False) accept iff draft == argmax(target)

The scheduler/sequence layer consumes the -1-padded rows via
Sequence.validate_tokens (reference: sequence.cpp:92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10


def rejection_sample(
    draft_ids: jnp.ndarray,  # i32[S, k]
    draft_probs: jnp.ndarray,  # f32[S, k, V]
    target_probs: jnp.ndarray,  # f32[S, k+1, V]
    do_sample: jnp.ndarray,  # bool[S]
    seeds: jnp.ndarray,  # u32[S]
) -> jnp.ndarray:
    """Returns accepted token ids i32[S, k+1], -1 padded."""
    S, k = draft_ids.shape
    V = target_probs.shape[-1]

    p_tgt_k = target_probs[:, :k, :]  # [S, k, V]
    idx = draft_ids[..., None]
    p_t = jnp.take_along_axis(p_tgt_k, idx, axis=-1).squeeze(-1)  # [S, k]
    p_d = jnp.take_along_axis(draft_probs, idx, axis=-1).squeeze(-1)

    def key_for(s, tag):
        return jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(7), s), tag)

    keys = jax.vmap(lambda s: key_for(s, 0))(seeds)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(keys)  # [S, k]
    accept_random = u < (p_t / jnp.maximum(p_d, _EPS))
    accept_greedy = draft_ids == jnp.argmax(p_tgt_k, axis=-1)
    accepted = jnp.where(do_sample[:, None], accept_random, accept_greedy)  # [S, k]

    # Index of the first rejection; k when all accepted.
    acc_prefix = jnp.cumprod(accepted.astype(jnp.int32), axis=-1)  # [S, k]
    r = jnp.sum(acc_prefix, axis=-1)  # [S] in [0, k]

    # Recovery distribution at every draft position: max(p_t - p_d, 0).
    adjusted = jnp.maximum(p_tgt_k - draft_probs, 0.0)
    adjusted = adjusted / jnp.maximum(
        jnp.sum(adjusted, axis=-1, keepdims=True), _EPS
    )

    res_keys = jax.vmap(lambda s: key_for(s, 1))(seeds)

    def sample_rows(kk, probs, greedy_probs, sample_flag):
        # probs [k?, V] — gumbel-max per row; greedy = argmax of the TARGET
        # distribution (reference RejectionSampler::greedy_sample emits
        # argmax(p_target), NOT argmax of the residual — using the residual
        # would break spec-decode losslessness for do_sample=False).
        g = jax.random.gumbel(kk, probs.shape, dtype=jnp.float32)
        rand = jnp.argmax(jnp.log(jnp.maximum(probs, _EPS)) + g, axis=-1)
        greedy = jnp.argmax(greedy_probs, axis=-1)
        return jnp.where(sample_flag, rand, greedy)

    resampled = jax.vmap(sample_rows)(res_keys, adjusted, p_tgt_k, do_sample)  # [S, k]
    bonus_keys = jax.vmap(lambda s: key_for(s, 2))(seeds)
    bonus = jax.vmap(
        lambda kk, p, f: sample_rows(kk, p[None, :], p[None, :], f)[0]
    )(bonus_keys, target_probs[:, k, :], do_sample)  # [S]

    # Assemble [S, k+1]: draft ids where i < r; at i == r the replacement
    # (resampled if r < k else bonus); -1 beyond.
    pos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]  # [1, k+1]
    r_col = r[:, None]
    draft_padded = jnp.concatenate(
        [draft_ids, jnp.zeros((S, 1), draft_ids.dtype)], axis=-1
    )
    replacement = jnp.where(
        r < k,
        jnp.take_along_axis(
            resampled, jnp.minimum(r, k - 1)[:, None], axis=-1
        ).squeeze(-1),
        bonus,
    )  # [S]
    out = jnp.where(pos < r_col, draft_padded, -1)
    out = jnp.where(pos == r_col, replacement[:, None], out)
    return out.astype(jnp.int32)


def rejection_sample_onehot(
    draft_ids: jnp.ndarray,  # i32[S, k]
    target_probs: jnp.ndarray,  # f32[S, k+1, V]
    do_sample: jnp.ndarray,  # bool[S]
    seeds: jnp.ndarray,  # u32[S]
) -> jnp.ndarray:
    """rejection_sample for DETERMINISTIC proposals (prompt-lookup / n-gram
    speculation): the draft distribution is one-hot at draft_ids, so
    acceptance = u < p_target(token) and the recovery distribution is
    p_target with the proposed token zeroed — without ever materializing
    the [S, k, V] one-hot tensor."""
    S, k = draft_ids.shape

    p_tgt_k = target_probs[:, :k, :]  # [S, k, V]
    idx = draft_ids[..., None]
    p_t = jnp.take_along_axis(p_tgt_k, idx, axis=-1).squeeze(-1)  # [S, k]

    def key_for(s, tag):
        return jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(7), s), tag)

    keys = jax.vmap(lambda s: key_for(s, 0))(seeds)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (k,)))(keys)
    accept_random = u < p_t  # p_draft == 1 at the proposed token
    accept_greedy = draft_ids == jnp.argmax(p_tgt_k, axis=-1)
    accepted = jnp.where(do_sample[:, None], accept_random, accept_greedy)

    acc_prefix = jnp.cumprod(accepted.astype(jnp.int32), axis=-1)
    r = jnp.sum(acc_prefix, axis=-1)  # [S] in [0, k]

    # recovery: zero out the proposed token, renormalize
    zeroed = jnp.put_along_axis(
        p_tgt_k, idx, jnp.zeros_like(p_t)[..., None], axis=-1,
        inplace=False,
    )
    adjusted = zeroed / jnp.maximum(
        jnp.sum(zeroed, axis=-1, keepdims=True), _EPS
    )

    res_keys = jax.vmap(lambda s: key_for(s, 1))(seeds)

    def sample_rows(kk, probs, greedy_probs, sample_flag):
        g = jax.random.gumbel(kk, probs.shape, dtype=jnp.float32)
        rand = jnp.argmax(jnp.log(jnp.maximum(probs, _EPS)) + g, axis=-1)
        greedy = jnp.argmax(greedy_probs, axis=-1)
        return jnp.where(sample_flag, rand, greedy)

    resampled = jax.vmap(sample_rows)(res_keys, adjusted, p_tgt_k, do_sample)
    bonus_keys = jax.vmap(lambda s: key_for(s, 2))(seeds)
    bonus = jax.vmap(
        lambda kk, p, f: sample_rows(kk, p[None, :], p[None, :], f)[0]
    )(bonus_keys, target_probs[:, k, :], do_sample)

    pos = jnp.arange(k + 1, dtype=jnp.int32)[None, :]
    r_col = r[:, None]
    draft_padded = jnp.concatenate(
        [draft_ids, jnp.zeros((S, 1), draft_ids.dtype)], axis=-1
    )
    replacement = jnp.where(
        r < k,
        jnp.take_along_axis(
            resampled, jnp.minimum(r, k - 1)[:, None], axis=-1
        ).squeeze(-1),
        bonus,
    )
    out = jnp.where(pos < r_col, draft_padded, -1)
    out = jnp.where(pos == r_col, replacement[:, None], out)
    return out.astype(jnp.int32)
