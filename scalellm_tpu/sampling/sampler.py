"""Batched logits processing + token sampling, fully jittable.

TPU-native equivalent of the reference's LogitsProcessor + Sampler pipeline
(reference: src/engine/worker.cpp:156-187 driver-side sampling,
src/kernels/sampling/sampling_kernels.h:7-38, src/sampling/). Everything is
vectorized over the [S] sequence dim — per-sequence parameters arrive as
tensors (SamplingInputs) so one compiled program serves any mix of greedy and
random sequences.

Order of operations matches the reference's LogitsProcessor:
  frequency/presence penalties → repetition penalty → temperature →
  top-k → top-p → sample (greedy or categorical) → logprobs.

The unique-token-counts trick (reference: batch.cpp:144-195): penalties need
per-sequence token histograms; we pass [S, U] unique ids + counts padded
with id 0 / count 0, and scatter the penalty adjustments.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from scalellm_tpu.engine.params import ModelOutputs, SamplingInputs

# Plain python float: a module-level jnp constant would initialize the JAX
# backend at import time (and pin the constant to whatever device is default
# then — on this image, the axon TPU tunnel).
_NEG_INF = -1e30


def apply_frequency_presence_penalties(
    logits: jnp.ndarray,  # [S, V] f32
    unique_ids: jnp.ndarray,  # [S, U] int32 (pad id 0 with count 0)
    unique_counts: jnp.ndarray,  # [S, U] int32
    frequency_penalties: jnp.ndarray,  # [S]
    presence_penalties: jnp.ndarray,  # [S]
) -> jnp.ndarray:
    """logits[s, t] -= count[t]*freq_p[s] + (count[t]>0)*presence_p[s]
    (reference: sampling_kernels apply_frequency_presence_penalty)."""
    counts_f = unique_counts.astype(jnp.float32)
    present = (unique_counts > 0).astype(jnp.float32)
    adj = (
        counts_f * frequency_penalties[:, None]
        + present * presence_penalties[:, None]
    )  # [S, U]
    # Scatter-subtract per row. Padding entries have count 0 → adj 0.
    return jax.vmap(lambda l, ids, a: l.at[ids].add(-a, mode="drop"))(
        logits, unique_ids, adj
    )


def apply_repetition_penalty(
    logits: jnp.ndarray,  # [S, V] f32
    unique_ids: jnp.ndarray,  # [S, U]
    unique_counts: jnp.ndarray,  # [S, U]
    repetition_penalties: jnp.ndarray,  # [S]
) -> jnp.ndarray:
    """Divide positive logits / multiply negative logits of seen tokens by p
    (reference: sampling_kernels apply_repetition_penalty)."""

    V = logits.shape[-1]

    def one(l, ids, counts, p):
        vals = l[ids]  # [U]
        penalized = jnp.where(vals > 0, vals / p, vals * p)
        # Padding entries (count 0) share id 0; a duplicate-index scatter
        # would nondeterministically clobber token 0 — route them out of
        # range so mode="drop" discards the write.
        ids_eff = jnp.where(counts > 0, ids, V)
        return l.at[ids_eff].set(penalized, mode="drop")

    return jax.vmap(one)(logits, unique_ids, unique_counts, repetition_penalties)


def apply_logit_bias(
    logits: jnp.ndarray,  # [S, V] f32
    bias_ids: jnp.ndarray,  # [S, B] int32 (pad id 0 with bias 0)
    bias_values: jnp.ndarray,  # [S, B] f32
) -> jnp.ndarray:
    """Additive per-token bias (OpenAI logit_bias semantics). Padding
    entries add 0 to token 0 — a no-op, so no masking is needed."""
    return jax.vmap(lambda l, ids, b: l.at[ids].add(b, mode="drop"))(
        logits, bias_ids, bias_values
    )


def apply_allowed_mask(
    logits: jnp.ndarray,  # [S, V] f32
    allowed_mask: jnp.ndarray,  # [S, W] uint32 packed bits (token v: word
    # v>>5, bit v&31); all-ones rows are unconstrained
) -> jnp.ndarray:
    """Guided-decoding mask: tokens with a 0 bit get -inf (constrained/).

    The device-side unpack is a [S, V] gather from [S, W] plus a shift —
    trivially fused by XLA; no host-side [S, V] bool tensor ever exists.
    """
    V = logits.shape[-1]
    W = allowed_mask.shape[1]
    v = jnp.arange(V, dtype=jnp.int32)
    words = allowed_mask[:, jnp.minimum(v >> 5, W - 1)]  # [S, V] uint32
    bits = (words >> (v & 31).astype(jnp.uint32)) & jnp.uint32(1)
    # Model vocab may be padded beyond the tokenizer vocab (mask width):
    # ids past the mask are always banned.
    bits = jnp.where(v < W * 32, bits, 0)
    return jnp.where(bits == 1, logits, _NEG_INF)


def apply_temperature(logits: jnp.ndarray, temperatures: jnp.ndarray) -> jnp.ndarray:
    """Scale by 1/T; T==0 (greedy) is passed through unscaled — greedy argmax
    is temperature-invariant (reference: logits_processor temperature)."""
    t = jnp.where(temperatures <= 0.0, 1.0, temperatures)
    return logits / t[:, None]


def apply_top_k_top_p(
    logits: jnp.ndarray,  # [S, V] f32
    top_ks: jnp.ndarray,  # [S] int32, <=0 disables
    top_ps: jnp.ndarray,  # [S] f32, >=1 disables
) -> jnp.ndarray:
    """Mask logits outside top-k / top-p to -inf, jointly in one sorted pass
    (reference: src/kernels/sampling top_k/top_p kernels)."""
    S, V = logits.shape
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]

    # top-k: value threshold at rank k-1.
    k = jnp.where(top_ks <= 0, V, jnp.minimum(top_ks, V)).astype(jnp.int32)
    kth_value = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)

    # top-p: smallest prefix whose prob mass >= p; threshold value there.
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    include = (cum - probs_sorted) < top_ps[:, None]  # keep while mass before < p
    # Rank of the last included element per row.
    last_rank = jnp.max(jnp.where(include, ranks, 0), axis=-1, keepdims=True)
    pth_value = jnp.take_along_axis(sorted_logits, last_rank, axis=-1)

    thresh = jnp.maximum(kth_value, pth_value)  # [S, 1]
    return jnp.where(logits >= thresh, logits, _NEG_INF)


def sample(
    logits: jnp.ndarray,  # [S, V] processed logits (f32)
    do_sample: jnp.ndarray,  # [S] bool — random vs greedy
    seeds: jnp.ndarray,  # [S] uint32/int32 per-step seeds
) -> jnp.ndarray:
    """Greedy argmax or Gumbel-max categorical per sequence
    (reference: src/sampling/sampler.cpp greedy/random paths)."""
    greedy = jnp.argmax(logits, axis=-1)

    def gumbel_row(l, seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        g = jax.random.gumbel(key, l.shape, dtype=jnp.float32)
        return jnp.argmax(l + g, axis=-1)

    random = jax.vmap(gumbel_row)(logits, seeds.astype(jnp.uint32))
    return jnp.where(do_sample, random, greedy)


def process_logits(logits: jnp.ndarray, si: SamplingInputs) -> jnp.ndarray:
    """Full LogitsProcessor pipeline (reference order: worker.cpp:156-187)."""
    logits = logits.astype(jnp.float32)
    logits = jax.lax.cond(
        jnp.any(si.bias_values != 0.0),
        lambda l: apply_logit_bias(l, si.bias_token_ids, si.bias_values),
        lambda l: l,
        logits,
    )
    need_fp = jnp.any(si.frequency_penalties != 0.0) | jnp.any(
        si.presence_penalties != 0.0
    )
    logits = jax.lax.cond(
        need_fp,
        lambda l: apply_frequency_presence_penalties(
            l,
            si.unique_token_ids,
            si.unique_token_counts,
            si.frequency_penalties,
            si.presence_penalties,
        ),
        lambda l: l,
        logits,
    )
    logits = jax.lax.cond(
        jnp.any(si.repetition_penalties != 1.0),
        lambda l: apply_repetition_penalty(
            l, si.unique_token_ids, si.unique_token_counts, si.repetition_penalties
        ),
        lambda l: l,
        logits,
    )
    if si.allowed_mask.shape[1] > 1:  # static: retraced per mask width
        logits = apply_allowed_mask(logits, si.allowed_mask)
    logits = apply_temperature(logits, si.temperatures)
    need_filter = jnp.any(si.top_ks > 0) | jnp.any(si.top_ps < 1.0)
    logits = jax.lax.cond(
        need_filter,
        lambda l: apply_top_k_top_p(l, si.top_ks, si.top_ps),
        lambda l: l,
        logits,
    )
    return logits


def sample_tokens(
    logits: jnp.ndarray,  # [S, V] raw model logits
    si: SamplingInputs,
    max_top_logprobs: int = 0,
) -> ModelOutputs:
    """Process + sample + logprobs in one jittable call."""
    processed = process_logits(logits, si)
    do_sample = si.temperatures > 0.0
    next_tokens = sample(processed, do_sample, si.seeds)

    # Logprobs from the *processed* distribution (matches reference:
    # sampler computes logprobs post-processing, sampler.cpp).
    logprobs_all = jax.nn.log_softmax(processed, axis=-1)
    chosen_lp = jnp.take_along_axis(
        logprobs_all, next_tokens[:, None], axis=-1
    ).squeeze(-1)

    if max_top_logprobs > 0:
        top_lp, top_ids = jax.lax.top_k(logprobs_all, max_top_logprobs)
    else:
        S = logits.shape[0]
        top_lp = jnp.zeros((S, 0), dtype=jnp.float32)
        top_ids = jnp.zeros((S, 0), dtype=jnp.int32)

    return ModelOutputs(
        next_tokens=next_tokens.astype(jnp.int32),
        logprobs=chosen_lp,
        top_ids=top_ids.astype(jnp.int32),
        top_logprobs=top_lp,
    )
