"""Engine-level model I/O structs.

TPU-native equivalent of the reference's InputParameters / ModelInput /
ModelOutput (reference: src/models/parameters.h:11-56, src/engine/parameters.h).
All arrays are padded to static bucket shapes so each (T, S, MAXP) bucket
compiles exactly once (the TPU analog of CUDA-graph buckets,
reference: model_runner.h:18).

Shapes:
  T    — padded total new tokens this step (flattened across sequences)
  S    — padded number of sequences
  MAXP — padded max pages (KV blocks) per sequence
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class ModelInputs:
    # [T] new token ids (padding: 0)
    token_ids: jnp.ndarray
    # [T] position of each token within its sequence (padding: 0)
    positions: jnp.ndarray
    # [T] index of the owning sequence (padding: 0 — outputs are discarded)
    token_seg: jnp.ndarray
    # [T] global KV slot each new token writes to (padding: 0 = reserved block)
    new_kv_slot_ids: jnp.ndarray
    # [S, MAXP] block/page table per sequence (padding: 0)
    block_tables: jnp.ndarray
    # [S] total kv length per sequence incl. this step's tokens (padding: 0)
    kv_lens: jnp.ndarray
    # [S+1] cumulative q-chunk lengths over the flattened [T] dim; rows past
    # the real sequences repeat the last value
    cu_q_lens: jnp.ndarray
    # i32[1] dynamic number of real sequences
    num_seqs: jnp.ndarray
    # [S] index into [T] of each sequence's last token (logit selection)
    selected_idxes: jnp.ndarray
    # [S] 1.0 for real sequences, 0.0 for padding
    seq_mask: jnp.ndarray
    # [S] LoRA adapter slot per sequence (0 = base model). None when the
    # engine has no adapters loaded — None is an empty pytree subtree, so
    # every existing constructor/treedef stays valid.
    lora_ids: "jnp.ndarray | None" = None


@jax.tree_util.register_dataclass
@dataclass
class SamplingInputs:
    # [S]
    temperatures: jnp.ndarray
    top_ks: jnp.ndarray
    top_ps: jnp.ndarray
    frequency_penalties: jnp.ndarray
    presence_penalties: jnp.ndarray
    repetition_penalties: jnp.ndarray
    # [S, U] unique token ids seen per sequence + counts (padding id: 0 with
    # count 0) — the unique-token-counts trick from reference batch.cpp:144-195.
    unique_token_ids: jnp.ndarray
    unique_token_counts: jnp.ndarray
    # [S, B] additive logit bias entries (padding: id 0 with bias 0.0 —
    # a zero scatter-add is a no-op). B is 1 when no sequence uses bias.
    bias_token_ids: jnp.ndarray
    bias_values: jnp.ndarray
    # [S, W] packed allowed-token bitmask (guided decoding; token v →
    # word v>>5, bit v&31). W == 1 means "no constraint this step" — the
    # sampler skips the mask entirely (static shape check at trace time).
    # Unconstrained rows in a constrained batch are all-ones.
    allowed_mask: jnp.ndarray
    # [S] PRNG seed per sequence step
    seeds: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass
class ModelOutputs:
    # [S] sampled next token per sequence
    next_tokens: jnp.ndarray
    # [S] logprob of the sampled token (0 when logprobs off)
    logprobs: jnp.ndarray
    # [S, K] top-k alternative ids/logprobs (empty when top_logprobs off)
    top_ids: jnp.ndarray
    top_logprobs: jnp.ndarray
