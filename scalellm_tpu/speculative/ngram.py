"""Prompt-lookup (n-gram) speculative decoding — no draft model.

Capability extension beyond the reference engine (its speculative stack
always needs a second model, reference: speculative_engine.cpp:162): the
proposer copies the continuation of the most recent matching n-gram from
the sequence's own history (prompt + generated text), and a single fused
target pass verifies the k proposed tokens + samples the bonus/replacement
token. Wins on text with self-repetition (summarization, code edits, RAG
answers quoting context) at ZERO extra model memory; on a miss it costs
exactly one normal decode step's worth of progress (the verify pass still
yields one sampled token) plus the wasted verify FLOPs.

Acceptance uses the shared rejection sampler with a DETERMINISTIC proposal
distribution (one-hot): accept token t with prob p_target(t) (greedy:
iff t == argmax p_target — lossless), recovery distribution =
p_target with the proposed token zeroed.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import List, Optional, Tuple

import numpy as np

from scalellm_tpu.engine.batch import (
    Batch,
    PAGE_BUCKETS,
    SEQ_BUCKETS,
    pick_bucket,
)
from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
from scalellm_tpu.engine.params import ModelInputs, SamplingInputs
from scalellm_tpu.request.sequence import EngineType
from scalellm_tpu.utils.metrics import COUNTERS, HISTOGRAMS

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------- proposer


def propose_ngram(
    tokens: List[int], k: int, min_n: int = 2, max_n: int = 4
) -> Optional[List[int]]:
    """Propose k continuation tokens by prompt lookup.

    Finds the longest trailing n-gram (max_n down to min_n) that occurred
    earlier in `tokens` and returns the k tokens that followed its most
    recent earlier occurrence (padded by repeating the final token when the
    match sits near the end). None when no n-gram recurs.
    """
    L = len(tokens)
    if L < min_n + 1:
        return None
    t = np.asarray(tokens, dtype=np.int32)
    for n in range(min(max_n, L - 1), min_n - 1, -1):
        pattern = t[L - n:]
        # candidate start positions for an EARLIER occurrence (the trailing
        # occurrence itself starts at L-n; exclude it)
        windows = np.lib.stride_tricks.sliding_window_view(t[: L - 1], n)
        hits = np.nonzero((windows == pattern).all(axis=1))[0]
        # drop the trailing occurrence if the window view included it
        hits = hits[hits < L - n]
        if hits.size == 0:
            continue
        start = int(hits[-1]) + n  # continuation of the most recent match
        cont = t[start : start + k]
        if cont.size == 0:
            continue
        out = cont.tolist()
        while len(out) < k:
            out.append(out[-1])
        return out
    return None


# ---------------------------------------------------------------- executor


class NgramSpecExecutor:
    """Fused target-verify + rejection program for host-proposed tokens."""

    def __init__(self, target_executor, k: int, mesh=None):
        self.target = target_executor
        self.k = k
        self.mesh = mesh

    @functools.cached_property
    def _verify_fn(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        k = self.k
        t_model = self.target.model
        from scalellm_tpu.sampling.sampler import process_logits
        from scalellm_tpu.speculative.rejection_sampler import (
            rejection_sample_onehot,
        )

        def verify_fn(t_params, t_kv, first_tokens, positions0, d_ids,
                      slot_ids, block_tables, seq_mask, num_seqs,
                      do_sample, seeds, si: SamplingInputs):
            S = first_tokens.shape[0]
            seg = jnp.arange(S, dtype=jnp.int32)
            cu1 = jnp.arange(S + 1, dtype=jnp.int32)
            tok = jnp.concatenate([first_tokens[:, None], d_ids], axis=1)
            positions = positions0[:, None] + jnp.arange(k + 1, dtype=jnp.int32)
            mi = ModelInputs(
                token_ids=tok.reshape(-1),
                positions=positions.reshape(-1),
                token_seg=jnp.repeat(seg, k + 1),
                new_kv_slot_ids=slot_ids.reshape(-1),
                block_tables=block_tables,
                kv_lens=(positions0 + k + 1) * (seq_mask > 0).astype(jnp.int32),
                cu_q_lens=cu1 * (k + 1),
                num_seqs=num_seqs,
                selected_idxes=jnp.arange(S * (k + 1), dtype=jnp.int32),
                seq_mask=seq_mask,
            )
            hidden, t_kv = t_model.forward(t_params, t_kv, mi)
            logits = t_model.logits(t_params, hidden)  # [S*(k+1), V]
            si_rep = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, k + 1, axis=0), si
            )
            V = logits.shape[-1]
            t_probs = jax.nn.softmax(
                process_logits(logits, si_rep).reshape(S, k + 1, V), axis=-1
            )
            accepted = rejection_sample_onehot(
                d_ids, t_probs, do_sample, seeds
            )
            return accepted, t_kv

        if self.mesh is None:
            return jax.jit(verify_fn, donate_argnums=(1,))

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        rep = P()
        si_specs = jax.tree_util.tree_map(lambda _: rep, SamplingInputs(
            temperatures=0, top_ks=0, top_ps=0, frequency_penalties=0,
            presence_penalties=0, repetition_penalties=0, unique_token_ids=0,
            unique_token_counts=0, bias_token_ids=0, bias_values=0,
            allowed_mask=0, seeds=0,
        ))
        sharded = shard_map(
            verify_fn,
            mesh=self.mesh,
            in_specs=(
                t_model.param_partition_specs(),
                t_model.kv_cache_partition_spec(),
                rep, rep, rep, rep, rep, rep, rep, rep, rep, si_specs,
            ),
            out_specs=(rep, t_model.kv_cache_partition_spec()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def execute(self, first_tokens, positions0, d_ids, slot_ids,
                block_tables, seq_mask, num_seqs, do_sample, seeds,
                si) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        args = [
            jnp.asarray(x)
            for x in (first_tokens, positions0, d_ids, slot_ids,
                      block_tables, seq_mask, num_seqs, do_sample, seeds)
        ]
        si_dev = jax.tree_util.tree_map(jnp.asarray, si)
        accepted, t_kv = self._verify_fn(
            self.target.params, self.target.kv_cache, *args, si_dev
        )
        self.target.kv_cache = t_kv
        return np.asarray(accepted)


# ------------------------------------------------------------------ engine


class NgramSpeculativeEngine:
    """Scheduler-facing engine: prompt-lookup proposals verified by the
    target in one fused pass. Drop-in where LLMEngine goes (same surface);
    selected by num_speculative_tokens > 0 with no draft_model_path."""

    def __init__(self, options: EngineOptions, mesh=None,
                 min_ngram: int = 2, max_ngram: int = 4):
        assert options.num_speculative_tokens > 0
        self.options = options
        self.k = options.num_speculative_tokens
        self.min_ngram = min_ngram
        self.max_ngram = max_ngram
        self.target = LLMEngine(options, mesh=mesh)
        self.spec_executor = NgramSpecExecutor(
            self.target.executor, self.k, mesh=mesh
        )
        self.tokenizer = self.target.tokenizer
        self.model_args = self.target.model_args
        self.block_manager = self.target.block_manager
        self._step_counter = 0

    def execute_model(self, batch: Batch) -> None:
        if not batch.entries:
            return
        self._step_counter += 1
        seqs = [e.seq for e in batch.entries]
        is_decode = all(
            e.num_tokens == 1
            and e.seq.num_kv_cache_tokens(EngineType.LLM) > 0
            for e in batch.entries
        )
        proposals = None
        if is_decode:
            proposals = [
                propose_ngram(
                    seq.token_ids, self.k, self.min_ngram, self.max_ngram
                )
                for seq in seqs
            ]
            if not any(p is not None for p in proposals):
                proposals = None  # nothing to verify: plain step is cheaper
        if proposals is None:
            self.target.execute_model(batch)
            return
        self._execute_speculative(seqs, proposals)

    def _execute_speculative(self, seqs, proposals) -> None:
        k = self.k
        S_real = len(seqs)
        S = pick_bucket(SEQ_BUCKETS, S_real)
        maxp_real = max(len(seq.blocks) for seq in seqs)
        MAXP = pick_bucket(PAGE_BUCKETS, maxp_real)

        first_tokens = np.zeros(S, np.int32)
        positions0 = np.zeros(S, np.int32)
        d_ids = np.zeros((S, k), np.int32)
        slot_ids = np.zeros((S, k + 1), np.int32)
        block_tables = np.zeros((S, MAXP), np.int32)
        seq_mask = np.zeros(S, np.float32)
        do_sample = np.zeros(S, bool)
        seeds = np.zeros(S, np.uint32)
        temperatures = np.zeros(S, np.float32)
        top_ks = np.zeros(S, np.int32)
        top_ps = np.ones(S, np.float32)
        n_proposed = 0
        for s, seq in enumerate(seqs):
            n = seq.num_tokens
            first_tokens[s] = seq.token_ids[n - 1]
            positions0[s] = n - 1
            slot_ids[s] = seq.kv_cache_slots(n - 1, n + k)
            bids = seq.block_ids()
            block_tables[s, : len(bids)] = bids
            seq_mask[s] = 1.0
            prop = proposals[s]
            if prop is None:
                # harmless filler: gets rejected at position 0 unless the
                # model actually wants to repeat the last token
                prop = [first_tokens[s]] * k
            else:
                n_proposed += k
            d_ids[s] = prop
            sp = seq.sampling_params
            do_sample[s] = sp.temperature > 0
            base_seed = sp.seed if sp.seed is not None else seq.seq_id
            seeds[s] = np.uint32(
                (base_seed * 1000003 + self._step_counter) & 0xFFFFFFFF
            )
            temperatures[s] = sp.temperature
            top_ks[s] = sp.top_k if sp.top_k > 0 else 0
            top_ps[s] = sp.top_p
        si = SamplingInputs(
            temperatures=temperatures,
            top_ks=top_ks,
            top_ps=top_ps,
            frequency_penalties=np.zeros(S, np.float32),
            presence_penalties=np.zeros(S, np.float32),
            repetition_penalties=np.ones(S, np.float32),
            unique_token_ids=np.zeros((S, 1), np.int32),
            unique_token_counts=np.zeros((S, 1), np.int32),
            bias_token_ids=np.zeros((S, 1), np.int32),
            bias_values=np.zeros((S, 1), np.float32),
            allowed_mask=np.full((S, 1), 0xFFFFFFFF, np.uint32),
            seeds=seeds,
        )
        t0 = time.monotonic()
        accepted = self.spec_executor.execute(
            first_tokens, positions0, d_ids, slot_ids, block_tables,
            seq_mask, np.array([S_real], np.int32), do_sample, seeds, si,
        )
        HISTOGRAMS.observe(
            "target_execution_latency_seconds", time.monotonic() - t0
        )
        num_accepted = 0
        for s, seq in enumerate(seqs):
            for i in range(k):
                seq.append_token(int(d_ids[s, i]))
            seq.commit_kv_cache(k + 1, EngineType.LLM)
            num_accepted += seq.validate_tokens(accepted[s].tolist())
        COUNTERS.inc("num_accepted_tokens_total", num_accepted)
        COUNTERS.inc("num_draft_tokens_total", n_proposed)
