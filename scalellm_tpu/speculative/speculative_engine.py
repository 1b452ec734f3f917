"""SpeculativeEngine — draft/target speculative decoding.

TPU-native equivalent of the reference's SpeculativeEngine
(reference: src/speculative/speculative_engine.{h,cpp}): composes a target
LLMEngine and a draft LLMEngine sharing one BlockManager (slot ids map 1:1
across both paged KV caches), runs the draft k times per step, scores the
k+1 candidate positions with the target in one pass, and rejection-samples.

Design deltas vs the reference (cleaner on TPU's static-shape model):
  - Batches containing prefill chunks run non-speculatively — the draft
    engine processes the same tokens purely to materialize its KV (the
    reference instead drafts through prefill and skips validation,
    speculative_engine.cpp:188-193). The per-engine KV counters on Sequence
    (sequence.h:118-125 analog) make the draft catch up automatically.
  - Pure-decode batches take the full speculative path with a jitted
    rejection sampler.
"""

from __future__ import annotations

import logging
import time

import numpy as np

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
from scalellm_tpu.model_loader.loader import HFModelLoader
from scalellm_tpu.ops.attention import kv_layout
from scalellm_tpu.request.sequence import EngineType
from scalellm_tpu.utils.metrics import COUNTERS, HISTOGRAMS

logger = logging.getLogger(__name__)


def _slot_bytes(model_args) -> int:
    dtype_size = {"bfloat16": 2, "float16": 2, "float32": 4}[model_args.dtype]
    n_heads, head_dim, _ = kv_layout(model_args.n_kv_heads, model_args.head_dim)
    return 2 * model_args.n_layers * n_heads * head_dim * dtype_size


class SpeculativeEngine:
    def __init__(self, options: EngineOptions, mesh=None):
        assert options.draft_model_path, "draft_model_path required"
        assert options.num_speculative_tokens > 0
        self.options = options
        self.k = options.num_speculative_tokens

        draft_args = HFModelLoader(options.draft_model_path).model_args
        target = LLMEngine(
            options, mesh=mesh, extra_kv_slot_bytes=_slot_bytes(draft_args)
        )
        # Vocab compatibility check (reference: speculative_engine.cpp:85-131).
        if draft_args.vocab_size != target.model_args.vocab_size:
            raise ValueError(
                f"draft vocab {draft_args.vocab_size} != target vocab "
                f"{target.model_args.vocab_size}"
            )
        draft_options = EngineOptions(
            model_path=options.draft_model_path,
            block_size=options.block_size,
            enable_prefix_cache=options.enable_prefix_cache,
            warmup=False,
        )
        # The draft shares the mesh: the fused speculative program runs both
        # models inside ONE shard_map (reference runs its TP engine under
        # SpeculativeEngine too, speculative_engine.cpp:162).
        draft = LLMEngine(
            draft_options, mesh=mesh, shared_block_manager=target.block_manager
        )
        self.target = target
        self.draft = draft
        from scalellm_tpu.speculative.spec_executor import SpecExecutor

        self.spec_executor = SpecExecutor(
            target.executor, draft.executor, self.k, mesh=mesh
        )
        # Scheduler-facing surface (matches LLMEngine).
        self.tokenizer = target.tokenizer
        self.model_args = target.model_args
        self.block_manager = target.block_manager
        self._step_counter = 0

    # ------------------------------------------------------------------ step

    def execute_model(self, batch: Batch) -> None:
        """(reference: speculative_engine.cpp:162 execute_model)"""
        if not batch.entries:
            return
        self._step_counter += 1
        seqs = [e.seq for e in batch.entries]
        is_decode = all(
            e.num_tokens == 1 and e.seq.num_kv_cache_tokens(EngineType.LLM) > 0
            for e in batch.entries
        )
        if not is_decode:
            # Mixed/prefill step: build draft KV silently, then run the
            # target step normally (samples as usual).
            t0 = time.monotonic()
            self._run_engine_plain(self.draft, seqs, EngineType.SSM, sample=False)
            HISTOGRAMS.observe("draft_execution_latency_seconds", time.monotonic() - t0)
            t0 = time.monotonic()
            for seq in seqs:
                seq.engine_type = EngineType.LLM
            self.target.execute_model(batch)
            HISTOGRAMS.observe("target_execution_latency_seconds", time.monotonic() - t0)
            return

        self._execute_speculative(batch, seqs)

    def _run_engine_plain(self, engine, seqs, engine_type, sample: bool) -> None:
        """Process each sequence's uncached tokens on `engine` without
        appending any generated token (KV build only)."""
        b = Batch()
        for seq in seqs:
            seq.engine_type = engine_type
            uncached = seq.num_tokens - seq.num_kv_cache_tokens(engine_type)
            if uncached <= 0:
                continue
            b.add(seq, uncached)
            b.entries[-1].needs_sample = False
        if not b.entries:
            return
        engine.execute_model(b)

    def _execute_speculative(self, batch: Batch, seqs) -> None:
        """One fused speculative round: k draft steps + target verify +
        rejection sampling, all inside a single jitted device program
        (spec_executor.py; reference host loop: speculative_engine.cpp:162).
        """
        k = self.k

        # Irregular target state (e.g. resumed after preemption mid-round):
        # run a plain non-speculative step instead of hard-failing.
        if any(
            seq.num_tokens - seq.num_kv_cache_tokens(EngineType.LLM) != 1
            for seq in seqs
        ):
            logger.debug("irregular KV lag; falling back to non-spec step")
            for seq in seqs:
                seq.engine_type = EngineType.LLM
            self.target.execute_model(batch)
            return
        # Draft KV catch-up: the fused round assumes the draft lags by
        # exactly one token (the last sampled token, which the round's first
        # scan step processes).
        if any(
            seq.num_tokens - 1 - seq.num_kv_cache_tokens(EngineType.SSM) > 0
            for seq in seqs
        ):
            b = Batch()
            for seq in seqs:
                seq.engine_type = EngineType.SSM
                lag = seq.num_tokens - 1 - seq.num_kv_cache_tokens(EngineType.SSM)
                if lag > 0:
                    b.add(seq, lag)
                    b.entries[-1].needs_sample = False
            if b.entries:
                self.draft.execute_model(b)

        # ---- host-side input prep (small arrays; padded to buckets)
        from scalellm_tpu.engine.batch import (
            PAGE_BUCKETS, SEQ_BUCKETS, pick_bucket,
        )
        from scalellm_tpu.speculative.spec_executor import SpecInputs
        from scalellm_tpu.engine.params import SamplingInputs

        S_real = len(seqs)
        S = pick_bucket(SEQ_BUCKETS, S_real)
        maxp_real = max(len(seq.blocks) for seq in seqs)
        MAXP = pick_bucket(PAGE_BUCKETS, maxp_real)

        first_tokens = np.zeros(S, np.int32)
        positions0 = np.zeros(S, np.int32)
        slot_ids = np.zeros((S, k + 1), np.int32)
        block_tables = np.zeros((S, MAXP), np.int32)
        seq_mask = np.zeros(S, np.float32)
        do_sample = np.zeros(S, bool)
        seeds = np.zeros(S, np.uint32)
        temperatures = np.zeros(S, np.float32)
        top_ks = np.zeros(S, np.int32)
        top_ps = np.ones(S, np.float32)
        for s, seq in enumerate(seqs):
            n = seq.num_tokens
            first_tokens[s] = seq.token_ids[n - 1]
            positions0[s] = n - 1
            slot_ids[s] = seq.kv_cache_slots(n - 1, n + k)
            bids = seq.block_ids()
            block_tables[s, : len(bids)] = bids
            seq_mask[s] = 1.0
            sp = seq.sampling_params
            do_sample[s] = sp.temperature > 0
            base_seed = sp.seed if sp.seed is not None else seq.seq_id
            seeds[s] = np.uint32(
                (base_seed * 1000003 + self._step_counter) & 0xFFFFFFFF
            )
            temperatures[s] = sp.temperature
            top_ks[s] = sp.top_k if sp.top_k > 0 else 0
            top_ps[s] = sp.top_p
        inp = SpecInputs(
            first_tokens=first_tokens,
            positions0=positions0,
            slot_ids=slot_ids,
            block_tables=block_tables,
            seq_mask=seq_mask,
            num_seqs=np.array([S_real], np.int32),
            do_sample=do_sample,
            seeds=seeds,
        )
        # Penalties intentionally omitted from the in-round distributions
        # (the reference's speculative path also applies penalties only at
        # the per-step LogitsProcessor granularity; histograms can't update
        # mid-round on device).
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
        accepted, draft_ids = self.spec_executor.execute(inp, si)
        HISTOGRAMS.observe("target_execution_latency_seconds", time.monotonic() - t0)

        # ---- write back (reference: batch.cpp:304 process_validate_output)
        num_accepted = 0
        for s, seq in enumerate(seqs):
            for i in range(k):
                seq.append_token(int(draft_ids[s, i]))
            seq.commit_kv_cache(k, EngineType.SSM)
            seq.commit_kv_cache(k + 1, EngineType.LLM)
            num_accepted += seq.validate_tokens(accepted[s].tolist())
            # The scheduler computes uncached counts against the CURRENT
            # engine type; leave sequences accounted under the target.
            seq.engine_type = EngineType.LLM
        COUNTERS.inc("num_accepted_tokens_total", num_accepted)
        COUNTERS.inc("num_draft_tokens_total", S_real * k)
