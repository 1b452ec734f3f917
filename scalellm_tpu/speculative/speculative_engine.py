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
from typing import List

import numpy as np

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
from scalellm_tpu.model_loader.loader import HFModelLoader
from scalellm_tpu.ops.attention import kernel_head_dim
from scalellm_tpu.request.sequence import EngineType
from scalellm_tpu.speculative.rejection_sampler import rejection_sample
from scalellm_tpu.utils.metrics import COUNTERS, HISTOGRAMS

logger = logging.getLogger(__name__)


def _slot_bytes(model_args) -> int:
    dtype_size = {"bfloat16": 2, "float16": 2, "float32": 4}[model_args.dtype]
    head_dim = kernel_head_dim(model_args.head_dim)
    return 2 * model_args.n_layers * model_args.n_kv_heads * head_dim * dtype_size


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
        draft = LLMEngine(
            draft_options, mesh=None, shared_block_manager=target.block_manager
        )
        self.target = target
        self.draft = draft
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
        k = self.k
        S = len(seqs)

        # ---- k draft runs (reference: speculative_engine.cpp:166-171)
        t0 = time.monotonic()
        draft_ids: List[np.ndarray] = []
        draft_probs: List[np.ndarray] = []
        for i in range(k):
            b = Batch()
            for seq in seqs:
                seq.engine_type = EngineType.SSM
                uncached = seq.num_tokens - seq.num_kv_cache_tokens(EngineType.SSM)
                b.add(seq, uncached)
            mi, si, _ = b.prepare_model_inputs(
                self.options.block_size, self._step_counter * 131 + i
            )
            outs, probs = self.draft.executor.execute_with_probs(mi, si)
            next_tokens = np.asarray(outs.next_tokens)
            probs_np = np.asarray(probs)
            draft_ids.append(next_tokens[:S])
            draft_probs.append(probs_np[:S])
            # Append draft tokens + commit draft KV.
            for s, e in enumerate(b.entries):
                e.seq.commit_kv_cache(e.num_tokens, EngineType.SSM)
                e.seq.append_token(int(next_tokens[s]))
        HISTOGRAMS.observe("draft_execution_latency_seconds", time.monotonic() - t0)

        # ---- one target pass over the k+1 tail positions
        t0 = time.monotonic()
        tb = Batch()
        for seq in seqs:
            seq.engine_type = EngineType.LLM
            uncached = seq.num_tokens - seq.num_kv_cache_tokens(EngineType.LLM)
            assert uncached == k + 1, (uncached, k)
            tb.add(seq, uncached)
        mi, si, _ = tb.prepare_model_inputs(
            self.options.block_size, self._step_counter, selected_per_seq=k + 1
        )
        S_pad = mi.kv_lens.shape[0]
        logits = np.asarray(
            self.target.executor.forward_logits(mi, si, k + 1)
        )  # [S_pad*(k+1), V]
        V = logits.shape[-1]
        target_logits = logits.reshape(S_pad, k + 1, V)[:S]
        HISTOGRAMS.observe("target_execution_latency_seconds", time.monotonic() - t0)

        # ---- rejection sampling (reference: rejection_sampler.h:9)
        t0 = time.monotonic()
        d_ids = np.stack(draft_ids, axis=1)  # [S, k]
        d_probs = np.stack(draft_probs, axis=1)  # [S, k, V]
        t_probs = _softmax(target_logits)  # [S, k+1, V]
        do_sample = np.asarray(
            [seq.sampling_params.temperature > 0 for seq in seqs], dtype=bool
        )
        seeds = np.asarray(
            [(seq.seq_id * 1000003 + self._step_counter) & 0xFFFFFFFF for seq in seqs],
            dtype=np.uint32,
        )
        accepted = np.asarray(
            rejection_sample(d_ids, d_probs, t_probs, do_sample, seeds)
        )  # [S, k+1]

        # ---- write back (reference: batch.cpp:304 process_validate_output)
        num_accepted = 0
        for s, e in enumerate(tb.entries):
            e.seq.commit_kv_cache(e.num_tokens, EngineType.LLM)
            num_accepted += e.seq.validate_tokens(accepted[s].tolist())
        COUNTERS.inc("num_accepted_tokens_total", num_accepted)
        COUNTERS.inc("num_draft_tokens_total", S * k)
        HISTOGRAMS.observe("validation_latency_seconds", time.monotonic() - t0)


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)
