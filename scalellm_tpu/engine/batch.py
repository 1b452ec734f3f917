"""Batch — converts scheduled Sequences + token budgets into padded,
static-shape model inputs, and writes sampled tokens back.

TPU-native equivalent of the reference's Batch
(reference: src/engine/batch.{h,cpp}: prepare_model_input at batch.cpp:77,
process_sample_output at :272, CUDA-graph padding at :220-240). On TPU the
padding is stricter: XLA compiles one program per (T, S, MAXP) bucket, so all
arrays are padded up to bucket shapes (the analog of CUDA-graph buckets,
reference: llm_engine.cpp:23).

Padding conventions (see engine/params.py):
  - token slots beyond the real tokens: ids/positions/seg 0, kv slot 0
    (page 0 is the reserved padding block, block_manager.cpp:40-42)
  - sequence slots beyond real sequences: kv_len 0, block table all-0,
    selected idx 0, seq_mask 0
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import List, Optional, Sequence as Seq, Tuple

import numpy as np

from scalellm_tpu.engine.params import ModelInputs, SamplingInputs
from scalellm_tpu.request.output import LogProb, LogProbData
from scalellm_tpu.request.sequence import Sequence

# Bucket ladders. Token buckets are the analog of the reference's CUDA-graph
# batch-size buckets {1,2,4,8,16,24,32,48,64} (llm_engine.cpp:23), sized for
# token counts since prefill and decode share one program here.
TOKEN_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]
SEQ_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128, 256]
# Pages ladder is deliberately COARSE (4x steps): each distinct
# (T, S, MAXP) is one XLA compile, and MAXP only sizes the block-table
# index array (the kernel reads pages up to kv_len, not MAXP), so padding
# generously costs bytes, not FLOPs — fewer buckets beats tighter padding.
PAGE_BUCKETS = [4, 16, 64, 256, 1024, 4096, 16384]


def pick_bucket(ladder: Seq[int], n: int) -> int:
    i = bisect.bisect_left(ladder, n)
    if i == len(ladder):
        raise ValueError(f"{n} exceeds largest bucket {ladder[-1]}")
    return ladder[i]


@dataclass
class BatchEntry:
    seq: Sequence
    # Number of new tokens to process for this sequence this step
    # (chunked prefill: may be < uncached tokens).
    num_tokens: int
    # Whether this step produces a sampled token for the sequence
    # (false for a prefill chunk that doesn't reach the end).
    needs_sample: bool


@dataclass
class Batch:
    """One scheduler step's worth of sequences."""

    entries: List[BatchEntry] = field(default_factory=list)

    def add(self, seq: Sequence, num_tokens: int) -> None:
        cached = seq.num_kv_cache_tokens()
        assert num_tokens > 0
        assert cached + num_tokens <= seq.num_tokens
        self.entries.append(
            BatchEntry(
                seq=seq,
                num_tokens=num_tokens,
                needs_sample=(cached + num_tokens == seq.num_tokens),
            )
        )

    def __len__(self) -> int:
        return len(self.entries)

    @property
    def is_decode_only(self) -> bool:
        """Every sequence contributes exactly one query token — the hot
        serving case; routes to the decode-specialized attention program."""
        return bool(self.entries) and all(
            e.num_tokens == 1 for e in self.entries
        )

    @property
    def num_tokens(self) -> int:
        return sum(e.num_tokens for e in self.entries)

    # ------------------------------------------------------------- inputs

    def prepare_model_inputs(
        self,
        block_size: int,
        step_counter: int = 0,
        selected_per_seq: int = 1,
    ) -> Tuple[ModelInputs, SamplingInputs, np.ndarray]:
        """Flatten the batch into padded arrays (reference: batch.cpp:77).

        selected_per_seq > 1 selects the last r token positions of every
        sequence (speculative validation needs logits at k+1 positions,
        reference: speculative_engine.cpp:187 view({B, k+1, V})).

        Returns (model_inputs, sampling_inputs, needs_sample_mask[S] bool).
        Arrays are numpy; the executor device_puts them.
        """
        S_real = len(self.entries)
        T_real = self.num_tokens
        T = pick_bucket(TOKEN_BUCKETS, max(T_real, 1))
        S = pick_bucket(SEQ_BUCKETS, max(S_real, 1))
        max_pages_real = max(
            (len(e.seq.blocks) for e in self.entries), default=1
        )
        MAXP = pick_bucket(PAGE_BUCKETS, max(max_pages_real, 1))

        token_ids = np.zeros(T, dtype=np.int32)
        positions = np.zeros(T, dtype=np.int32)
        token_seg = np.zeros(T, dtype=np.int32)
        new_kv_slot_ids = np.zeros(T, dtype=np.int32)
        block_tables = np.zeros((S, MAXP), dtype=np.int32)
        kv_lens = np.zeros(S, dtype=np.int32)
        cu_q_lens = np.zeros(S + 1, dtype=np.int32)
        r = selected_per_seq
        selected_idxes = np.zeros(S * r, dtype=np.int32)
        seq_mask = np.zeros(S, dtype=np.float32)
        needs_sample = np.zeros(S, dtype=bool)
        # per-seq LoRA slots; attached to mi by the engine when adapters
        # are loaded (treedef must stay stable per deployment)
        self._lora_slots = np.zeros(S, dtype=np.int32)

        # Sampling params per sequence.
        temperatures = np.zeros(S, dtype=np.float32)
        top_ks = np.zeros(S, dtype=np.int32)
        top_ps = np.ones(S, dtype=np.float32)
        freq_p = np.zeros(S, dtype=np.float32)
        pres_p = np.zeros(S, dtype=np.float32)
        rep_p = np.ones(S, dtype=np.float32)
        seeds = np.zeros(S, dtype=np.uint32)

        # Unique-token histograms (reference: batch.cpp:144-195). Only built
        # when some sequence actually uses a penalty.
        use_penalties = any(
            e.seq.sampling_params.frequency_penalty != 0.0
            or e.seq.sampling_params.presence_penalty != 0.0
            or e.seq.sampling_params.repetition_penalty != 1.0
            for e in self.entries
        )
        U = 0
        if use_penalties:
            U = max(len(e.seq.token_counts) for e in self.entries)
            U = max(8, 1 << (U - 1).bit_length())  # pad to pow2 bucket
        unique_ids = np.zeros((S, max(U, 1)), dtype=np.int32)
        unique_counts = np.zeros((S, max(U, 1)), dtype=np.int32)

        # Logit bias entries (same padded-scatter pattern as the histograms).
        B = 0
        if any(e.seq.sampling_params.logit_bias for e in self.entries):
            B = max(
                len(e.seq.sampling_params.logit_bias or ())
                for e in self.entries
            )
            B = max(8, 1 << (B - 1).bit_length())
        bias_ids = np.zeros((S, max(B, 1)), dtype=np.int32)
        bias_vals = np.zeros((S, max(B, 1)), dtype=np.float32)

        # Guided-decoding masks: W = packed words (ceil(V/32)) when any
        # sequence is constrained this step, else 1 (sampler skips).
        # Unconstrained rows (incl. padding rows) are all-ones.
        W = 1
        guided_entries = [
            (s, e.seq.guided)
            for s, e in enumerate(self.entries)
            if e.seq.guided is not None and not e.seq.guided.finished
        ]
        if guided_entries:
            W = guided_entries[0][1].fsm.n_words
        allowed_mask = np.full((S, W), 0xFFFFFFFF, dtype=np.uint32)
        for s, g in guided_entries:
            row = g.mask()
            if row is not None:
                allowed_mask[s] = row

        # Prompt-logprob scoring (SamplingParams.prompt_logprobs): targets[t]
        # is the NEXT prompt token for prefill position t; stays 0 (ignored)
        # elsewhere. Only set while a requesting sequence still has prompt
        # tokens entering the batch, so decode-only steps skip the scoring
        # program entirely.
        self._score_targets = np.zeros(T, dtype=np.int32)
        self._score_top_k = None
        self._score_spans = []

        # Async pipelining: token rows whose value is still on device (the
        # previous step's sampled outputs). (token row, source row) pairs; the
        # engine merges them in a tiny jitted gather before dispatch.
        pending_rows: List[int] = []
        pending_srcs: List[int] = []

        t = 0
        for s, e in enumerate(self.entries):
            seq = e.seq
            start = seq.num_kv_cache_tokens()
            end = start + e.num_tokens
            bids = seq.block_ids_array()
            bs = seq.blocks[0].size if seq.blocks else block_size
            if e.num_tokens == 1:
                # Decode fast path (profiled: the generic per-token arrays
                # dominated prepare at large S).
                tid = seq.token_ids[start]
                if tid < 0:  # pending: value = prev outs[pending_src]
                    pending_rows.append(t)
                    pending_srcs.append(seq.pending_src)
                    tid = 0
                token_ids[t] = tid
                positions[t] = start
                token_seg[t] = s
                new_kv_slot_ids[t] = (
                    int(bids[start // bs]) * bs + start % bs
                )
            else:
                ids = seq.token_ids[start:end]
                token_ids[t : t + e.num_tokens] = ids
                positions[t : t + e.num_tokens] = np.arange(start, end)
                token_seg[t : t + e.num_tokens] = s
                new_kv_slot_ids[t : t + e.num_tokens] = seq.kv_slots_array(
                    start, end
                )

            block_tables[s, : len(bids)] = bids
            kv_lens[s] = end
            cu_q_lens[s + 1] = t + e.num_tokens
            assert e.num_tokens >= r or r == 1
            selected_idxes[s * r : (s + 1) * r] = (
                t + e.num_tokens - r + np.arange(r)
                if r > 1
                else t + e.num_tokens - 1
            )
            seq_mask[s] = 1.0
            needs_sample[s] = e.needs_sample
            self._lora_slots[s] = getattr(seq, "lora_slot", 0)

            sp = seq.sampling_params
            temperatures[s] = sp.temperature
            top_ks[s] = sp.top_k if sp.top_k > 0 else 0
            top_ps[s] = sp.top_p
            freq_p[s] = sp.frequency_penalty
            pres_p[s] = sp.presence_penalty
            rep_p[s] = sp.repetition_penalty
            base_seed = sp.seed if sp.seed is not None else seq.seq_id
            seeds[s] = np.uint32((base_seed * 1000003 + step_counter) & 0xFFFFFFFF)

            if use_penalties:
                items = list(seq.token_counts.items())[:U]
                for u, (tid, cnt) in enumerate(items):
                    unique_ids[s, u] = tid
                    unique_counts[s, u] = cnt
            if B and sp.logit_bias:
                for j, (tid, bv) in enumerate(list(sp.logit_bias.items())[:B]):
                    bias_ids[s, j] = tid
                    bias_vals[s, j] = bv
            n_prompt = seq.num_prompt_tokens
            if sp.prompt_logprobs is not None and start < n_prompt:
                self._score_top_k = max(
                    self._score_top_k or 0, sp.prompt_logprobs
                )
                self._score_spans.append((e, t, start, end))
                # p's target is prompt token p+1 — defined through position
                # n_prompt-2 (the last prompt token's successor is sampled).
                for p in range(start, min(end, n_prompt - 1)):
                    self._score_targets[t + (p - start)] = seq.token_ids[p + 1]
            t += e.num_tokens

        # Padding rows repeat the last cumulative value (zero-length chunks).
        cu_q_lens[S_real + 1 :] = cu_q_lens[S_real]
        if pending_rows:
            mask = np.zeros(T, dtype=bool)
            mask[pending_rows] = True
            gather = np.zeros(T, dtype=np.int32)
            gather[pending_rows] = pending_srcs
            self._pending_fix = (mask, gather)
        else:
            self._pending_fix = None
        mi = ModelInputs(
            token_ids=token_ids,
            positions=positions,
            token_seg=token_seg,
            new_kv_slot_ids=new_kv_slot_ids,
            block_tables=block_tables,
            kv_lens=kv_lens,
            cu_q_lens=cu_q_lens,
            num_seqs=np.array([S_real], dtype=np.int32),
            selected_idxes=selected_idxes,
            seq_mask=seq_mask,
        )
        si = SamplingInputs(
            temperatures=temperatures,
            top_ks=top_ks,
            top_ps=top_ps,
            frequency_penalties=freq_p,
            presence_penalties=pres_p,
            repetition_penalties=rep_p,
            unique_token_ids=unique_ids,
            unique_token_counts=unique_counts,
            bias_token_ids=bias_ids,
            bias_values=bias_vals,
            allowed_mask=allowed_mask,
            seeds=seeds,
        )
        return mi, si, needs_sample

    # ------------------------------------------------------------- outputs

    @property
    def score_top_k(self) -> Optional[int]:
        """Top-k for prompt scoring, or None when this step needs none."""
        return self._score_top_k

    @property
    def score_targets(self) -> np.ndarray:
        return self._score_targets

    def process_prompt_scores(
        self,
        t_lps: np.ndarray,  # [T]
        top_ids: Optional[np.ndarray],  # [T, K]
        top_lps: Optional[np.ndarray],  # [T, K]
        tokenizer=None,
    ) -> None:
        """Record teacher-forced prompt logprobs onto their sequences.
        Position-indexed assignment (Sequence.set_prompt_logprob) keeps this
        idempotent under preemption + prefill recompute."""
        for e, t0, start, end in self._score_spans:
            seq = e.seq
            k = seq.sampling_params.prompt_logprobs or 0
            n_prompt = seq.num_prompt_tokens
            for p in range(start, min(end, n_prompt - 1)):
                t = t0 + (p - start)
                tid = seq.token_ids[p + 1]
                lp = LogProb(
                    token=tokenizer.id_to_token(tid) if tokenizer else "",
                    token_id=tid,
                    logprob=float(t_lps[t]),
                )
                if k > 0 and top_ids is not None and top_ids.shape[1]:
                    lp.top_logprobs = [
                        LogProbData(
                            token=tokenizer.id_to_token(int(top_ids[t, j]))
                            if tokenizer
                            else "",
                            token_id=int(top_ids[t, j]),
                            logprob=float(top_lps[t, j]),
                        )
                        for j in range(min(k, top_ids.shape[1]))
                    ]
                seq.set_prompt_logprob(p + 1, lp)

    @property
    def lora_slots(self):
        """[S] per-sequence LoRA slots. Valid after prepare_model_inputs."""
        return self._lora_slots

    @property
    def pending_fix(self):
        """(mask[T] bool, gather[T] int32) for pending-token rows, or None.
        Valid after prepare_model_inputs."""
        return self._pending_fix

    def needs_sync(self) -> bool:
        """True when this batch can't run under async pipelining: guided
        decoding and penalties need the previous token resolved on host
        before the next step's masks/histograms are built, and prompt
        scoring runs a different executor program."""
        for e in self.entries:
            sp = e.seq.sampling_params
            if e.seq.guided is not None:
                return True
            if (
                sp.frequency_penalty != 0.0
                or sp.presence_penalty != 0.0
                or sp.repetition_penalty != 1.0
            ):
                return True
            if sp.prompt_logprobs is not None:
                return True
        return False

    def can_multi_step(self) -> bool:
        """True when the batch can run as one multi-step decode dispatch:
        all-decode, every row samples, and nothing requires per-token host
        feedback (guided masks and penalty histograms are rebuilt on host
        each token; pending rows' values live on device)."""
        if not self.is_decode_only:
            return False
        for e in self.entries:
            if not e.needs_sample or e.seq.has_pending:
                return False
        return not self.needs_sync()

    def process_multi_sample_output(
        self,
        next_tokens: np.ndarray,  # [N, S]
        logprobs: Optional[np.ndarray],  # [N, S]
        top_ids: Optional[np.ndarray],  # [N, S, K]
        top_logprobs: Optional[np.ndarray],  # [N, S, K]
        tokenizer=None,
    ) -> None:
        """Multi-step resolve: append up to N sampled tokens per sequence,
        dropping everything after a finish (EOS/stop/max_tokens overshoot —
        the device kept decoding; the host discards). KV accounting: micro-
        step i writes the KV of its INPUT token, so a sequence that accepts
        n tokens has KV committed for its original input plus n-1 fed-back
        tokens (the last sampled token's KV is written next step, exactly
        like the single-step path)."""
        N = next_tokens.shape[0]
        for s, e in enumerate(self.entries):
            seq = e.seq
            seq.commit_kv_cache(e.num_tokens)
            for i in range(N):
                tid = int(next_tokens[i, s])
                lp = self._build_logprob(
                    seq, tid, s,
                    logprobs[i] if logprobs is not None else None,
                    top_ids[i] if top_ids is not None else None,
                    top_logprobs[i] if top_logprobs is not None else None,
                    tokenizer,
                )
                seq.append_token(tid, lp)
                if seq.is_finished():
                    break
                if i < N - 1:
                    seq.commit_kv_cache(1)

    def append_pending_tokens(self) -> None:
        """Async dispatch path: commit KV progress and reserve pending slots
        for this step's samples (values resolve later from device)."""
        for s, e in enumerate(self.entries):
            e.seq.commit_kv_cache(e.num_tokens)
            if e.needs_sample:
                e.seq.append_pending_token(src_row=s)

    def resolve_sample_output(
        self,
        next_tokens: np.ndarray,  # [S]
        logprobs: Optional[np.ndarray],
        top_ids: Optional[np.ndarray],
        top_logprobs: Optional[np.ndarray],
        tokenizer=None,
    ) -> None:
        """Async resolve: fill this step's pending tokens with fetched values
        (KV was committed at dispatch). Sequences that finished or were
        cancelled while this step was in flight drop their sample."""
        for s, e in enumerate(self.entries):
            seq = e.seq
            if not e.needs_sample or not seq.has_pending:
                continue
            if seq.is_finished():
                # finished while in flight: the sampled token is overshoot
                seq.pop_pending_token()
                continue
            tid = int(next_tokens[s])
            lp = self._build_logprob(
                seq, tid, s, logprobs, top_ids, top_logprobs, tokenizer
            )
            seq.resolve_pending_token(tid, lp)
            if seq.is_finished() and seq.has_pending:
                # the NEXT step (already dispatched) sampled past the finish
                seq.pop_pending_token()

    @staticmethod
    def _build_logprob(
        seq, tid, s, logprobs, top_ids, top_logprobs, tokenizer
    ) -> Optional[LogProb]:
        if logprobs is None or not seq.sampling_params.logprobs:
            return None
        lp = LogProb(
            token=tokenizer.id_to_token(tid) if tokenizer else "",
            token_id=tid,
            logprob=float(logprobs[s]),
        )
        k = seq.sampling_params.top_logprobs
        if k > 0 and top_ids is not None:
            lp.top_logprobs = [
                LogProbData(
                    token=tokenizer.id_to_token(int(top_ids[s, j]))
                    if tokenizer
                    else "",
                    token_id=int(top_ids[s, j]),
                    logprob=float(top_logprobs[s, j]),
                )
                for j in range(min(k, top_ids.shape[1]))
            ]
        return lp

    def process_sample_output(
        self,
        next_tokens: np.ndarray,  # [S]
        logprobs: Optional[np.ndarray],  # [S]
        top_ids: Optional[np.ndarray],  # [S, K]
        top_logprobs: Optional[np.ndarray],  # [S, K]
        tokenizer=None,
    ) -> None:
        """Write sampled tokens back into sequences and commit KV progress
        (reference: batch.cpp:272 process_sample_output)."""
        for s, e in enumerate(self.entries):
            seq = e.seq
            seq.commit_kv_cache(e.num_tokens)
            if not e.needs_sample:
                continue
            tid = int(next_tokens[s])
            lp = self._build_logprob(
                seq, tid, s, logprobs, top_ids, top_logprobs, tokenizer
            )
            seq.append_token(tid, lp)
