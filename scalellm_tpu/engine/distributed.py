"""Distributed engine driver: host-0 scheduling over a multi-host pod.

The reference is single-host (SURVEY.md §5: NCCL never crosses a host); on
TPU pod slices the model's mesh spans hosts, and jitted steps must be
entered by EVERY host with identical inputs. This module implements the
single-controller pattern BASELINE.json requires:

  host 0 (driver):    HTTP/gRPC servers + scheduler + batch building; each
                      step broadcasts (header, model inputs) to followers
                      before entering the jit.
  hosts 1..N (followers): run_follower() — receive step inputs, enter the
                      same jit; their shards participate via XLA collectives
                      (ICI within a slice, DCN across hosts).

The broadcast payload is two-phase because multihost broadcast requires
identical shapes on every host: a fixed-shape header carries the padded
bucket dims, then followers allocate matching placeholders for the array
broadcast.
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
from scalellm_tpu.engine.params import ModelInputs, SamplingInputs
from scalellm_tpu.parallel import multihost

logger = logging.getLogger(__name__)

# header: [running_flag, T, S, MAXP, U, B(logit-bias width), decode_only,
#          W(guided-mask width), step_counter]
_HEADER_LEN = 9
_STOP = -1
_HEARTBEAT = 2


def _header_of(
    mi: ModelInputs,
    si: SamplingInputs,
    decode_only: bool = False,
    step: int = 0,
) -> np.ndarray:
    h = np.zeros(_HEADER_LEN, np.int32)
    h[0] = 1
    h[1] = mi.token_ids.shape[0]
    h[2] = mi.kv_lens.shape[0]
    h[3] = mi.block_tables.shape[1]
    h[4] = si.unique_token_ids.shape[1]
    h[5] = si.bias_token_ids.shape[1]
    h[6] = int(decode_only)
    h[7] = si.allowed_mask.shape[1]
    # Lockstep check: followers verify the driver's step counter matches
    # their own count of received steps — a mismatch means a host skipped or
    # double-entered a collective (desync ⇒ silent garbage or deadlock), so
    # fail LOUDLY instead. int32 wrap is harmless: both sides wrap alike.
    h[8] = step & 0x7FFFFFFF
    return h


def check_step_header(header: np.ndarray, expected_step: int) -> None:
    """Raise on driver/follower step-counter desync (see _header_of)."""
    got = int(header[8])
    want = expected_step & 0x7FFFFFFF
    if got != want:
        raise RuntimeError(
            f"multihost desync: driver is at step {got}, this follower "
            f"expected {want} — a broadcast was missed or duplicated; "
            "aborting before entering a mismatched collective"
        )


def _placeholders(h: np.ndarray) -> Tuple[ModelInputs, SamplingInputs]:
    T, S, MAXP, U = int(h[1]), int(h[2]), int(h[3]), int(h[4])
    B = max(int(h[5]), 1)
    mi = ModelInputs(
        token_ids=np.zeros(T, np.int32),
        positions=np.zeros(T, np.int32),
        token_seg=np.zeros(T, np.int32),
        new_kv_slot_ids=np.zeros(T, np.int32),
        block_tables=np.zeros((S, MAXP), np.int32),
        kv_lens=np.zeros(S, np.int32),
        cu_q_lens=np.zeros(S + 1, np.int32),
        num_seqs=np.zeros(1, np.int32),
        selected_idxes=np.zeros(S, np.int32),
        seq_mask=np.zeros(S, np.float32),
    )
    si = SamplingInputs(
        temperatures=np.zeros(S, np.float32),
        top_ks=np.zeros(S, np.int32),
        top_ps=np.zeros(S, np.float32),
        frequency_penalties=np.zeros(S, np.float32),
        presence_penalties=np.zeros(S, np.float32),
        repetition_penalties=np.zeros(S, np.float32),
        unique_token_ids=np.zeros((S, U), np.int32),
        unique_token_counts=np.zeros((S, U), np.int32),
        bias_token_ids=np.zeros((S, B), np.int32),
        bias_values=np.zeros((S, B), np.float32),
        allowed_mask=np.zeros((S, max(int(h[7]), 1)), np.uint32),
        seeds=np.zeros(S, np.uint32),
    )
    return mi, si


class DistributedLLMEngine(LLMEngine):
    """LLMEngine whose execute_model broadcasts step inputs to all hosts
    before entering the jit. Single-process: behaves exactly like LLMEngine.
    """

    def __init__(self, options: EngineOptions, mesh=None):
        import jax

        if mesh is None and jax.process_count() > 1:
            mesh = multihost.make_pod_mesh(tp=options.tp_size or 0)
        super().__init__(options, mesh=mesh)
        self._multi = jax.process_count() > 1
        if self._multi and not multihost.collective_smoke_test(self.executor.mesh):
            raise RuntimeError("startup collective smoke test failed")

    def execute_model(self, batch: Batch) -> None:
        if not self._multi:
            return super().execute_model(batch)
        if not batch.entries:
            return
        assert multihost.is_driver(), "only host 0 schedules batches"
        self._step_counter += 1
        self._bcast_counter = getattr(self, "_bcast_counter", 0) + 1
        mi, si, needs_sample = batch.prepare_model_inputs(
            self.options.block_size, self._step_counter
        )
        decode_only = batch.is_decode_only
        (header,) = multihost.broadcast_step_inputs(
            _header_of(mi, si, decode_only, step=self._bcast_counter)
        )
        del header  # driver's own copy is authoritative
        (mi, si) = multihost.broadcast_step_inputs((mi, si))[0]
        outs = self.executor.execute(mi, si, decode_only=decode_only)
        next_tokens = np.asarray(outs.next_tokens)
        want_lp = any(e.seq.sampling_params.logprobs for e in batch.entries)
        logprobs = np.asarray(outs.logprobs) if want_lp else None
        top_ids = np.asarray(outs.top_ids) if want_lp else None
        top_lps = np.asarray(outs.top_logprobs) if want_lp else None
        batch.process_sample_output(
            next_tokens, logprobs, top_ids, top_lps, self.tokenizer
        )

    # ---------------------------------------------------------------- follower

    def run_follower(self, idle_timeout: float | None = None) -> None:
        """Non-driver hosts: receive step inputs forever and enter the jit
        in lockstep with the driver. Returns when the driver broadcasts the
        stop header (shutdown).

        idle_timeout (seconds, None = wait forever): maximum time to block
        waiting for the NEXT step's header. A dead or wedged driver
        otherwise hangs followers forever inside the collective (the
        reference's analog is the 4s NCCL smoke-test timeout,
        llm_engine.cpp:98-107 — extended here past startup to every step
        boundary). On timeout, raises RuntimeError so the host exits
        loudly; the payload broadcast that follows an already-received
        header is never the waiting point, so only the header wait is
        guarded."""
        assert self._multi and not multihost.is_driver()
        step = 0
        while True:
            header = multihost.broadcast_with_timeout(
                np.zeros(_HEADER_LEN, np.int32), timeout=idle_timeout
            )
            if int(header[0]) == _STOP:
                return
            if int(header[0]) == _HEARTBEAT:
                continue  # idle keep-alive; not a step
            step += 1
            check_step_header(header, step)
            mi, si = _placeholders(header)
            (mi, si) = multihost.broadcast_step_inputs((mi, si))[0]
            self.executor.execute(mi, si, decode_only=bool(header[6]))

    def heartbeat(self) -> None:
        """Idle keep-alive for followers running with an idle_timeout.
        Must be called from the same (scheduler) thread as execute_model —
        broadcasts must stay totally ordered across hosts."""
        if not self._multi:
            return
        h = np.zeros(_HEADER_LEN, np.int32)
        h[0] = _HEARTBEAT
        multihost.broadcast_step_inputs(h)

    def shutdown_followers(self) -> None:
        if not self._multi:
            return
        h = np.zeros(_HEADER_LEN, np.int32)
        h[0] = _STOP
        multihost.broadcast_step_inputs(h)
