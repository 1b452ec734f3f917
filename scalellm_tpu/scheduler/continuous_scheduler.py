"""ContinuousScheduler — continuous batching with chunked prefill,
preemption, priorities, and prefix-cache-aware n/best_of expansion.

TPU-native equivalent of the reference's ContinuousScheduler
(reference: src/scheduler/continuous_scheduler.{h,cpp}):
  - MPMC intake queue → 3-level priority order (HIGH/NORMAL/LOW then FCFS,
    request.h:115-135)
  - per-step batch build under token budget (max_tokens_per_batch) and seq
    budget (max_seqs_per_batch) — chunked prefill falls out of the per-seq
    token budgets (continuous_scheduler.cpp:163-175)
  - preemption of the lowest-priority block-holding request on KV exhaustion
    (continuous_scheduler.cpp:251-261)
  - lazy n/best_of sequence expansion after prefill so siblings share the
    prompt KV via the prefix cache (continuous_scheduler.cpp:137-142)
  - releases blocks of finished sequences; streams deltas via ResponseHandler
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from dataclasses import dataclass
from typing import List, Optional

from scalellm_tpu.engine.batch import Batch
from scalellm_tpu.request.output import Status, StatusCode
from scalellm_tpu.request.request import Request
from scalellm_tpu.scheduler.response_handler import ResponseHandler
from scalellm_tpu.utils.metrics import COUNTERS, GAUGES, HISTOGRAMS

logger = logging.getLogger(__name__)


@dataclass
class SchedulerOptions:
    """(reference: continuous_scheduler.h:26-29 Options)"""

    max_tokens_per_batch: int = 512
    max_seqs_per_batch: int = 128
    # Extra slots reserved per decode seq for speculative decoding.
    num_speculative_tokens: int = 0
    # Intake queue capacity (reference: continuous_scheduler.cpp:58, 100k).
    max_pending_requests: int = 100_000
    # Async pipelined stepping: dispatch step N+1 (with device-side token
    # feedback) before fetching step N's results, hiding the host fetch +
    # batch prep behind device execution. Requests using penalties, guided
    # decoding, or prompt logprobs fall back to sync steps transparently.
    enable_async_scheduling: bool = True
    # Multi-step decode (vLLM's num-scheduler-steps, TPU-natural as ONE
    # jitted lax.scan): all-decode batches run N autoregressive micro-steps
    # per dispatch — one host round trip and one batch prep per N tokens.
    # Sequences finishing mid-window overshoot up to N-1 tokens (discarded).
    # Batches with penalties/guided decoding fall back to per-token steps.
    num_decode_steps: int = 1


class ContinuousScheduler:
    def __init__(
        self,
        engine,
        options: SchedulerOptions = SchedulerOptions(),
        response_handler: Optional[ResponseHandler] = None,
    ):
        self._engine = engine
        self._options = options
        self._block_manager = engine.block_manager
        # KV swap-out preemption (memory/kv_swap.py): when the engine has a
        # swapper, preempted sequences stage their pages in host memory and
        # restore on reschedule instead of re-prefilling (the reference only
        # drops + recomputes, continuous_scheduler.cpp:251-261).
        self._swapper = getattr(engine, "kv_swapper", None)
        self._response_handler = response_handler or ResponseHandler(
            engine.tokenizer, threaded=False
        )
        self._intake: "queue.Queue[Request]" = queue.Queue(
            maxsize=options.max_pending_requests
        )
        # Requests admitted and not yet finished, kept in priority order.
        self._requests: List[Request] = []
        self._pending = 0
        self._pending_lock = threading.Lock()
        # Async pipelining state: the dispatched-but-unresolved step.
        self._async = options.enable_async_scheduling and getattr(
            engine, "supports_async", False
        )
        self._multi_n = (
            options.num_decode_steps
            if options.num_decode_steps > 1
            and getattr(engine, "supports_multi_step", False)
            else 1
        )
        self._inflight: Optional[tuple] = None  # (Batch, ModelOutputs)
        # Set when a pipelined build hit allocation pressure: the next step
        # runs sync so preemption can make room.
        self._starved = False

    @property
    def max_seq_tokens(self) -> int:
        """KV capacity available to a single sequence (see BlockManager)."""
        return self._block_manager.max_seq_tokens

    # ---------------------------------------------------------------- intake

    def schedule(self, request: Request) -> bool:
        """Enqueue a request (reference: continuous_scheduler.cpp:93).
        Returns False when the queue is full (RESOURCE_EXHAUSTED)."""
        try:
            self._intake.put_nowait(request)
        except queue.Full:
            return False
        with self._pending_lock:
            self._pending += 1
        COUNTERS.inc("scheduling_pending_requests")
        return True

    @property
    def num_pending_requests(self) -> int:
        with self._pending_lock:
            return self._pending

    # ---------------------------------------------------------------- step

    def step(self, timeout_s: float = 0.5) -> int:
        """Build one batch, run the engine, deliver outputs.
        Returns the number of sequences stepped.

        With async scheduling the steady state keeps ONE step in flight:
        build+dispatch N+1 (token values still on device feed forward
        in-graph), then fetch/deliver N — the host work hides behind the
        device step instead of serializing with it."""
        if self._inflight is not None and self._multi_n > 1:
            # Multi-step + async don't compose: a pipelined build marks
            # rows pending (their token values are still on device), which
            # disqualifies can_multi_step, so a full pipeline would lock
            # the scheduler into single-step dispatches forever (measured:
            # multi_step_fraction 0.0 and -21% throughput on the serve mix).
            # Drain first — the N-step scan amortizes the host round trip
            # better than single-step pipelining hides it.
            self._resolve_inflight()
        if self._inflight is not None:
            # Build the next batch BEFORE resolving the in-flight step;
            # pending-token rows read the in-flight samples on device.
            nxt = self._build_batch(0.0, pipelined=True)
            if nxt.entries:
                COUNTERS.inc("num_engine_steps")
            if nxt.entries and not self._starved and not nxt.needs_sync():
                outs = self._engine.dispatch_model(
                    nxt, prev_outs=self._inflight[1]
                )
                resolved = self._resolve_inflight()
                self._inflight = (nxt, outs)
                COUNTERS.inc("num_async_steps")
                return max(len(nxt.entries), resolved)
            # Can't pipeline this batch: drain the pipeline, then run the
            # already-built batch synchronously (its pending rows resolve
            # first, so prepare sees real token values).
            resolved = self._resolve_inflight()
            if not nxt.entries:
                return resolved if resolved else 0
            self._execute_sync(nxt)
            return len(nxt.entries)

        batch = self._build_batch(timeout_s)
        if not batch.entries:
            return 0
        # Step telemetry: multi_step_fraction = num_multi_steps /
        # num_engine_steps; also the sync-vs-async A/B's step-count diff.
        COUNTERS.inc("num_engine_steps")
        if self._multi_n > 1 and batch.can_multi_step():
            t0 = time.monotonic()
            self._engine.execute_model_multi(batch, self._multi_n)
            HISTOGRAMS.observe(
                "execute_model_latency_seconds", time.monotonic() - t0
            )
            self._process_outputs(batch)
            COUNTERS.inc("num_multi_steps")
            return len(batch.entries)
        if self._async and not batch.needs_sync():
            outs = self._engine.dispatch_model(batch)
            self._inflight = (batch, outs)
            COUNTERS.inc("num_async_steps")
            return len(batch.entries)
        self._execute_sync(batch)
        return len(batch.entries)

    def _execute_sync(self, batch: Batch) -> None:
        t0 = time.monotonic()
        self._engine.execute_model(batch)
        HISTOGRAMS.observe("execute_model_latency_seconds", time.monotonic() - t0)
        self._process_outputs(batch)

    def _resolve_inflight(self) -> int:
        if self._inflight is None:
            return 0
        batch, outs = self._inflight
        self._inflight = None
        t0 = time.monotonic()
        self._engine.finalize_model(batch, outs)
        HISTOGRAMS.observe("execute_model_latency_seconds", time.monotonic() - t0)
        self._process_outputs(batch)
        return len(batch.entries)

    def run_until_complete(self) -> None:
        """Loop until all scheduled work is done
        (reference: continuous_scheduler.cpp:397)."""
        while True:
            stepped = self.step(timeout_s=0.0)
            if (
                stepped == 0
                and self._inflight is None
                and self.num_pending_requests == 0
                and not self._requests
            ):
                break
        self._response_handler.wait_for_complete()

    # ---------------------------------------------------------------- build

    def _drain_intake(self, timeout_s: float) -> None:
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                req = self._intake.get_nowait()
                self._requests.append(req)
            except queue.Empty:
                if self._requests or timeout_s <= 0:
                    return
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return
                try:
                    req = self._intake.get(timeout=min(remaining, 0.05))
                    self._requests.append(req)
                except queue.Empty:
                    continue

    def _finish_request(self, request: Request) -> None:
        for seq in request.sequences:
            self._block_manager.deallocate(seq)
            if self._swapper is not None:
                self._swapper.discard(seq)
        self._response_handler.on_request_finish(request)
        with self._pending_lock:
            self._pending -= 1
        HISTOGRAMS.observe(
            "end_2_end_latency_seconds", time.monotonic() - request.created_time
        )
        COUNTERS.inc("responsing_rounds" if request.stream else "non_stream_responses")

    def _build_batch(self, timeout_s: float, pipelined: bool = False) -> Batch:
        """pipelined=True builds the NEXT step while one is still in flight:
        no preemption (an in-flight victim's pages are still being written),
        no n/best_of expansion (the parent's last token is unresolved), and
        sequences that already reached a length limit are left for resolve."""
        t0 = time.monotonic()
        self._starved = False
        self._drain_intake(timeout_s)
        if self._swapper is not None:
            # Pin last round's swap-out copies to host memory — their DMA
            # drained behind the intervening step (async staging).
            self._swapper.finalize_staging()
        opts = self._options

        # Priority then FCFS (reference: request.h:115-135 comparators).
        self._requests.sort(key=lambda r: (int(r.priority), r.arrival_seq))

        # Retire finished/cancelled requests; release their blocks.
        live: List[Request] = []
        for req in self._requests:
            if req.is_finished():
                self._finish_request(req)
            else:
                live.append(req)
        self._requests = live

        # Lazy n/best_of expansion once prefill KV exists
        # (reference: continuous_scheduler.cpp:137-142).
        for req in self._requests:
            if req.should_expand_sequences():
                if pipelined:
                    # parent's sampled token is in flight: expand after the
                    # pipeline drains (this request sits out one build)
                    self._starved = True
                    continue
                req.expand_sequences()

        batch = Batch()
        token_budget = opts.max_tokens_per_batch
        seq_budget = opts.max_seqs_per_batch
        # Decode seqs reserve extra KV slots for speculative tokens and/or
        # multi-step micro-steps (whichever horizon is larger).
        spec_overhead = max(
            opts.num_speculative_tokens, self._multi_n - 1
        )

        # Requests we may preempt, lowest priority last (iterate from the
        # back). Only block-holding requests are preemption candidates.
        candidates = self._requests

        for req in candidates:
            if token_budget <= 0 or seq_budget <= 0:
                break
            for seq in req.sequences:
                if token_budget <= 0 or seq_budget <= 0:
                    break
                if seq.is_finished():
                    continue
                if pipelined and seq.has_pending and seq.would_finish_by_length():
                    # the in-flight token already reaches max_tokens/context:
                    # don't dispatch a step whose output would be discarded
                    continue
                if (
                    self._swapper is not None
                    and not seq.blocks
                    and self._swapper.has_entry(seq)
                ):
                    # Preempted with staged KV: restore instead of
                    # re-prefilling. On allocation failure the entry stays
                    # staged and the sequence waits for the next round.
                    if not self._swapper.swap_in(seq):
                        continue
                cached = seq.num_kv_cache_tokens()
                uncached = seq.num_tokens - cached
                if uncached <= 0:
                    continue
                # Chunked prefill: clamp to remaining token budget
                # (reference: continuous_scheduler.cpp:163-175).
                n = min(uncached, token_budget)
                if n < uncached:
                    # A partial chunk must still make progress; require at
                    # least 1 token.
                    if n <= 0:
                        continue
                # Reserve slots for this step (+ speculative budget on
                # decode steps, reference: continuous_scheduler.cpp:443-475).
                extra = spec_overhead if uncached == 1 else 0
                target = cached + n + extra
                if pipelined:
                    # No preemption while a step is in flight: a victim's
                    # pages may still be receiving writes. Starved seqs force
                    # the next step to run sync (with preemption).
                    if not self._block_manager.allocate_blocks_for(seq, target):
                        self._starved = True
                        continue
                elif not self._allocate_with_preemption(req, seq, target, batch):
                    # Out of memory even after preemption: this seq waits.
                    continue
                # A prefix-cache hit during allocation may have served part
                # of the prompt from shared blocks — recompute the chunk.
                # The new chunk can reach FURTHER than the original target
                # (cached advanced, budget unchanged), so top up blocks.
                cached = seq.num_kv_cache_tokens()
                n = min(seq.num_tokens - cached, token_budget)
                if n <= 0:
                    continue
                if cached + n + extra > target:
                    if not self._block_manager.allocate_blocks_for(
                        seq, cached + n + extra
                    ):
                        # shrink the chunk to what the allocation covers
                        n = seq.kv_cache_capacity - extra - cached
                        if n <= 0:
                            continue
                batch.add(seq, n)
                token_budget -= n
                seq_budget -= 1

        GAUGES.set("num_running_requests", len(self._requests))
        GAUGES.set(
            "kv_cache_utilization_perc", self._block_manager.kv_cache_utilization
        )
        GAUGES.set(
            "num_blocks_in_prefix_cache",
            self._block_manager.num_blocks_in_prefix_cache,
        )
        HISTOGRAMS.observe(
            "scheduling_latency_seconds", time.monotonic() - t0
        )
        return batch

    def _allocate_with_preemption(
        self, req: Request, seq, num_tokens: int, batch: Batch
    ) -> bool:
        """Allocate blocks, preempting lower-priority block holders if needed
        (reference: continuous_scheduler.cpp:251-261)."""
        if self._block_manager.allocate_blocks_for(seq, num_tokens):
            return True
        # Preempt from the lowest-priority end. Never preempt `req` itself or
        # a request already scheduled into this step's batch. Swap-aware
        # tiebreak (NEXT #11): at equal priority, prefer victims whose pages
        # fit in the host pool's FREE space — staging them does not LRU-evict
        # earlier victims' entries (which would silently turn those cheap
        # swap-ins back into full recomputes).
        in_batch = {id(e.seq) for e in batch.entries}

        def victim_key(r):
            fits = 0
            if self._swapper is not None:
                fits = int(
                    all(
                        self._swapper.staging_fits(s)
                        for s in r.sequences
                        if s.blocks
                    )
                )
            return (int(r.priority), fits, r.arrival_seq)

        for victim in sorted(self._requests, key=victim_key, reverse=True):
            if victim is req:
                continue
            if any(id(s) in in_batch for s in victim.sequences):
                continue
            if not any(s.blocks for s in victim.sequences):
                continue
            self._preempt(victim)
            COUNTERS.inc("num_preempted_requests")
            if self._block_manager.allocate_blocks_for(seq, num_tokens):
                return True
        return self._block_manager.allocate_blocks_for(seq, num_tokens)

    def _preempt(self, request: Request) -> None:
        """Release all KV for the request. With a KV swapper the pages are
        staged to host memory first (restored on reschedule); otherwise it
        re-prefills later (prefix cache may restore most of it)."""
        for seq in request.sequences:
            if self._swapper is not None and self._swapper.swap_out(seq):
                # Staged pages replace the prefix-cache copy — skip
                # publishing so swap-in lands in unshared blocks.
                self._block_manager.release_without_caching(seq)
                continue
            self._block_manager.deallocate(seq)

    # ---------------------------------------------------------------- output

    def _process_outputs(self, batch: Batch) -> None:
        touched = []
        seen = set()
        for e in batch.entries:
            req = getattr(e.seq, "request", None)
            if req is not None and id(req) not in seen:
                seen.add(id(req))
                touched.append(req)
        for req in touched:
            # Release blocks of finished sequences early
            # (reference: build_sequence_batch releases finished seqs).
            for seq in req.sequences:
                if seq.is_finished() and seq.blocks:
                    self._block_manager.deallocate(seq)
            if req.is_finished():
                # Async pipelining: a request that finished at the previous
                # resolve may still own a (discarded) row in this batch —
                # it was already retired then.
                if req in self._requests:
                    self._requests.remove(req)
                    self._finish_request(req)
            elif req.stream:
                self._response_handler.on_request_stream(req)
