"""KV swap-out preemption: host-offload of preempted sequences' KV pages.

The reference handles KV exhaustion by dropping the victim's blocks and
re-prefilling later (reference: continuous_scheduler.cpp:251-261 — the
blocks are released and the sequence's kv_cache_tokens reset). On TPU the
device<->host link is fast enough that staging the victim's pages in host
memory and scattering them back on resume is strictly cheaper than
recomputing a long prefill: a swap-in moves kv_bytes once over PCIe, a
recompute re-runs the whole model over every prompt+generated token.

Design:
  - `HostKVPool` holds per-sequence staged page data (numpy) under a byte
    budget with LRU eviction (an evicted victim simply falls back to the
    reference's recompute behavior — swap is an optimization, never a
    correctness dependency).
  - `KVSwapper` binds the pool to an Executor: swap_out gathers the
    sequence's pages from the device cache ([L, P, ps, 2H, D] indexed on
    the page dim) into the pool; swap_in allocates fresh blocks (bypassing
    the prefix cache — the staged data already covers generated tokens,
    which the prefix cache never serves) and scatters the staged pages
    into the new slots, restoring the sequence's KV counters.

Guard rails: disabled automatically on multi-host meshes (followers' KV
must stay in lockstep with the driver's; page staging is driver-local).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from dataclasses import dataclass
from typing import TYPE_CHECKING, Optional

import numpy as np

from scalellm_tpu.utils.metrics import COUNTERS, GAUGES

if TYPE_CHECKING:
    from scalellm_tpu.request.sequence import Sequence

logger = logging.getLogger(__name__)


@dataclass
class SwapEntry:
    # [L, n_pages, page_size, 2H, D] staged page contents. May transiently
    # be a jax array with an in-flight device->host DMA (async staging);
    # finalize() pins it to numpy, releasing the device buffer.
    data: "np.ndarray"
    num_kv_tokens: int  # KV counter to restore on swap-in

    def finalize(self) -> None:
        if not isinstance(self.data, np.ndarray):
            self.data = np.asarray(self.data)


class HostKVPool:
    """Byte-budgeted LRU pool of staged KV pages, keyed by seq id."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._entries: "OrderedDict[int, SwapEntry]" = OrderedDict()
        self._used = 0

    @property
    def used_bytes(self) -> int:
        return self._used

    def __contains__(self, seq_id: int) -> bool:
        return seq_id in self._entries

    def put(self, seq_id: int, entry: SwapEntry) -> bool:
        nbytes = entry.data.nbytes
        if nbytes > self.max_bytes:
            return False
        while self._used + nbytes > self.max_bytes and self._entries:
            _, old = self._entries.popitem(last=False)  # LRU: oldest first
            self._used -= old.data.nbytes
            COUNTERS.inc("num_swap_evictions")
        self._entries[seq_id] = entry
        self._used += nbytes
        GAUGES.set("kv_swap_pool_bytes", float(self._used))
        return True

    def get(self, seq_id: int) -> Optional[SwapEntry]:
        return self._entries.get(seq_id)

    def pop(self, seq_id: int) -> Optional[SwapEntry]:
        entry = self._entries.pop(seq_id, None)
        if entry is not None:
            self._used -= entry.data.nbytes
            GAUGES.set("kv_swap_pool_bytes", float(self._used))
        return entry

    def discard(self, seq_id: int) -> None:
        self.pop(seq_id)


class KVSwapper:
    """Swap-out/in of a sequence's KV pages via the Executor's device cache.

    The scheduler calls `swap_out` on preemption (BEFORE deallocating the
    victim's blocks), `swap_in` when the sequence is rescheduled, and
    `discard` when the request retires with an entry still staged.
    """

    def __init__(self, executor, block_manager, block_size: int,
                 pool: HostKVPool):
        self._executor = executor
        self._bm = block_manager
        self._block_size = block_size
        self._pool = pool
        # entries whose device->host DMA may still be in flight
        self._staging: list = []

    @property
    def pool(self) -> HostKVPool:
        return self._pool

    def has_entry(self, seq: "Sequence") -> bool:
        return seq.seq_id in self._pool

    def staging_fits(self, seq: "Sequence") -> bool:
        """True when preempting `seq` can stage its pages in the pool's
        FREE space — i.e. without LRU-evicting other sequences' staged KV
        (an eviction turns an earlier victim's cheap swap-in back into a
        full recompute). Used by the scheduler's swap-aware victim policy."""
        n_kv = seq.num_kv_cache_tokens()
        if n_kv <= 0 or not seq.blocks:
            return True  # nothing to stage
        kv = self._executor.kv_cache
        if kv is None:
            return False
        # staged entry shape: [L, n_pages, page_size, 2H, D]
        per_page = (
            kv.shape[0] * int(np.prod(kv.shape[2:])) * kv.dtype.itemsize
        )
        n_pages = (n_kv + self._block_size - 1) // self._block_size
        free = self._pool.max_bytes - self._pool.used_bytes
        return n_pages * per_page <= free

    def swap_out(self, seq: "Sequence") -> bool:
        n_kv = seq.num_kv_cache_tokens()
        if n_kv <= 0 or not seq.blocks:
            return False
        n_pages = (n_kv + self._block_size - 1) // self._block_size
        page_ids = np.asarray(seq.block_ids()[:n_pages], np.int32)
        # Async staging: the gather + host DMA run behind the next engine
        # step; only accounting happens here. Safe to release the victim's
        # blocks immediately — any re-writer of those pages is dispatched
        # after the gather, so device ordering preserves the copy.
        fetch = getattr(self._executor, "fetch_pages_async", None)
        data = (
            fetch(page_ids) if fetch is not None
            else self._executor.fetch_pages(page_ids)
        )
        entry = SwapEntry(data, n_kv)
        if not self._pool.put(seq.seq_id, entry):
            return False
        self._staging.append(entry)
        COUNTERS.inc("num_swap_out")
        return True

    def finalize_staging(self) -> None:
        """Pin any in-flight staged copies to host memory (releases their
        device buffers). The scheduler calls this once per build — by then
        the DMA has drained behind the intervening step, so this is cheap."""
        pending = self._staging
        if not pending:
            return
        self._staging = []
        for entry in pending:
            entry.finalize()

    def swap_in(self, seq: "Sequence") -> bool:
        """Restore a staged sequence: allocate fresh blocks (prefix cache
        bypassed), scatter pages back, restore KV counters. Returns False
        (entry kept) when block allocation fails — the caller should let
        the sequence wait rather than recompute."""
        entry = self._pool.get(seq.seq_id)
        if entry is None:
            return False
        entry.finalize()  # in case its staging DMA is still in flight
        assert not seq.blocks, "swap_in expects a blockless sequence"
        # Capacity for the full sequence (restored KV + room for the next
        # token) without touching the prefix cache.
        if not self._bm.allocate_fresh_blocks_for(seq, seq.num_tokens):
            return False
        n_pages = entry.data.shape[1]
        page_ids = np.asarray(seq.block_ids()[:n_pages], np.int32)
        self._executor.restore_pages(page_ids, entry.data)
        seq.restore_kv_tokens(entry.num_kv_tokens)
        self._pool.pop(seq.seq_id)
        COUNTERS.inc("num_swap_in")
        return True

    def discard(self, seq: "Sequence") -> None:
        self._pool.discard(seq.seq_id)
