"""BlockManager backed by the native C++ KV store.

Same interface and semantics as memory/block_manager.py (which remains the
pure-Python reference), but the free list, refcounts, and prefix-cache trie
live in the `_scalellm_native` extension (native/kv_store.cpp) — the
scheduler's per-step host path runs without Python object churn
(reference: src/memory/ is C++ for the same reason).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, List

from scalellm_tpu.memory.block_manager import BlockManagerOptions

if TYPE_CHECKING:
    from scalellm_tpu.request.sequence import Sequence


class NativeBlock:
    """Quacks like memory.block.Block over a native store entry."""

    __slots__ = ("_store", "id", "size")

    def __init__(self, store, block_id: int, size: int):
        self._store = store
        self.id = block_id
        self.size = size

    def inc_ref(self) -> "NativeBlock":
        self._store.inc_ref(self.id)
        return self

    def dec_ref(self) -> None:
        self._store.dec_ref(self.id)

    @property
    def ref_count(self) -> int:
        return self._store.ref_count(self.id)

    def is_shared(self) -> bool:
        return self.ref_count > 1

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"NativeBlock(id={self.id}, refs={self.ref_count})"


class NativeBlockManager:
    def __init__(self, options: BlockManagerOptions):
        from scalellm_tpu.native import load

        native = load()
        assert native is not None, "native extension unavailable"
        self._options = options
        self._block_size = options.block_size
        self._enable_prefix_cache = options.enable_prefix_cache
        self._store = native.KVStore(options.num_blocks, options.block_size)
        # Reserve block 0 for padding (reference: block_manager.cpp:40-42).
        pad = self._store.allocate(1)
        assert pad == [0]

    @property
    def options(self) -> BlockManagerOptions:
        return self._options

    @property
    def block_size(self) -> int:
        return self._block_size

    @property
    def num_free_blocks(self) -> int:
        return self._store.stats()["num_free"]

    @property
    def num_blocks_in_prefix_cache(self) -> int:
        return self._store.stats()["cache_blocks"]

    @property
    def max_seq_tokens(self) -> int:
        """Most KV slots one sequence can ever hold (mirrors BlockManager:
        all blocks minus the reserved padding block)."""
        return (self._options.num_blocks - 1) * self._options.block_size

    @property
    def kv_cache_utilization(self) -> float:
        s = self._store.stats()
        return s["num_used"] / s["total"] if s["total"] else 0.0

    # ------------------------------------------------------------- allocate

    def allocate_blocks_for(self, seq: "Sequence", num_tokens: int) -> bool:
        if (
            self._enable_prefix_cache
            and not seq.blocks
            # prompt_logprobs requests bypass cache reuse: every prompt
            # position must run through prefill to be scored (same guard as
            # the Python BlockManager).
            and seq.sampling_params.prompt_logprobs is None
        ):
            matchable = seq.prefix_key_tokens(seq.num_prompt_tokens - 1)
            shared_ids = self._store.match(matchable)
            if shared_ids:
                seq.append_blocks(
                    [NativeBlock(self._store, i, self._block_size) for i in shared_ids]
                )
                seq.set_shared_kv_tokens(len(shared_ids) * self._block_size)

        cur_capacity = seq.kv_cache_capacity
        if num_tokens <= cur_capacity:
            return True
        need = (num_tokens - cur_capacity + self._block_size - 1) // self._block_size
        ids = self._store.allocate(need)
        if ids is None:
            if not self._enable_prefix_cache:
                return False
            self._store.evict(need - self.num_free_blocks)
            ids = self._store.allocate(need)
            if ids is None:
                return False
        seq.append_blocks(
            [NativeBlock(self._store, i, self._block_size) for i in ids]
        )
        return True

    def allocate_fresh_blocks_for(self, seq: "Sequence", num_tokens: int) -> bool:
        """allocate_blocks_for WITHOUT prefix-cache matching (KV swap-in —
        same contract as the Python BlockManager)."""
        cur_capacity = seq.kv_cache_capacity
        if num_tokens <= cur_capacity:
            return True
        need = (num_tokens - cur_capacity + self._block_size - 1) // self._block_size
        ids = self._store.allocate(need)
        if ids is None:
            if not self._enable_prefix_cache:
                return False
            self._store.evict(need - self.num_free_blocks)
            ids = self._store.allocate(need)
            if ids is None:
                return False
        seq.append_blocks(
            [NativeBlock(self._store, i, self._block_size) for i in ids]
        )
        return True

    def has_enough_blocks(self, num_blocks: int) -> bool:
        s = self._store.stats()
        if s["num_free"] >= num_blocks:
            return True
        if not self._enable_prefix_cache:
            return False
        return s["num_free"] + s["cache_blocks"] >= num_blocks

    # ------------------------------------------------------------- release

    def cache_blocks_for(self, seq: "Sequence") -> None:
        if not self._enable_prefix_cache:
            return
        n_cached_tokens = seq.num_kv_cache_tokens()
        n_blocks = n_cached_tokens // self._block_size
        if n_blocks:
            self._store.insert(
                seq.prefix_key_tokens(n_blocks * self._block_size),
                [b.id for b in seq.blocks[:n_blocks]],
            )

    def release_without_caching(self, seq: "Sequence") -> None:
        """Free the sequence's blocks WITHOUT publishing to the prefix
        cache — KV swap-out staged the contents to host memory, and the
        swap-in must land in unshared blocks."""
        for block in seq.blocks:
            block.dec_ref()
        seq.release_blocks()

    def deallocate(self, seq: "Sequence") -> None:
        self.cache_blocks_for(seq)
        for block in seq.blocks:
            block.dec_ref()
        seq.release_blocks()


def create_block_manager(options: BlockManagerOptions):
    """Native store when the extension is available, else pure Python
    (opt out with SCALELLM_DISABLE_NATIVE=1)."""
    from scalellm_tpu.native import load

    if load() is not None:
        return NativeBlockManager(options)
    from scalellm_tpu.memory.block_manager import BlockManager

    return BlockManager(options)
