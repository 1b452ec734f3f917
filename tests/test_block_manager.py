"""KV block memory tests (intent mirrors reference block_allocator_test.cpp,
block_manager_test.cpp)."""

from scalellm_tpu.memory import Block, BlockAllocator, BlockManager, BlockManagerOptions
from scalellm_tpu.request.sequence import Sequence
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.sampling.params import SamplingParams


def make_seq(tokens):
    return Sequence(
        index=0,
        token_ids=tokens,
        sampling_params=SamplingParams(max_tokens=100),
        stopping_criteria=StoppingCriteria(max_tokens=100),
    )


class TestBlockAllocator:
    def test_allocate_free_cycle(self):
        alloc = BlockAllocator(total_blocks=4, block_size=8)
        blocks = [alloc.allocate() for _ in range(4)]
        assert alloc.num_free_blocks == 0
        assert sorted(b.id for b in blocks) == [0, 1, 2, 3]
        for b in blocks:
            b.dec_ref()
        assert alloc.num_free_blocks == 4

    def test_refcounting(self):
        alloc = BlockAllocator(total_blocks=2, block_size=8)
        b = alloc.allocate()
        assert not b.is_shared()
        b.inc_ref()
        assert b.is_shared()
        b.dec_ref()
        assert alloc.num_free_blocks == 1  # still held
        b.dec_ref()
        assert alloc.num_free_blocks == 2


class TestBlockManager:
    def test_padding_block_reserved(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=8, block_size=4))
        seq = make_seq(list(range(4)))
        assert mgr.allocate_blocks_for(seq, 4)
        assert 0 not in seq.block_ids()

    def test_allocate_grows_capacity(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=16, block_size=4, enable_prefix_cache=False))
        seq = make_seq(list(range(10)))
        assert mgr.allocate_blocks_for(seq, 10)
        assert seq.kv_cache_capacity == 12  # 3 blocks of 4
        assert mgr.allocate_blocks_for(seq, 13)
        assert seq.kv_cache_capacity == 16

    def test_out_of_blocks(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=3, block_size=4, enable_prefix_cache=False))
        # one block is the reserved padding block -> 2 usable
        seq = make_seq(list(range(12)))
        assert not mgr.allocate_blocks_for(seq, 12)

    def test_deallocate_returns_blocks(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=8, block_size=4, enable_prefix_cache=False))
        seq = make_seq(list(range(8)))
        assert mgr.allocate_blocks_for(seq, 8)
        free_before = mgr.num_free_blocks
        mgr.deallocate(seq)
        assert mgr.num_free_blocks == free_before + 2
        assert seq.blocks == []

    def test_prefix_cache_sharing(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=32, block_size=4))
        prompt = list(range(16))
        seq1 = make_seq(prompt)
        assert mgr.allocate_blocks_for(seq1, 16)
        seq1.commit_kv_cache(16)
        blocks1 = seq1.block_ids()
        mgr.deallocate(seq1)  # caches the blocks

        seq2 = make_seq(prompt + [99, 100])
        assert mgr.allocate_blocks_for(seq2, 18)
        # All 4 cached blocks are shared (the matchable prefix is the first
        # 17 tokens; the cached path covers tokens 0..15).
        assert seq2.block_ids()[:4] == blocks1
        assert seq2.num_kv_cache_tokens() == 16

        # A seq with the *same* prompt must leave the last token uncached so
        # its logits are recomputed: only 3 of 4 blocks match (15 tokens -> 3).
        seq3 = make_seq(prompt)
        assert mgr.allocate_blocks_for(seq3, 16)
        assert seq3.block_ids()[:3] == blocks1[:3]
        assert seq3.num_kv_cache_tokens() == 12

    def test_kv_cache_slots(self):
        mgr = BlockManager(BlockManagerOptions(num_blocks=8, block_size=4, enable_prefix_cache=False))
        seq = make_seq(list(range(6)))
        assert mgr.allocate_blocks_for(seq, 6)
        ids = seq.block_ids()
        slots = seq.kv_cache_slots(0, 6)
        assert slots == [
            ids[0] * 4 + 0, ids[0] * 4 + 1, ids[0] * 4 + 2, ids[0] * 4 + 3,
            ids[1] * 4 + 0, ids[1] * 4 + 1,
        ]
