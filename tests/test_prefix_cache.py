"""Prefix-cache trie tests (intent mirrors reference prefix_cache_test.cpp)."""

from scalellm_tpu.memory.block_allocator import BlockAllocator
from scalellm_tpu.memory.prefix_cache import PrefixCache


def setup():
    alloc = BlockAllocator(total_blocks=64, block_size=4)
    cache = PrefixCache(block_size=4)
    return alloc, cache


def test_insert_and_exact_match():
    alloc, cache = setup()
    tokens = list(range(8))
    blocks = alloc.allocate_many(2)
    added = cache.insert(tokens, blocks)
    assert added == 2
    assert cache.num_blocks == 2

    matched = cache.match(tokens)
    assert [b.id for b in matched] == [b.id for b in blocks]
    for b in matched:
        b.dec_ref()


def test_partial_match_block_aligned():
    alloc, cache = setup()
    tokens = list(range(12))
    blocks = alloc.allocate_many(3)
    cache.insert(tokens, blocks)

    # Query shares only the first 6 tokens -> only 1 full block matches.
    query = list(range(6)) + [99] * 6
    matched = cache.match(query)
    assert len(matched) == 1
    assert matched[0].id == blocks[0].id
    for b in matched:
        b.dec_ref()


def test_no_match():
    alloc, cache = setup()
    cache.insert(list(range(8)), alloc.allocate_many(2))
    assert cache.match([100, 101, 102, 103]) == []


def test_node_split_on_divergent_insert():
    alloc, cache = setup()
    a = alloc.allocate_many(3)
    cache.insert(list(range(12)), a)
    # Insert a second path sharing first 2 blocks then diverging. As in real
    # usage (BlockManager.cache_blocks_for), the full aligned block list is
    # passed: shared blocks first, then the divergent one.
    b = alloc.allocate_many(1)
    tokens2 = list(range(8)) + [50, 51, 52, 53]
    added = cache.insert(tokens2, [a[0], a[1], b[0]])
    assert added == 1
    assert cache.num_blocks == 4

    m1 = cache.match(list(range(12)))
    assert [x.id for x in m1] == [x.id for x in a]
    m2 = cache.match(tokens2)
    assert [x.id for x in m2] == [a[0].id, a[1].id, b[0].id]
    for x in m1 + m2:
        x.dec_ref()


def test_evict_lru():
    alloc, cache = setup()
    a = alloc.allocate_many(2)
    b = alloc.allocate_many(2)
    cache.insert([1, 2, 3, 4, 5, 6, 7, 8], a)
    cache.insert([11, 12, 13, 14, 15, 16, 17, 18], b)
    # Cache owns the only refs now.
    for blk in a + b:
        blk.dec_ref()
    # Touch the first path so the second is LRU.
    m = cache.match([1, 2, 3, 4, 5, 6, 7, 8])
    for blk in m:
        blk.dec_ref()

    free_before = alloc.num_free_blocks
    evicted = cache.evict(2)
    assert evicted == 2
    assert cache.num_blocks == 2
    assert alloc.num_free_blocks == free_before + 2
    # The touched path must survive.
    m = cache.match([1, 2, 3, 4, 5, 6, 7, 8])
    assert len(m) == 2
    for blk in m:
        blk.dec_ref()


def test_evict_skips_in_use_blocks():
    alloc, cache = setup()
    a = alloc.allocate_many(2)
    cache.insert([1, 2, 3, 4, 5, 6, 7, 8], a)
    # Simulate a sequence still holding refs (we hold them here).
    evicted = cache.evict(2)
    assert evicted == 0
    assert cache.num_blocks == 2
    for blk in a:
        blk.dec_ref()
    assert cache.evict(2) == 2


def test_insert_divergent_block_same_first_token():
    """Regression: two prompts whose blocks share a first token but diverge
    mid-block ("o wo" vs "o ag") must not loop forever on insert."""
    from scalellm_tpu.memory.block_allocator import BlockAllocator
    from scalellm_tpu.memory.prefix_cache import PrefixCache

    alloc = BlockAllocator(total_blocks=32, block_size=4)
    cache = PrefixCache(4)
    a = [ord(c) for c in "hello world 1234"]
    b = [ord(c) for c in "hello again 5678"]
    blocks_a = alloc.allocate_many(4)
    blocks_b = alloc.allocate_many(4)
    assert cache.insert(a, blocks_a) == 4
    assert cache.insert(b, blocks_b) == 3  # shares the first block
    m = cache.match(b[:12])
    assert len(m) == 3  # "hell" (shared) + "o ag" + "ain "
    assert m[0].id == blocks_a[0].id
    assert m[1].id == blocks_b[1].id
    assert m[2].id == blocks_b[2].id
    for blk in m:
        blk.dec_ref()
