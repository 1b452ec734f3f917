"""Native C++ KV store: behavior parity vs the pure-Python BlockManager
(differential testing — the Python implementation is the reference)."""

import random

import pytest

from scalellm_tpu.memory.block_manager import BlockManager, BlockManagerOptions
from scalellm_tpu.memory.native_block_manager import NativeBlockManager
from scalellm_tpu.native import load
from scalellm_tpu.request.sequence import Sequence
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.sampling.params import SamplingParams

pytestmark = pytest.mark.skipif(load() is None, reason="no native toolchain")


def make_seq(tokens):
    return Sequence(
        index=0,
        token_ids=tokens,
        sampling_params=SamplingParams(),
        stopping_criteria=StoppingCriteria(),
    )


def make_managers(num_blocks=32, block_size=4, prefix=True):
    opts = BlockManagerOptions(
        num_blocks=num_blocks, block_size=block_size, enable_prefix_cache=prefix
    )
    return BlockManager(opts), NativeBlockManager(opts)


def test_basic_allocate_release():
    py, nat = make_managers()
    for mgr in (py, nat):
        seq = make_seq(list(range(10)))
        assert mgr.allocate_blocks_for(seq, 10)
        assert seq.kv_cache_capacity >= 10
        seq.commit_kv_cache(10)
        mgr.deallocate(seq)
    assert py.num_free_blocks == nat.num_free_blocks
    assert py.num_blocks_in_prefix_cache == nat.num_blocks_in_prefix_cache


def test_prefix_cache_hit_parity():
    py, nat = make_managers()
    for mgr in (py, nat):
        s1 = make_seq(list(range(12)))
        assert mgr.allocate_blocks_for(s1, 12)
        s1.commit_kv_cache(12)
        mgr.deallocate(s1)
        # Same prompt: prefix served from cache.
        s2 = make_seq(list(range(12)))
        assert mgr.allocate_blocks_for(s2, 12)
        assert s2.num_kv_cache_tokens() == 8  # 2 full blocks of prompt[:11]
        mgr.deallocate(s2)


def test_exhaustion_and_eviction_parity():
    py, nat = make_managers(num_blocks=9, block_size=4)
    for mgr in (py, nat):
        # Fill the cache with a released sequence, then demand everything.
        s1 = make_seq(list(range(16)))
        assert mgr.allocate_blocks_for(s1, 16)
        s1.commit_kv_cache(16)
        mgr.deallocate(s1)
        s2 = make_seq(list(range(100, 132)))
        assert mgr.allocate_blocks_for(s2, 32)  # forces eviction
        assert not mgr.allocate_blocks_for(make_seq(list(range(200, 232))), 32)
        mgr.deallocate(s2)


def test_randomized_differential():
    """Random workload: allocation results and counters must match between
    the Python and native managers at every step."""
    rng = random.Random(7)
    py, nat = make_managers(num_blocks=24, block_size=4)
    live = []
    for step in range(300):
        op = rng.random()
        if op < 0.5 or not live:
            n = rng.randint(1, 20)
            prompt = [rng.randint(0, 8) for _ in range(n)]
            sp, sn = make_seq(list(prompt)), make_seq(list(prompt))
            ok_p = py.allocate_blocks_for(sp, n)
            ok_n = nat.allocate_blocks_for(sn, n)
            assert ok_p == ok_n, f"step {step}: alloc mismatch"
            if ok_p:
                assert sp.num_kv_cache_tokens() == sn.num_kv_cache_tokens(), (
                    f"step {step}: prefix hit mismatch"
                )
                target = min(n, sp.kv_cache_capacity)
                sp.commit_kv_cache(target - sp.num_kv_cache_tokens())
                sn.commit_kv_cache(target - sn.num_kv_cache_tokens())
                live.append((sp, sn))
        else:
            idx = rng.randrange(len(live))
            sp, sn = live.pop(idx)
            py.deallocate(sp)
            nat.deallocate(sn)
        assert py.num_free_blocks == nat.num_free_blocks, f"step {step}"
        assert (
            py.num_blocks_in_prefix_cache == nat.num_blocks_in_prefix_cache
        ), f"step {step}"
