"""KV swap-out preemption tests (memory/kv_swap.py): host pool accounting,
executor page roundtrip, and end-to-end correctness under forced preemption
(generation identical to an ample-memory run, with swap counters moving)."""

import numpy as np
import pytest

import tests.fixtures as fixtures
from scalellm_tpu.memory.kv_swap import HostKVPool, SwapEntry
from scalellm_tpu.utils.metrics import COUNTERS


def _entry(nbytes: int) -> SwapEntry:
    return SwapEntry(np.zeros(nbytes, np.int8).reshape(1, 1, 1, 1, nbytes), 7)


def test_pool_budget_and_lru():
    pool = HostKVPool(max_bytes=100)
    assert pool.put(1, _entry(40))
    assert pool.put(2, _entry(40))
    assert 1 in pool and 2 in pool
    # Third entry evicts the oldest (seq 1).
    assert pool.put(3, _entry(40))
    assert 1 not in pool and 2 in pool and 3 in pool
    assert pool.used_bytes == 80
    # Oversized entry is refused outright.
    assert not pool.put(4, _entry(200))
    e = pool.pop(2)
    assert e is not None and e.num_kv_tokens == 7
    assert pool.used_bytes == 40


def test_executor_page_roundtrip(tmp_path):
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    d = fixtures.make_tiny_llama(str(tmp_path / "m"))
    loader = HFModelLoader(d)
    model = ModelRegistry.get_causal_lm_factory(loader.model_type)(
        loader.model_args, ParallelConfig()
    )
    params = loader.load_params(model)
    ex = Executor(model, params)
    ex.init_kv_cache(num_blocks=16, block_size=4)

    # Paint distinct values into pages 3, 5, 6 via restore, then fetch.
    shape = np.asarray(ex.kv_cache.shape)
    page = np.zeros((shape[0], 3, *shape[2:]), np.float32)
    for i in range(3):
        page[:, i] = float(i + 1)
    ids = np.asarray([3, 5, 6], np.int32)
    ex.restore_pages(ids, page.astype(np.asarray(ex.kv_cache).dtype))
    got = ex.fetch_pages(ids)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), page
    )
    # Unrelated pages untouched.
    assert np.all(np.asarray(ex.fetch_pages(np.asarray([1], np.int32))) == 0)


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("swap_model"))
    return fixtures.make_tiny_llama(d, tokenizer=True)


def _generate(model_dir, host_swap_bytes, num_blocks):
    from scalellm_tpu import LLM, SamplingParams

    llm = LLM(
        model_dir,
        block_size=4,
        num_blocks=num_blocks,
        enable_prefix_cache=False,
        enable_cuda_graph=False,
        host_swap_bytes=host_swap_bytes,
        max_seqs_per_batch=8,
    )
    prompts = [f"prompt {i} " + "x" * 24 for i in range(4)]
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True),
    )
    del llm
    return [tuple(o.outputs[0].token_ids) for o in outs]


def test_e2e_preemption_with_swap(tiny_model):
    # Ample memory: no preemption — the ground truth.
    want = _generate(tiny_model, host_swap_bytes=0, num_blocks=256)

    # Tight memory + swap: preemption must stage/restore KV, outputs
    # identical to the ample-memory run.
    swap_out_before = COUNTERS.get("num_swap_out")
    swap_in_before = COUNTERS.get("num_swap_in")
    got = _generate(tiny_model, host_swap_bytes=64 << 20, num_blocks=40)
    assert got == want
    assert COUNTERS.get("num_swap_out") > swap_out_before
    assert COUNTERS.get("num_swap_in") > swap_in_before

    # Tight memory without swap (reference recompute behavior) must also
    # produce identical outputs — swap is an optimization, not semantics.
    got2 = _generate(tiny_model, host_swap_bytes=0, num_blocks=40)
    assert got2 == want


def test_swap_aware_victim_selection():
    """At equal priority, preemption prefers the victim whose pages fit in
    the host pool's free space (staging it evicts nothing), over the
    equal-priority victim that would LRU-evict earlier staged entries."""
    from scalellm_tpu.request.request import Priority
    from tests.test_scheduler import FakeLLMEngine, make_request, make_scheduler

    engine = FakeLLMEngine(num_blocks=12, block_size=4)

    class StubSwapper:
        def __init__(self):
            self.fits = {}
            self.swapped = []

        def has_entry(self, seq):
            return False

        def staging_fits(self, seq):
            return self.fits.get(seq.seq_id, True)

        def swap_out(self, seq):
            self.swapped.append(seq.seq_id)
            return False  # fall through to plain deallocate

        def finalize_staging(self):
            pass

        def discard(self, seq):
            pass

    engine.kv_swapper = StubSwapper()
    engine, sched = make_scheduler(engine, max_seqs_per_batch=8)

    # Two running LOW requests occupying blocks; then a HIGH request that
    # needs preemption. Mark r1's seq as NOT fitting the pool, r2's as
    # fitting: r2 must be chosen despite r1 being the younger arrival
    # (plain FCFS-reversed would have picked r1).
    outs = []
    r2 = make_request("b" * 16, max_tokens=8, on_output=outs.append, priority=Priority.LOW)
    r1 = make_request("a" * 16, max_tokens=8, on_output=outs.append, priority=Priority.LOW)
    sched.schedule(r2)
    sched.schedule(r1)
    sched.step()  # both prefill, holding blocks
    engine.kv_swapper.fits = {
        r1.sequences[0].seq_id: False,
        r2.sequences[0].seq_id: True,
    }
    high = make_request("c" * 24, max_tokens=1, on_output=outs.append, priority=Priority.HIGH)
    sched.schedule(high)
    sched.step()
    assert engine.kv_swapper.swapped, "preemption should have staged a victim"
    assert engine.kv_swapper.swapped[0] == r2.sequences[0].seq_id
    sched.run_until_complete()
    assert len(outs) == 3 and all(o.finished for o in outs)
