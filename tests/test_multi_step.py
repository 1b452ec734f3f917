"""Multi-step decode (SchedulerOptions.num_decode_steps): N autoregressive
micro-steps per dispatch as one device-side lax.scan.

Correctness bar: with greedy sampling, multi-step output must be IDENTICAL
to single-step output token-for-token — same model, same prompts, including
sequences that finish mid-window (EOS / max_tokens overshoot is discarded
host-side) and windows that cross KV page boundaries.
"""

import pytest

from tests.fixtures import make_tiny_llama, trained_tiny_llama_cached


def _generate(model_path, num_decode_steps, prompts, max_tokens, **kw):
    from scalellm_tpu import LLM, SamplingParams

    with LLM(
        model=model_path,
        num_blocks=128,
        block_size=16,
        enable_prefix_cache=False,
        num_decode_steps=num_decode_steps,
        **kw,
    ) as llm:
        sp = SamplingParams(max_tokens=max_tokens, temperature=0.0)
        outs = llm.generate(prompts, sp)
        return [o.outputs[0].text for o in outs]


def test_multi_step_matches_single_step_greedy(tmp_path):
    path = trained_tiny_llama_cached()
    prompts = ["the quick brown ", "once upon", "a"]
    base = _generate(path, 1, prompts, 40)
    multi = _generate(path, 4, prompts, 40)
    assert base == multi


def test_multi_step_max_tokens_not_multiple_of_n(tmp_path):
    """max_tokens=10 with N=4: the last window overshoots by 2 — the
    overshoot must be dropped and lengths must match exactly."""
    path = trained_tiny_llama_cached()
    base = _generate(path, 1, ["hello wor"], 10)
    multi = _generate(path, 4, ["hello wor"], 10)
    assert base == multi
    assert len(multi[0]) > 0


def test_multi_step_crosses_page_boundary(tmp_path):
    """48 tokens at block_size=16 with N=5: micro-step windows straddle
    page boundaries, exercising the in-graph slot recomputation."""
    path = trained_tiny_llama_cached()
    base = _generate(path, 1, ["the "], 48)
    multi = _generate(path, 5, ["the "], 48)
    assert base == multi


def test_multi_step_with_logprobs(tmp_path):
    from scalellm_tpu import LLM, SamplingParams

    path = trained_tiny_llama_cached()
    texts = {}
    lps = {}
    for n in (1, 4):
        with LLM(
            model=path, num_blocks=128, block_size=16,
            enable_prefix_cache=False, num_decode_steps=n,
        ) as llm:
            out = llm.generate(
                ["the quick"],
                SamplingParams(max_tokens=12, temperature=0.0, logprobs=True),
            )[0]
        texts[n] = out.outputs[0].text
        lps[n] = [lp.logprob for lp in out.outputs[0].logprobs]
    assert texts[1] == texts[4]
    assert lps[1] == pytest.approx(lps[4], abs=1e-4)


def test_multi_step_falls_back_for_penalties(tmp_path):
    """Penalty requests need per-token host feedback — the batch must route
    through the per-token path and still produce correct output."""
    from scalellm_tpu import LLM, SamplingParams

    path = trained_tiny_llama_cached()
    res = {}
    for n in (1, 4):
        with LLM(
            model=path, num_blocks=128, block_size=16,
            enable_prefix_cache=False, num_decode_steps=n,
        ) as llm:
            out = llm.generate(
                ["the quick"],
                SamplingParams(
                    max_tokens=16, temperature=0.0, repetition_penalty=1.3
                ),
            )[0]
        res[n] = out.outputs[0].text
    assert res[1] == res[4]


def test_multi_step_batch_of_mixed_lengths(tmp_path):
    """Different max_tokens in one batch: shorter sequences finish
    mid-window while longer ones keep decoding."""
    from scalellm_tpu import LLM, SamplingParams

    path = trained_tiny_llama_cached()
    res = {}
    for n in (1, 4):
        with LLM(
            model=path, num_blocks=128, block_size=16,
            enable_prefix_cache=False, num_decode_steps=n,
        ) as llm:
            outs = llm.generate(
                ["the quick", "once upon a time", "hello"],
                [
                    SamplingParams(max_tokens=3, temperature=0.0),
                    SamplingParams(max_tokens=21, temperature=0.0),
                    SamplingParams(max_tokens=9, temperature=0.0),
                ],
            )
        res[n] = [o.outputs[0].text for o in outs]
    assert res[1] == res[4]


def test_padding_block_zero_stays_reserved():
    """Multi-step overshoot safety: past-end micro-steps write KV through
    the zero-padded block-table tail into page 0, which is only safe while
    page 0 stays reserved. Pin that invariant in BOTH block managers
    (reference analog: block_manager.cpp:40-42 block-0 padding)."""
    import pytest

    from scalellm_tpu.memory.block_allocator import BlockAllocator
    from scalellm_tpu.memory.block_manager import BlockManager, BlockManagerOptions

    alloc = BlockAllocator(8, 16)
    b0 = alloc.allocate()
    assert b0.id == 0
    alloc.reserve(0)
    with pytest.raises(AssertionError):
        alloc.free(0)

    mgr = BlockManager(BlockManagerOptions(num_blocks=8, block_size=16))
    assert mgr._padding_block.ref_count >= 1


def test_multi_step_native_manager_keeps_page_zero(tmp_path):
    """End-to-end: a multi-step run through the NATIVE block manager must
    leave block 0 referenced (never recycled into the free pool)."""
    from scalellm_tpu.native import load

    if load() is None:
        import pytest

        pytest.skip("native extension not built")
    from scalellm_tpu import LLM, SamplingParams
    from scalellm_tpu.memory.native_block_manager import NativeBlockManager

    path = trained_tiny_llama_cached()
    with LLM(
        model=path, num_blocks=64, block_size=16,
        enable_prefix_cache=False, num_decode_steps=4,
    ) as llm:
        mgr = llm._handler.engine.block_manager
        assert isinstance(mgr, NativeBlockManager)
        llm.generate(
            ["the quick brown", "once"],
            SamplingParams(max_tokens=21, temperature=0.0),
        )
        assert mgr._store.ref_count(0) >= 1
        assert mgr.num_free_blocks < 64  # block 0 + allocations accounted
