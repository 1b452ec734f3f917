"""Async pipelined scheduling: dispatch step N+1 (device-side token
feedback) before resolving step N. Correctness contract: outputs are
IDENTICAL to sync scheduling for every eligible request, and ineligible
requests (penalties/guided/prompt-logprobs) transparently fall back."""

import pytest

from scalellm_tpu.request.output import FinishReason
from scalellm_tpu.request.stopping import StoppingCriteria
from scalellm_tpu.request.sequence import Sequence
from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.utils.metrics import COUNTERS


# ----------------------------------------------------------- sequence units


def _seq(max_tokens=8, prompt=(1, 2, 3)):
    return Sequence(
        index=0,
        token_ids=list(prompt),
        sampling_params=SamplingParams(max_tokens=max_tokens),
        stopping_criteria=StoppingCriteria(
            max_tokens=max_tokens, max_context_len=64, eos_token_id=9
        ),
    )


def test_pending_append_resolve():
    s = _seq()
    s.append_pending_token(src_row=5)
    assert s.has_pending and s.num_tokens == 4 and s.num_resolved_tokens == 3
    assert s.num_generated_tokens == 0  # pending doesn't count user-facing
    assert s.pending_src == 5
    assert not s.is_finished()  # finish evaluates the resolved prefix only
    s.resolve_pending_token(7)
    assert not s.has_pending
    assert s.token_ids == [1, 2, 3, 7]
    assert s.token_counts[7] == 1
    assert s.num_generated_tokens == 1


def test_pending_pop_overshoot():
    s = _seq()
    s.append_pending_token(src_row=0)
    s.resolve_pending_token(9)  # eos
    s.append_pending_token(src_row=0)  # overshoot from the in-flight step
    assert s.is_finished()  # resolved prefix ends in eos
    s.pop_pending_token()
    assert s.token_ids == [1, 2, 3, 9]
    assert s.finish_reason() == FinishReason.STOP


def test_would_finish_by_length():
    s = _seq(max_tokens=1)
    assert not s.would_finish_by_length()
    s.append_pending_token(src_row=0)
    assert s.would_finish_by_length()


# ------------------------------------------------------- engine equivalence


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import tests.fixtures as fixtures

    d = str(tmp_path_factory.mktemp("tiny_async"))
    fixtures.make_tiny_llama(d, tokenizer=True)
    return d


def _generate(model_dir, prompts, sps, async_on, **kw):
    from scalellm_tpu import LLM

    kw.setdefault("num_blocks", 256)
    llm = LLM(
        model_dir,
        block_size=4,
        enable_cuda_graph=False,
        enable_async_scheduling=async_on,
        **kw,
    )
    if len(sps) == 1:
        sps = sps * len(prompts)
    outs = llm.generate(prompts, sps)
    texts = []
    for o in outs:
        texts.append([(so.text, so.finish_reason) for so in o.outputs])
    return texts


def test_async_matches_sync_greedy(model_dir):
    prompts = ["hello world", "abcdef", "xyz xyz xyz", "q"]
    sps = [SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)]
    base = COUNTERS.get("num_async_steps")
    sync = _generate(model_dir, prompts, sps, async_on=False)
    mid = COUNTERS.get("num_async_steps")
    assert mid == base, "sync run must not take async steps"
    asy = _generate(model_dir, prompts, sps, async_on=True)
    assert COUNTERS.get("num_async_steps") > mid, "async steps not exercised"
    assert asy == sync


def test_async_matches_sync_sampled(model_dir):
    # seeded sampling is deterministic given the same step counters — but
    # step counters differ per engine instance; use per-request seeds and
    # greedy-equivalent temperature 0 rows mixed with seeded rows
    prompts = ["the quick", "brown fox"]
    sps = [
        SamplingParams(max_tokens=10, temperature=0.0),
        SamplingParams(max_tokens=10, temperature=0.8, seed=1234),
    ]
    sync = _generate(model_dir, prompts, sps, async_on=False)
    asy = _generate(model_dir, prompts, sps, async_on=True)
    # greedy row must match exactly; the seeded row's seed folds in the
    # engine step counter, which legitimately differs between runs
    assert asy[0] == sync[0]


def test_async_fallback_penalties(model_dir):
    prompts = ["penalty test"]
    sps = [
        SamplingParams(
            max_tokens=8, temperature=0.0, repetition_penalty=1.3,
            ignore_eos=True,
        )
    ]
    sync = _generate(model_dir, prompts, sps, async_on=False)
    asy = _generate(model_dir, prompts, sps, async_on=True)
    assert asy == sync


def test_async_with_logprobs(model_dir):
    from scalellm_tpu import LLM

    llm = LLM(
        model_dir, num_blocks=256, block_size=4, enable_cuda_graph=False,
        enable_async_scheduling=True,
    )
    out = llm.generate(
        ["logprob run"],
        [SamplingParams(max_tokens=6, temperature=0.0, logprobs=True,
                        top_logprobs=3, ignore_eos=True)],
    )[0]
    lps = out.outputs[0].logprobs
    assert lps and len(lps) == 6
    assert all(lp.top_logprobs and len(lp.top_logprobs) == 3 for lp in lps)


def test_async_stop_token_hidden(model_dir):
    """EOS mid-pipeline: the overshoot sample is dropped and text matches."""
    from scalellm_tpu import LLM

    llm = LLM(
        model_dir, num_blocks=256, block_size=4, enable_cuda_graph=False,
        enable_async_scheduling=True,
    )
    # greedy with no ignore_eos: find whatever token greedy emits at step 3
    # and declare it a stop token, forcing a mid-pipeline stop
    probe = llm.generate(
        ["stop probe"],
        [SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)],
    )[0]
    llm2 = LLM(
        model_dir, num_blocks=256, block_size=4, enable_cuda_graph=False,
        enable_async_scheduling=True,
    )
    tokens = llm2._handler.encode(probe.outputs[0].text)
    stop_tok = tokens[2]
    out = llm2.generate(
        ["stop probe"],
        [SamplingParams(max_tokens=6, temperature=0.0,
                        stop_token_ids=[stop_tok])],
    )[0]
    so = out.outputs[0]
    assert so.finish_reason == FinishReason.STOP
    assert llm2._handler.encode(probe.outputs[0].text)[2] == stop_tok


def test_async_preemption_pressure(model_dir):
    """Tiny KV pool forces allocation pressure mid-pipeline: the scheduler
    must fall back to sync preemption and still finish everything."""
    prompts = [f"req {i} pad pad pad" for i in range(6)]
    sps = [SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)]
    sync = _generate(model_dir, prompts, sps, async_on=False, num_blocks=40)
    asy = _generate(model_dir, prompts, sps, async_on=True, num_blocks=40)
    assert asy == sync


def test_async_n_expansion(model_dir):
    """n>1 defers expansion while a step is in flight but still completes."""
    from scalellm_tpu import LLM

    llm = LLM(
        model_dir, num_blocks=256, block_size=4, enable_cuda_graph=False,
        enable_async_scheduling=True,
    )
    out = llm.generate(
        ["expand me"],
        [SamplingParams(max_tokens=5, n=3, temperature=0.7, seed=7,
                        ignore_eos=True)],
    )[0]
    assert len(out.outputs) == 3
    assert all(len(so.text) > 0 for so in out.outputs)
