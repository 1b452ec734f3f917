"""Prompt-lookup (n-gram) speculative decoding: proposer unit tests +
greedy losslessness against the plain engine (trained fixture, so greedy
text has learnable repetition for the proposer to exploit)."""

import pytest

from scalellm_tpu.sampling.params import SamplingParams
from scalellm_tpu.speculative.ngram import propose_ngram
from scalellm_tpu.utils.metrics import COUNTERS


# ----------------------------------------------------------------- proposer


def test_propose_copies_continuation():
    #              0  1  2  3  4  5  6  7
    tokens = [5, 6, 7, 8, 9, 1, 5, 6]  # trailing (5, 6) matched at start
    assert propose_ngram(tokens, k=3) == [7, 8, 9]


def test_propose_prefers_longest_and_most_recent():
    tokens = [1, 2, 3, 50, 1, 2, 3, 60, 1, 2, 3]
    # trailing 3-gram (1,2,3) occurred at 0 and 4; most recent match (4)
    # continues with 60
    assert propose_ngram(tokens, k=2, max_n=4) == [60, 1]


def test_propose_no_match():
    assert propose_ngram([1, 2, 3, 4, 5], k=2) is None
    assert propose_ngram([1, 2], k=2) is None


def test_propose_pads_near_end():
    tokens = [7, 8, 9, 7, 8]  # match continues with only 9 then runs out
    assert propose_ngram(tokens, k=3, min_n=2) == [9, 7, 8]


# ------------------------------------------------------------- engine level


@pytest.fixture(scope="module")
def trained_dir():
    import tests.fixtures as fixtures

    return fixtures.trained_tiny_llama_cached()


def _gen(model_dir, num_spec, prompts, max_tokens=24, **sp_kw):
    from scalellm_tpu import LLM

    llm = LLM(
        model_dir,
        num_blocks=512,
        block_size=4,
        enable_cuda_graph=False,
        num_speculative_tokens=num_spec,
    )
    outs = llm.generate(
        prompts,
        [SamplingParams(max_tokens=max_tokens, temperature=0.0,
                        ignore_eos=True, **sp_kw)] * len(prompts),
    )
    return [o.outputs[0].text for o in outs]


def test_ngram_greedy_lossless(trained_dir):
    prompts = ["the cat sat on the mat. the cat", "a b c a b", "hello hello"]
    plain = _gen(trained_dir, 0, prompts)
    accepted_before = COUNTERS.get("num_accepted_tokens_total")
    spec = _gen(trained_dir, 3, prompts)
    assert spec == plain
    # the proposer must have actually fired and accepted something on this
    # repetitive input (trained model continues repetitions)
    assert COUNTERS.get("num_accepted_tokens_total") > accepted_before


def test_ngram_with_prefill_chunks(trained_dir):
    # prompt long enough to exercise chunked prefill + spec decode together
    prompts = ["the quick brown fox " * 12]
    plain = _gen(trained_dir, 0, prompts, max_tokens=16)
    spec = _gen(trained_dir, 4, prompts, max_tokens=16)
    assert spec == plain


def test_ngram_sampled_runs(trained_dir):
    from scalellm_tpu import LLM

    llm = LLM(trained_dir, num_blocks=512, block_size=4,
              enable_cuda_graph=False, num_speculative_tokens=3)
    outs = llm.generate(
        ["repeat repeat repeat"],
        [SamplingParams(max_tokens=20, temperature=0.8, seed=5,
                        ignore_eos=True)],
    )
    assert outs[0].outputs[0].text
