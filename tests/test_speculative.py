"""Speculative decoding tests (mirrors the reference's
rejection_sampler_test.cpp + speculative engine behavior)."""

import numpy as np
import pytest

import tests.fixtures as fixtures


# ---------------------------------------------------------------- sampler


def test_rejection_sampler_greedy_accepts_matching():
    from scalellm_tpu.speculative.rejection_sampler import rejection_sample

    S, k, V = 2, 3, 8
    rng = np.random.default_rng(0)
    target = rng.random((S, k + 1, V)).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    tgt_argmax = target[:, :k].argmax(-1)

    # seq 0: drafts all match argmax -> all accepted + bonus
    # seq 1: first draft wrong -> resample at 0
    draft_ids = tgt_argmax.copy()
    draft_ids[1, 0] = (tgt_argmax[1, 0] + 1) % V
    draft_probs = np.full((S, k, V), 1.0 / V, np.float32)

    out = np.asarray(
        rejection_sample(
            draft_ids.astype(np.int32),
            draft_probs,
            target,
            np.zeros(S, bool),
            np.arange(S, dtype=np.uint32),
        )
    )
    # seq 0: k accepted + bonus (bonus = argmax of last target distribution)
    assert list(out[0, :k]) == list(tgt_argmax[0])
    assert out[0, k] == target[0, k].argmax()
    # seq 1: rejected at 0 -> greedy replacement = argmax(p_target) (NOT the
    # residual distribution — reference RejectionSampler::greedy_sample;
    # anything else breaks greedy spec-decode losslessness) then -1 padding
    assert out[1, 0] == tgt_argmax[1, 0]
    assert all(out[1, 1:] == -1)


def test_rejection_sampler_random_statistics():
    """With draft == target distribution, acceptance probability is ~1."""
    from scalellm_tpu.speculative.rejection_sampler import rejection_sample

    S, k, V = 256, 2, 4
    rng = np.random.default_rng(1)
    p = rng.random((V,)).astype(np.float32)
    p /= p.sum()
    target = np.tile(p, (S, k + 1, 1))
    draft_probs = np.tile(p, (S, k, 1))
    draft_ids = rng.integers(0, V, (S, k)).astype(np.int32)

    out = np.asarray(
        rejection_sample(
            draft_ids, draft_probs, target,
            np.ones(S, bool), np.arange(S, dtype=np.uint32),
        )
    )
    accept_frac = (out[:, :k] == draft_ids).mean()
    assert accept_frac > 0.95  # identical distributions accept w.p. 1


# ---------------------------------------------------------------- engine


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama_spec")
    return fixtures.make_tiny_llama(str(d), tokenizer=True)


def test_speculative_greedy_over_tp_mesh(tiny_model):
    """The fused speculative program composes with tensor parallelism: one
    shard_map runs draft scan + target verify over the mesh (the round-1
    executor hard-asserted mesh is None here)."""
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from scalellm_tpu import LLM, SamplingParams

    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    plain = LLM(
        tiny_model, block_size=4, num_blocks=256, enable_cuda_graph=False
    )
    expected = plain.generate(["hello world"], sp)[0].outputs[0].token_ids
    del plain

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2), ("dp", "tp"))
    spec = LLM(
        tiny_model, draft_model=tiny_model, num_speculative_tokens=3,
        block_size=4, num_blocks=256, enable_cuda_graph=False,
        tp_size=2, mesh=mesh,
    )
    got = spec.generate(["hello world"], sp)[0].outputs[0].token_ids
    assert got == expected


def test_speculative_fallback_on_irregular_kv_lag(tiny_model):
    """A sequence entering a spec round with target KV lag != 1 (e.g. after
    preemption) must fall back to a plain step, not crash (round-1 hard
    assert)."""
    from scalellm_tpu.engine.llm_engine import EngineOptions
    from scalellm_tpu.request.sequence import EngineType
    from scalellm_tpu.speculative.speculative_engine import SpeculativeEngine
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams as SP

    eng = SpeculativeEngine(EngineOptions(
        model_path=tiny_model, draft_model_path=tiny_model,
        num_speculative_tokens=2, block_size=4, num_blocks=64,
        warmup=False,
    ))
    seq = Sequence(
        0, [1, 2, 3], SP(max_tokens=8, ignore_eos=True),
        StoppingCriteria(max_tokens=8, ignore_eos=True),
    )
    # allocate blocks for prompt + 1 + spec overhead
    eng.block_manager.allocate_blocks_for(seq, 8)
    b = Batch()
    b.add(seq, 3)
    eng.execute_model(b)  # prefill (mixed path)
    assert seq.num_tokens == 4
    # Simulate preemption-induced rewind: target KV lags by 2, while the
    # draft counter still claims lag 1 — a decode-shaped batch entry now
    # violates the fused-round precondition and must take the fallback.
    seq._num_kv_cache_tokens[EngineType.LLM] = 2
    seq.engine_type = EngineType.SSM  # batch.add accounts under SSM (lag 1)
    b2 = Batch()
    b2.add(seq, 1)
    eng.execute_model(b2)  # round-1 code: AssertionError; now: plain step
    assert seq.num_tokens >= 4


def test_speculative_greedy_matches_plain(tiny_model):
    """Draft == target + greedy: every draft is accepted and the output
    must equal non-speculative greedy decoding."""
    from scalellm_tpu import LLM, SamplingParams

    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)

    plain = LLM(
        tiny_model, block_size=4, num_blocks=256, enable_cuda_graph=False
    )
    expected = plain.generate(["hello world"], sp)[0].outputs[0].token_ids
    del plain

    from scalellm_tpu.utils.metrics import COUNTERS

    drafted0 = COUNTERS.get("num_draft_tokens_total")
    accepted0 = COUNTERS.get("num_accepted_tokens_total")
    spec = LLM(
        tiny_model,
        draft_model=tiny_model,
        num_speculative_tokens=3,
        block_size=4,
        num_blocks=256,
        enable_cuda_graph=False,
    )
    out = spec.generate(["hello world"], sp)[0]
    assert out.outputs[0].token_ids == expected
    assert out.usage.num_generated_tokens == 12

    # acceptance counters: identical models accept every draft
    from scalellm_tpu.utils.metrics import COUNTERS

    drafted = COUNTERS.get("num_draft_tokens_total") - drafted0
    accepted = COUNTERS.get("num_accepted_tokens_total") - accepted0
    assert drafted > 0
    assert accepted >= drafted  # k accepted + bonus each step


def test_speculative_concurrent_requests(tiny_model):
    """Several concurrent spec requests through the scheduler (mixed
    prefill/decode steps exercise the non-speculative fallback path too)."""
    from scalellm_tpu import LLM, SamplingParams

    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    plain = LLM(tiny_model, block_size=4, num_blocks=512, enable_cuda_graph=False)
    prompts = ["hello world", "abc", "the quick brown fox"]
    expected = [o.outputs[0].token_ids for o in plain.generate(prompts, sp)]
    del plain

    spec = LLM(
        tiny_model, draft_model=tiny_model, num_speculative_tokens=2,
        block_size=4, num_blocks=512, enable_cuda_graph=False,
        max_tokens_per_batch=512, max_seqs_per_batch=8,
    )
    outs = spec.generate(prompts, sp)
    got = [o.outputs[0].token_ids for o in outs]
    assert got == expected
