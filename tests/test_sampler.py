"""Sampler / logits-processor unit tests (mirrors the reference's
src/sampling/sampler_test.cpp and logits_processor_test.cpp)."""

import numpy as np
import pytest


def make_si(S, V, **kw):
    import jax.numpy as jnp

    from scalellm_tpu.engine.params import SamplingInputs

    U = kw.get("U", 4)
    defaults = dict(
        temperatures=np.zeros(S, np.float32),
        top_ks=np.zeros(S, np.int32),
        top_ps=np.ones(S, np.float32),
        frequency_penalties=np.zeros(S, np.float32),
        presence_penalties=np.zeros(S, np.float32),
        repetition_penalties=np.ones(S, np.float32),
        unique_token_ids=np.zeros((S, U), np.int32),
        unique_token_counts=np.zeros((S, U), np.int32),
        bias_token_ids=np.zeros((S, U), np.int32),
        bias_values=np.zeros((S, U), np.float32),
        allowed_mask=np.full((S, 1), 0xFFFFFFFF, np.uint32),
        seeds=np.arange(S, dtype=np.uint32),
    )
    for k, v in kw.items():
        if k != "U":
            defaults[k] = v
    return SamplingInputs(**{k: jnp.asarray(v) for k, v in defaults.items()})


def test_greedy_picks_argmax():
    from scalellm_tpu.sampling.sampler import sample_tokens

    logits = np.array([[0.1, 3.0, 0.5, -1.0], [2.0, 0.0, 0.0, 0.0]], np.float32)
    outs = sample_tokens(logits, make_si(2, 4))
    assert list(np.asarray(outs.next_tokens)) == [1, 0]


def test_logprobs_are_log_softmax():
    from scalellm_tpu.sampling.sampler import sample_tokens

    logits = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    outs = sample_tokens(logits, make_si(1, 4), max_top_logprobs=2)
    lp = np.asarray(outs.logprobs)[0]
    expected = np.log(np.exp(4.0) / np.exp([1.0, 2.0, 3.0, 4.0]).sum())
    np.testing.assert_allclose(lp, expected, rtol=1e-5)
    top_ids = np.asarray(outs.top_ids)[0]
    assert list(top_ids) == [3, 2]


def test_frequency_presence_penalties():
    from scalellm_tpu.sampling.sampler import apply_frequency_presence_penalties

    logits = np.zeros((1, 6), np.float32)
    import jax.numpy as jnp

    out = apply_frequency_presence_penalties(
        jnp.asarray(logits),
        jnp.asarray([[2, 4, 0, 0]], np.int32),
        jnp.asarray([[3, 1, 0, 0]], np.int32),
        jnp.asarray([0.5], np.float32),
        jnp.asarray([0.25], np.float32),
    )
    out = np.asarray(out)
    # token 2: -(3*0.5 + 0.25) = -1.75 ; token 4: -(0.5 + 0.25) = -0.75
    np.testing.assert_allclose(out[0, 2], -1.75, rtol=1e-6)
    np.testing.assert_allclose(out[0, 4], -0.75, rtol=1e-6)
    # untouched tokens (incl. padding id 0 with count 0)
    assert out[0, 0] == 0.0 and out[0, 1] == 0.0


def test_repetition_penalty_divides_positive_multiplies_negative():
    import jax.numpy as jnp

    from scalellm_tpu.sampling.sampler import apply_repetition_penalty

    logits = np.array([[2.0, -2.0, 1.0]], np.float32)
    out = apply_repetition_penalty(
        jnp.asarray(logits),
        jnp.asarray([[0, 1, 0]], np.int32),
        jnp.asarray([[1, 1, 0]], np.int32),
        jnp.asarray([2.0], np.float32),
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0], rtol=1e-6)


def test_top_k_masks_all_but_k():
    import jax.numpy as jnp

    from scalellm_tpu.sampling.sampler import apply_top_k_top_p

    logits = np.array([[1.0, 4.0, 3.0, 2.0]], np.float32)
    out = np.asarray(
        apply_top_k_top_p(
            jnp.asarray(logits),
            jnp.asarray([2], np.int32),
            jnp.asarray([1.0], np.float32),
        )
    )
    assert out[0, 1] == 4.0 and out[0, 2] == 3.0
    assert out[0, 0] < -1e29 and out[0, 3] < -1e29


def test_top_p_keeps_minimal_mass():
    import jax.numpy as jnp

    from scalellm_tpu.sampling.sampler import apply_top_k_top_p

    # probs ~ [0.643, 0.236, 0.087, 0.032]
    logits = np.array([[4.0, 3.0, 2.0, 1.0]], np.float32)
    out = np.asarray(
        apply_top_k_top_p(
            jnp.asarray(logits),
            jnp.asarray([0], np.int32),
            jnp.asarray([0.7], np.float32),
        )
    )
    # 0.643 < 0.7 so token 1 is also included; cum before token 2 is 0.879 > 0.7
    assert out[0, 0] == 4.0 and out[0, 1] == 3.0
    assert out[0, 2] < -1e29 and out[0, 3] < -1e29


def test_random_sampling_respects_top_k1():
    """top_k=1 forces the argmax even with temperature."""
    from scalellm_tpu.sampling.sampler import sample_tokens

    logits = np.array([[0.0, 5.0, 1.0, 2.0]], np.float32)
    si = make_si(
        1, 4,
        temperatures=np.array([1.0], np.float32),
        top_ks=np.array([1], np.int32),
    )
    outs = sample_tokens(logits, si)
    assert int(np.asarray(outs.next_tokens)[0]) == 1


def test_random_sampling_distribution():
    """Gumbel sampling roughly follows softmax probabilities."""
    from scalellm_tpu.sampling.sampler import sample_tokens

    S = 512
    logits = np.tile(np.array([[np.log(0.8), np.log(0.2)]], np.float32), (S, 1))
    si = make_si(
        S, 2,
        temperatures=np.ones(S, np.float32),
        seeds=np.arange(S, dtype=np.uint32),
    )
    outs = sample_tokens(logits, si)
    frac0 = (np.asarray(outs.next_tokens) == 0).mean()
    assert 0.7 < frac0 < 0.9


def test_logit_bias_bans_and_boosts():
    from scalellm_tpu.sampling.sampler import sample_tokens

    logits = np.array(
        [[0.1, 3.0, 0.5, -1.0], [0.1, 3.0, 0.5, -1.0]], np.float32
    )
    # Row 0: ban the argmax (token 1) and boost token 3; row 1: no bias
    # (padding entries id 0 / bias 0 must be no-ops).
    si = make_si(
        2, 4,
        bias_token_ids=np.array([[1, 3], [0, 0]], np.int32),
        bias_values=np.array([[-100.0, 6.0], [0.0, 0.0]], np.float32),
        U=2,
    )
    outs = sample_tokens(logits, si)
    assert list(np.asarray(outs.next_tokens)) == [3, 1]
