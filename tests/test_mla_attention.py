"""Parity tests for the MLA K-only-cache attention ops
(ops/mla_attention.py): the Pallas decode kernel (interpret mode) and the
jnp prefill path against each other and against brute-force attention."""

import numpy as np
import pytest

import jax.numpy as jnp

from scalellm_tpu.ops.mla_attention import (
    mla_decode_attention,
    ref_mla_paged_attention,
    set_latent_cache,
)


def _brute(q, k_rows, v_dim, sm_scale, kv_len):
    """Plain MQA attention over the first kv_len latent rows."""
    k = k_rows[:kv_len].astype(np.float32)
    sc = q.astype(np.float32) @ k.T * sm_scale  # [H, kv_len]
    sc = sc - sc.max(axis=1, keepdims=True)
    p = np.exp(sc)
    p /= p.sum(axis=1, keepdims=True)
    return p @ k[:, :v_dim]


def _setup(rng, S, H, Dc, ps, pps, kv_lens, dtype="float32"):
    P = S * pps + 1
    q = (rng.standard_normal((S, H, Dc)) * 0.2).astype(np.float32)
    pages = np.zeros((P, ps, 1, Dc), np.float32)
    pi = np.zeros((S, pps), np.int32)
    rows = []
    for i in range(S):
        pi[i] = 1 + i * pps + np.arange(pps)
        r = (rng.standard_normal((pps * ps, Dc)) * 0.2).astype(np.float32)
        pages[pi[i]] = r.reshape(pps, ps, 1, Dc)
        rows.append(r)
    return (
        q.astype(dtype),
        pages.astype(dtype),
        np.asarray(kv_lens, np.int32),
        pi,
        rows,
    )


@pytest.mark.parametrize("v_dim", [128, 256])
def test_decode_kernel_vs_brute(v_dim):
    rng = np.random.default_rng(0)
    S, H, Dc, ps, pps = 3, 8, 384, 4, 16
    kv_lens = [30, 7, 0]
    q, pages, kl, pi, rows = _setup(rng, S, H, Dc, ps, pps, kv_lens)
    got = np.asarray(
        mla_decode_attention(
            jnp.asarray(q), jnp.asarray(pages), jnp.asarray(kl),
            jnp.asarray(pi), sm_scale=0.11, v_dim=v_dim, interpret=True,
        )
    )
    for i, kv_len in enumerate(kv_lens):
        if kv_len == 0:
            assert np.all(got[i] == 0)
            continue
        want = _brute(q[i], rows[i], v_dim, 0.11, kv_len)
        np.testing.assert_allclose(got[i], want, rtol=2e-2, atol=2e-2)


def test_ref_prefill_matches_brute_causal():
    rng = np.random.default_rng(1)
    S, H, Dc, ps, pps, v_dim = 2, 4, 256, 4, 8, 128
    kv_lens = [20, 11]
    q_lens = [20, 3]  # seq0 full prefill, seq1 chunked tail
    T = sum(q_lens)
    qs, pages, kl, pi, rows = _setup(rng, S, H, Dc, ps, pps, kv_lens)
    q = (rng.standard_normal((T, H, Dc)) * 0.2).astype(np.float32)
    cu = np.asarray([0, 20, 23], np.int32)
    got = np.asarray(
        ref_mla_paged_attention(
            jnp.asarray(q), jnp.asarray(pages), jnp.asarray(kl),
            jnp.asarray(pi), jnp.asarray(cu), jnp.asarray([S], jnp.int32),
            sm_scale=0.13, v_dim=v_dim,
        )
    )
    t = 0
    for i in range(S):
        for j in range(q_lens[i]):
            pos = kv_lens[i] - q_lens[i] + j  # absolute position
            want = _brute(q[t], rows[i], v_dim, 0.13, pos + 1)
            np.testing.assert_allclose(got[t], want, rtol=2e-2, atol=2e-2)
            t += 1


def test_int8_latent_cache_roundtrip():
    rng = np.random.default_rng(2)
    S, H, Dc, ps, pps, v_dim = 1, 4, 256, 4, 4, 128
    q, pages, kl, pi, rows = _setup(rng, S, H, Dc, ps, pps, [10])
    pages_i8 = jnp.zeros(pages.shape, jnp.int8)
    scale = 1 / 64.0
    slot_ids = np.asarray(
        [pi[0][p // ps] * ps + p % ps for p in range(10)], np.int32
    )
    pages_i8 = set_latent_cache(
        pages_i8, jnp.asarray(rows[0][:10]), jnp.asarray(slot_ids), scale=scale
    )
    got = np.asarray(
        mla_decode_attention(
            jnp.asarray(q), pages_i8, jnp.asarray(kl), jnp.asarray(pi),
            sm_scale=0.1, v_dim=v_dim, k_scale=scale, interpret=True,
        )
    )
    want = _brute(q[0], rows[0], v_dim, 0.1, 10)
    np.testing.assert_allclose(got[0], want, rtol=8e-2, atol=8e-2)


def test_prefill_kernel_vs_ref():
    from scalellm_tpu.ops.mla_attention import mla_prefill_attention

    rng = np.random.default_rng(5)
    S, H, Dc, ps, pps, v_dim = 3, 4, 256, 4, 8, 128
    kv_lens = [20, 11, 0]
    q_lens = [20, 3, 0]  # full prefill + chunked tail + padded seq
    T = 32  # padded ragged batch (sum q_lens = 23)
    _, pages, kl, pi, rows = _setup(rng, S, H, Dc, ps, pps, kv_lens)
    q = (rng.standard_normal((T, H, Dc)) * 0.2).astype(np.float32)
    cu = np.asarray([0, 20, 23, 23], np.int32)
    got = np.asarray(
        mla_prefill_attention(
            jnp.asarray(q), jnp.asarray(pages), jnp.asarray(kl),
            jnp.asarray(pi), jnp.asarray(cu),
            sm_scale=0.13, v_dim=v_dim, block_q=8, interpret=True,
        )
    )
    want = np.asarray(
        ref_mla_paged_attention(
            jnp.asarray(q), jnp.asarray(pages), jnp.asarray(kl),
            jnp.asarray(pi), jnp.asarray(cu), jnp.asarray([2], jnp.int32),
            sm_scale=0.13, v_dim=v_dim,
        )
    )
    np.testing.assert_allclose(got[:23], want[:23], rtol=2e-2, atol=2e-2)
