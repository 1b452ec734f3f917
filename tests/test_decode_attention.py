"""Parity tests for the in-house decode-specialized paged attention kernel
(ops/decode_attention.py) against the pure-jnp ragged reference, in Pallas
interpret mode on the CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from scalellm_tpu.ops.attention_ref import ref_ragged_paged_attention
from scalellm_tpu.ops.decode_attention import decode_paged_attention


def _make_case(
    rng, S, H, Hkv, D, page_size, pages_per_seq, kv_lens, kv_dtype="float32"
):
    P = S * pages_per_seq + 1
    q = rng.standard_normal((S, H, D)).astype(np.float32)
    kv = rng.standard_normal((P, page_size, 2 * Hkv, D)).astype(np.float32)
    if kv_dtype == "int8":
        kv = np.clip(np.round(kv * 16), -127, 127).astype(np.int8)
    else:
        kv = kv.astype(kv_dtype)
    # Sequence i owns pages [1 + i*pps, 1 + (i+1)*pps); page 0 is reserved.
    page_indices = np.zeros((S, pages_per_seq), np.int32)
    for i in range(S):
        page_indices[i] = 1 + i * pages_per_seq + np.arange(pages_per_seq)
    kv_lens = np.asarray(kv_lens, np.int32)
    return q, kv, kv_lens, page_indices


def _ref(q, kv, kv_lens, page_indices, **kw):
    S = q.shape[0]
    num_real = int(np.sum(kv_lens > 0))
    cu = np.arange(S + 1, dtype=np.int32)
    cu[num_real:] = num_real
    out = ref_ragged_paged_attention(
        jnp.asarray(q),
        jnp.asarray(kv),
        jnp.asarray(kv_lens),
        jnp.asarray(page_indices),
        jnp.asarray(cu),
        jnp.asarray([num_real], jnp.int32),
        **kw,
    )
    return np.asarray(out)


def _run(q, kv, kv_lens, page_indices, **kw):
    out = decode_paged_attention(
        jnp.asarray(q),
        jnp.asarray(kv),
        jnp.asarray(kv_lens),
        jnp.asarray(page_indices),
        interpret=True,
        **kw,
    )
    return np.asarray(out)


@pytest.mark.parametrize(
    "H,Hkv", [(8, 2), (8, 8), (4, 1)], ids=["gqa", "mha", "mqa"]
)
def test_parity_basic(H, Hkv):
    rng = np.random.default_rng(0)
    S, D, ps, pps = 3, 128, 4, 8
    kv_lens = [5, 32, 17]
    q, kv, kl, pi = _make_case(rng, S, H, Hkv, D, ps, pps, kv_lens)
    got = _run(q, kv, kl, pi, sm_scale=0.125)
    want = _ref(q, kv, kl, pi, sm_scale=0.125)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_parity_padded_seqs_and_multichunk():
    rng = np.random.default_rng(1)
    S, H, Hkv, D, ps, pps = 4, 8, 2, 128, 4, 16
    kv_lens = [64, 33, 0, 0]  # two padded tail sequences
    q, kv, kl, pi = _make_case(rng, S, H, Hkv, D, ps, pps, kv_lens)
    got = _run(q, kv, kl, pi, sm_scale=0.088, chunk_pages=2)
    want = _ref(q[:2], kv, kl[:2], pi[:2], sm_scale=0.088)
    np.testing.assert_allclose(got[:2], want, rtol=2e-2, atol=2e-2)
    assert np.all(got[2:] == 0)


def test_parity_bf16():
    rng = np.random.default_rng(2)
    S, H, Hkv, D, ps, pps = 2, 8, 2, 128, 4, 8
    q, kv, kl, pi = _make_case(
        rng, S, H, Hkv, D, ps, pps, [20, 31], kv_dtype="bfloat16"
    )
    got = _run(q.astype(jnp.bfloat16), kv, kl, pi, sm_scale=0.1)
    want = _ref(q.astype(jnp.bfloat16), kv, kl, pi, sm_scale=0.1)
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=5e-2, atol=5e-2
    )


def test_parity_int8_kv_scales():
    rng = np.random.default_rng(3)
    S, H, Hkv, D, ps, pps = 2, 8, 2, 128, 4, 8
    q, kv, kl, pi = _make_case(
        rng, S, H, Hkv, D, ps, pps, [9, 26], kv_dtype="int8"
    )
    kw = dict(sm_scale=0.11, k_scale=1 / 16.0, v_scale=1 / 16.0)
    got = _run(q, kv, kl, pi, **kw)
    want = _ref(q, kv, kl, pi, **kw)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_parity_soft_cap_and_window():
    rng = np.random.default_rng(4)
    S, H, Hkv, D, ps, pps = 2, 8, 2, 128, 4, 16
    q, kv, kl, pi = _make_case(rng, S, H, Hkv, D, ps, pps, [61, 40])
    kw = dict(sm_scale=0.12, soft_cap=30.0, sliding_window=24)
    got = _run(q, kv, kl, pi, **kw)
    want = _ref(
        q, kv, kl, pi, sm_scale=0.12, logit_soft_cap=30.0, sliding_window=24
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
