"""Quantized MoE experts (ops/moe_quant.py): int8 per-(expert, channel)
weights, routed-only decode kernel, runtime conversion, and end-to-end
deepseek parity (the reference has no quantized-MoE path at all)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scalellm_tpu.ops.moe_quant import (
    _decode_grouped_quant_matmul,
    _ref_grouped_quant_matmul,
    grouped_quant_matmul,
    quantize_experts_int8,
)


def _mk(E=8, K=256, N=384, Tp=128, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
    qw, sc = quantize_experts_int8(w)
    xs = rng.standard_normal((Tp, K)).astype(np.float32)
    gs = np.zeros(E, np.int32)
    gs[1], gs[3], gs[6] = 40, 60, 10
    return w, qw, sc, xs, gs


def test_quantize_experts_roundtrip():
    w, qw, sc, *_ = _mk()
    deq = qw.astype(np.float32) * sc[:, None, :]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # int8 per-channel: <1% worst-case element error


def test_decode_kernel_matches_ref_interpret():
    w, qw, sc, xs, gs = _mk()
    ref = np.asarray(_ref_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs)))
    out = np.asarray(_decode_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs),
        interpret=True))
    covered = int(gs.sum())
    np.testing.assert_allclose(out[:covered], ref[:covered],
                               rtol=2e-2, atol=1e-2)
    assert np.abs(out[covered:]).max() == 0  # uncovered rows zeroed


def test_decode_kernel_layer_stacked_interpret():
    w, qw, sc, xs, gs = _mk()
    L = 3
    qw_l = np.stack([np.roll(qw, l, axis=0) for l in range(L)])
    sc_l = np.stack([np.roll(sc, l, axis=0) for l in range(L)])
    for layer in (0, 2):
        ref = np.asarray(_ref_grouped_quant_matmul(
            jnp.asarray(xs), jnp.asarray(qw_l[layer]),
            jnp.asarray(sc_l[layer]), jnp.asarray(gs)))
        out = np.asarray(_decode_grouped_quant_matmul(
            jnp.asarray(xs), jnp.asarray(qw_l), jnp.asarray(sc_l),
            jnp.asarray(gs), layer=jnp.asarray(layer), interpret=True))
        covered = int(gs.sum())
        np.testing.assert_allclose(out[:covered], ref[:covered],
                                   rtol=2e-2, atol=1e-2)


def _tiny_deepseek_args(quant: bool):
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.models.deepseek import load_deepseek_v2_model_args

    args = load_deepseek_v2_model_args(dict(
        torch_dtype="float32",
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        vocab_size=256,
        max_position_embeddings=256,
        q_lora_rank=None,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        first_k_dense_replace=1,
        n_routed_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        norm_topk_prob=False,
    ))
    if quant:
        args.quant_args = QuantArgs(quant_method="internal", bits=8,
                                    group_size=128)
    return args


def test_deepseek_quantized_experts_parity():
    """Quantized-expert deepseek must track the dense model's logits: same
    dense weights, experts runtime-quantized via quantize_model_params."""
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.models.deepseek import MLADecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig
    from scalellm_tpu.quantization.runtime import quantize_model_params

    dense = MLADecoderModel(_tiny_deepseek_args(False), ParallelConfig())
    params = dense.init_params(jax.random.PRNGKey(0))
    qmodel, qparams = quantize_model_params(
        dense, jax.tree_util.tree_map(np.asarray, params),
        QuantArgs(quant_method="internal", bits=8, group_size=128),
    )
    assert qmodel.moe_quant
    assert qparams["moe_layers"]["moe_gate"]["qweight"].dtype == np.int8

    T, page = 4, 4
    kv = jnp.zeros(dense.kv_cache_shape(8, page), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray([3, 17, 42, 9], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page,
        block_tables=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    h_d, _ = dense.forward(params, kv, mi)
    l_d = dense.logits(params, h_d)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    h_q, _ = qmodel.forward(qparams, kv, mi)
    l_q = qmodel.logits(qparams, h_q)
    # int8 experts: logits track the dense model closely
    err = float(jnp.abs(l_q - l_d).max() / (jnp.abs(l_d).max() + 1e-9))
    assert err < 0.05, err
    # and greedy argmax agrees
    assert jnp.argmax(l_q, -1).tolist() == jnp.argmax(l_d, -1).tolist()


def test_grouped_quant_matmul_prefill_path_cpu():
    """The >256-row (gmm) path is TPU-only; on CPU it must still route to
    the reference implementation and agree with it."""
    w, qw, sc, _, _ = _mk(Tp=8)
    rng = np.random.default_rng(1)
    Tp = 384
    xs = rng.standard_normal((Tp, 256)).astype(np.float32)
    gs = np.zeros(8, np.int32)
    gs[0], gs[2] = 200, 184
    out = grouped_quant_matmul(
        jnp.asarray(xs), {"qweight": jnp.asarray(qw), "scales": jnp.asarray(sc)},
        jnp.asarray(gs))
    ref = _ref_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int4_dequant_roundtrip():
    from scalellm_tpu.ops.moe_quant import _dequant_int4, quantize_experts_int4

    rng = np.random.default_rng(2)
    E, K, N, G = 4, 256, 128, 128
    w = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
    qw, sc = quantize_experts_int4(w, G)
    assert qw.shape == (E, K // 2, N) and sc.shape == (E, K // G, N)
    for e in range(E):
        deq = np.asarray(_dequant_int4(jnp.asarray(qw[e]), jnp.asarray(sc[e]), G))
        rel = np.abs(deq - w[e]).max() / np.abs(w[e]).max()
        assert rel < 0.12, rel  # int4 g128 grid error


def test_decode_kernel_int4_matches_ref_interpret():
    from scalellm_tpu.ops.moe_quant import quantize_experts_int4

    rng = np.random.default_rng(3)
    E, K, N, Tp, G = 8, 256, 384, 128, 128
    w = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
    qw, sc = quantize_experts_int4(w, G)
    xs = rng.standard_normal((Tp, K)).astype(np.float32)
    gs = np.zeros(E, np.int32)
    gs[0], gs[4], gs[7] = 30, 70, 11
    ref = np.asarray(_ref_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs)))
    out = np.asarray(_decode_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs),
        interpret=True))
    covered = int(gs.sum())
    np.testing.assert_allclose(out[:covered], ref[:covered],
                               rtol=2e-2, atol=1e-2)
    assert np.abs(out[covered:]).max() == 0


def test_deepseek_int4_experts_parity():
    """int4-g128 experts: logits stay close to dense (same weights)."""
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.models.deepseek import MLADecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig
    from scalellm_tpu.quantization.runtime import quantize_model_params

    dense = MLADecoderModel(_tiny_deepseek_args(False), ParallelConfig())
    params = dense.init_params(jax.random.PRNGKey(0))
    qmodel, qparams = quantize_model_params(
        dense, jax.tree_util.tree_map(np.asarray, params),
        QuantArgs(quant_method="internal", bits=4, group_size=32),
    )
    assert qmodel.moe_quant_bits == 4
    mg = qparams["moe_layers"]["moe_gate"]
    assert mg["qweight"].shape[-2] * 2 == 64  # packed K rows (D=64)

    T, page = 4, 4
    kv = jnp.zeros(dense.kv_cache_shape(8, page), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray([3, 17, 42, 9], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page,
        block_tables=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    h_d, _ = dense.forward(params, kv, mi)
    l_d = dense.logits(params, h_d)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    h_q, _ = qmodel.forward(qparams, kv, mi)
    l_q = qmodel.logits(qparams, h_q)
    err = float(jnp.abs(l_q - l_d).max() / (jnp.abs(l_d).max() + 1e-9))
    assert err < 0.25, err  # int4 grid, small-G tiny model: loose band


def test_mixtral_runtime_quant_experts_parity(tmp_path):
    """Generic DecoderModel MoE families take the same quantized-expert
    path (runtime int8): mixtral logits must track the dense model."""
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig
    from scalellm_tpu.quantization.runtime import quantize_model_params

    args = ModelRegistry.get_model_args_loader("mixtral")(dict(
        torch_dtype="float32", vocab_size=128, hidden_size=64,
        intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, num_local_experts=4,
        num_experts_per_tok=2,
    ))
    factory = ModelRegistry.get_causal_lm_factory("mixtral")
    dense = factory(args, ParallelConfig())
    params = dense.init_params(jax.random.PRNGKey(1))
    qmodel, qparams = quantize_model_params(
        dense, jax.tree_util.tree_map(np.asarray, params),
        QuantArgs(quant_method="internal", bits=8, group_size=32),
    )
    assert isinstance(qparams["layers"]["moe_gate"], dict)
    assert qparams["layers"]["moe_gate"]["qweight"].dtype == np.int8

    T, page = 4, 4
    kv = jnp.zeros(dense.kv_cache_shape(8, page), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray([3, 17, 42, 9], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page,
        block_tables=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    h_d, _ = dense.forward(params, kv, mi)
    l_d = dense.logits(params, h_d)
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    h_q, _ = qmodel.forward(qparams, kv, mi)
    l_q = qmodel.logits(qparams, h_q)
    err = float(jnp.abs(l_q - l_d).max() / (jnp.abs(l_d).max() + 1e-9))
    assert err < 0.08, err


def test_decode_kernel_zero_active_experts_interpret():
    """EP shard whose tokens all routed to remote experts: group_sizes all
    zero → the compacted active list is all -1. The kernel must not issue
    a DMA at dynamic index -1 (ADVICE r4: dangling-semaphore/fault class)
    and must return all-zero rows."""
    w, qw, sc, xs, gs = _mk()
    gs = np.zeros_like(gs)
    out = np.asarray(_decode_grouped_quant_matmul(
        jnp.asarray(xs), jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(gs),
        interpret=True))
    assert out.shape == (xs.shape[0], qw.shape[-1])
    assert np.abs(out).max() == 0


def test_decode_kernel_vmem_overflow_falls_back():
    """Oversized expert dims must route to the gmm/dequant path instead of
    compiling a scoped-VMEM-overflowing decode kernel (a failing remote
    compile is retried forever and wedges serving — 7a2c187 postmortem)."""
    from unittest import mock

    import scalellm_tpu.ops.moe_quant as mq

    w, qw, sc, xs, gs = _mk()
    with mock.patch.object(
        mq, "_decode_grouped_quant_matmul",
        side_effect=AssertionError("decode kernel must not be used"),
    ):
        # Patch the budget by shrinking it via monkeypatched constant:
        # easiest honest check — call with a fake huge-N weight view is
        # expensive, so instead verify the routing expression directly.
        Tp, K = xs.shape
        E, Kw, N = qw.shape[-3:]
        decode_vmem = 2 * Kw * N + sc.size * 4 + Tp * K * 2 + Tp * N * 4
        assert decode_vmem <= 12 * 1024 * 1024  # sanity: small case fits
    # A >12MB case: N large enough that 2*Kw*N alone exceeds the budget.
    big_N = (12 * 1024 * 1024) // (2 * qw.shape[-2]) + 256
    big_qw = np.zeros((qw.shape[0], qw.shape[1], big_N), np.int8)
    big_sc = np.ones((qw.shape[0], big_N), np.float32)
    with mock.patch.object(
        mq, "_decode_grouped_quant_matmul",
        side_effect=AssertionError("decode kernel must not be used"),
    ):
        out = mq.grouped_quant_matmul(
            jnp.asarray(xs), {"qweight": jnp.asarray(big_qw),
                              "scales": jnp.asarray(big_sc)},
            jnp.asarray(gs), interpret=True)
    assert out.shape == (xs.shape[0], big_N)


def test_pair_kernel_matches_single_interpret():
    """Fused gate+up kernel == two single calls (int8 and int4, stacked
    and flat, zero-active): the fused path must be a pure launch-count
    optimization with identical numerics."""
    from scalellm_tpu.ops.moe_quant import (
        grouped_quant_matmul_pair,
        quantize_experts_int4,
    )

    rng = np.random.default_rng(7)
    E, K, N, Tp = 8, 256, 384, 8
    xs = rng.standard_normal((Tp, K)).astype(np.float32)
    gs = np.zeros(E, np.int32)
    gs[2], gs[5] = 5, 3

    for bits in (8, 4):
        wg = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
        wu = rng.standard_normal((E, K, N)).astype(np.float32) * 0.05
        if bits == 8:
            qg, sg = quantize_experts_int8(wg)
            qu, su = quantize_experts_int8(wu)
        else:
            qg, sg = quantize_experts_int4(wg, 128)
            qu, su = quantize_experts_int4(wu, 128)
        dg = {"qweight": jnp.asarray(qg), "scales": jnp.asarray(sg)}
        du = {"qweight": jnp.asarray(qu), "scales": jnp.asarray(su)}
        g1 = grouped_quant_matmul(jnp.asarray(xs), dg, jnp.asarray(gs),
                                  interpret=True)
        u1 = grouped_quant_matmul(jnp.asarray(xs), du, jnp.asarray(gs),
                                  interpret=True)
        g2, u2 = grouped_quant_matmul_pair(
            jnp.asarray(xs), dg, du, jnp.asarray(gs), interpret=True)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                                   rtol=1e-5, atol=1e-5)

        # layer-stacked with max_active cap (the deepseek decode shape)
        L = 2
        dgl = {"qweight": jnp.asarray(np.stack([qg, np.roll(qg, 1, 0)])),
               "scales": jnp.asarray(np.stack([sg, np.roll(sg, 1, 0)]))}
        dul = {"qweight": jnp.asarray(np.stack([qu, np.roll(qu, 1, 0)])),
               "scales": jnp.asarray(np.stack([su, np.roll(su, 1, 0)]))}
        for layer in (0, 1):
            g1 = grouped_quant_matmul(
                jnp.asarray(xs), dgl, jnp.asarray(gs),
                layer=jnp.asarray(layer), interpret=True, max_active=4)
            g2, u2 = grouped_quant_matmul_pair(
                jnp.asarray(xs), dgl, dul, jnp.asarray(gs),
                layer=jnp.asarray(layer), interpret=True, max_active=4)
            np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                       rtol=1e-5, atol=1e-5)

    # zero active experts (EP remote-routed shard): all-zero outputs, no
    # dangling DMA (interpret mode asserts unwaited copies).
    gs0 = np.zeros(E, np.int32)
    g0, u0 = grouped_quant_matmul_pair(
        jnp.asarray(xs), dg, du, jnp.asarray(gs0), interpret=True)
    assert np.abs(np.asarray(g0)).max() == 0
    assert np.abs(np.asarray(u0)).max() == 0


def test_deepseek_fused_gate_up_env_parity(monkeypatch):
    """MOE_FUSE_GATE_UP=1 produces the same deepseek logits as the
    default two-call path (CPU falls through to the reference matmul in
    both cases; the flag must not change numerics anywhere)."""
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.models.deepseek import MLADecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig
    from scalellm_tpu.quantization.runtime import quantize_model_params

    dense = MLADecoderModel(_tiny_deepseek_args(False), ParallelConfig())
    params = dense.init_params(jax.random.PRNGKey(0))
    qmodel, qparams = quantize_model_params(
        dense, jax.tree_util.tree_map(np.asarray, params),
        QuantArgs(quant_method="internal", bits=8, group_size=128),
    )
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    T, page = 4, 4
    kv = jnp.zeros(dense.kv_cache_shape(8, page), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray([3, 17, 42, 9], jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page,
        block_tables=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    monkeypatch.delenv("MOE_FUSE_GATE_UP", raising=False)
    base, _ = qmodel.forward(qparams, kv, mi)
    monkeypatch.setenv("MOE_FUSE_GATE_UP", "1")
    fused, _ = qmodel.forward(qparams, kv, mi)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_deepseek_t1_fast_dispatch_parity(monkeypatch):
    """MOE_DISPATCH_T1 (sort-free b=1 dispatch) must match the generic
    argsort/bincount dispatch exactly on a single-token decode batch —
    both with and without the fused gate+up pair."""
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.models.deepseek import MLADecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig
    from scalellm_tpu.quantization.runtime import quantize_model_params

    dense = MLADecoderModel(_tiny_deepseek_args(False), ParallelConfig())
    params = dense.init_params(jax.random.PRNGKey(1))
    qmodel, qparams = quantize_model_params(
        dense, jax.tree_util.tree_map(np.asarray, params),
        QuantArgs(quant_method="internal", bits=8, group_size=128),
    )
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    T, page = 1, 4
    kv = jnp.zeros(dense.kv_cache_shape(8, page), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray([42], jnp.int32),
        positions=jnp.zeros(T, jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.asarray([page], jnp.int32),
        block_tables=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        kv_lens=jnp.asarray([1], jnp.int32),
        cu_q_lens=jnp.asarray([0, 1], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([0], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    for fuse in ("0", "1"):
        monkeypatch.setenv("MOE_FUSE_GATE_UP", fuse)
        monkeypatch.setenv("MOE_DISPATCH_T1", "0")
        base, _ = qmodel.forward(qparams, kv, mi)
        monkeypatch.setenv("MOE_DISPATCH_T1", "force")
        fast, _ = qmodel.forward(qparams, kv, mi)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)
