"""Runtime (on-the-fly) quantization + tiled quant storage layout.

Covers the TPU-native serving-time quantizer (quantization/runtime.py) —
a capability beyond the reference, which only loads pre-quantized
checkpoints — and the N-tiled storage layout (ops/quant_matmul.py
tile_quant_layout) used for contiguous HBM reads.
"""

import numpy as np
import pytest


def test_tile_layout_roundtrip():
    from scalellm_tpu.ops.quant_matmul import (
        tile_quant_layout,
        untile_quant_layout,
    )

    rng = np.random.default_rng(0)
    a = rng.integers(-128, 127, (3, 16, 96), dtype=np.int8)
    t = tile_quant_layout(a, 32)
    assert t.shape == (3, 3, 16, 32)
    assert (untile_quant_layout(t) == a).all()
    # padding case: N=40 with W=32 pads to 64 (2 tiles)
    b = rng.integers(-128, 127, (16, 40), dtype=np.int8)
    t = tile_quant_layout(b, 32)
    assert t.shape == (2, 16, 32)
    back = untile_quant_layout(t)
    assert (back[:, :40] == b).all() and (back[:, 40:] == 0).all()


def test_quant_matmul_tiled_matches_flat():
    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import (
        quant_matmul,
        quantize_int4,
        tile_quant_layout,
    )

    rng = np.random.default_rng(1)
    M, K, N, G, W = 4, 64, 96, 32, 32
    w = (rng.standard_normal((K, N)) * 0.1).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    qw, sc, zp = quantize_int4(w, G)
    flat = np.asarray(
        quant_matmul(jnp.asarray(x), jnp.asarray(qw), jnp.asarray(sc),
                     jnp.asarray(zp), bits=4)
    )
    tiled = np.asarray(
        quant_matmul(
            jnp.asarray(x),
            jnp.asarray(tile_quant_layout(qw, W)),
            jnp.asarray(tile_quant_layout(sc, W)),
            jnp.asarray(tile_quant_layout(zp, W)),
            bits=4,
        )
    )
    np.testing.assert_allclose(tiled[:, :N], flat, rtol=1e-5, atol=1e-5)


def _dense_model_and_params(model_dir):
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    loader = HFModelLoader(model_dir)
    loader.model_args.dtype = "float32"
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, ParallelConfig())
    return model, loader.load_params(model)


def _greedy_tokens(model, params, n=6):
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    ex = Executor(model, params, mesh=None)
    ex.init_kv_cache(num_blocks=16, block_size=4)

    class _B:
        def __init__(self, i):
            self.id, self.size = i, 4

        def dec_ref(self):
            pass

    seq = Sequence(0, [3, 17, 42, 9, 101], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    seq.blocks = [_B(1), _B(2), _B(3), _B(4)]
    toks = []
    pos = 5
    b = Batch()
    b.add(seq, pos)
    mi, si, _ = b.prepare_model_inputs(4)
    outs = ex.execute(mi, si)
    tok = int(np.asarray(outs.next_tokens)[0])
    toks.append(tok)
    for _ in range(n - 1):
        seq.append_token(tok)
        seq.kv_cached_tokens = pos
        b = Batch()
        b.add(seq, 1)
        mi, si, _ = b.prepare_model_inputs(4)
        outs = ex.execute(mi, si)
        tok = int(np.asarray(outs.next_tokens)[0])
        toks.append(tok)
        pos += 1
    return toks


def _dequant_twin_params(qmodel, params, qparams, bits):
    """Dense params whose projections are the DEQUANTIZED quant weights —
    the exact function the quant model should compute."""
    import copy

    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import (
        ref_quant_matmul,
        untile_quant_layout,
    )

    def dequant(triple, K, N, b):
        qw = untile_quant_layout(np.asarray(triple["qweight"]))
        sc = untile_quant_layout(np.asarray(triple["scales"]))
        zp = untile_quant_layout(np.asarray(triple["zeros"]))
        eye = jnp.eye(K, dtype=jnp.float32)
        if qw.ndim == 3:  # stacked layers
            return np.stack([
                np.asarray(ref_quant_matmul(eye, jnp.asarray(qw[l]),
                                            jnp.asarray(sc[l]),
                                            jnp.asarray(zp[l]), b))[:, :N]
                for l in range(qw.shape[0])
            ]).astype(np.float32)
        return np.asarray(
            ref_quant_matmul(eye, jnp.asarray(qw), jnp.asarray(sc),
                             jnp.asarray(zp), b)
        )[:, :N].astype(np.float32)

    deq = copy.deepcopy({k: v for k, v in params.items()})
    for name, dense in params["layers"].items():
        qnode = qparams["layers"].get(name)
        if isinstance(qnode, dict) and "qweight" in qnode:
            L, K, N = np.asarray(dense).shape
            deq["layers"][name] = dequant(qnode, K, N, bits)
    if isinstance(qparams.get("lm_head"), dict):
        K, N = np.asarray(params["lm_head"]).shape
        deq["lm_head"] = dequant(qparams["lm_head"], K, N, qmodel._lm_head_bits())
    return deq


@pytest.mark.parametrize("bits", [4, 8])
def test_runtime_quantize_generates(tmp_path, bits):
    """Runtime quantization must produce params matching the quant model's
    declared (tiled) shapes, and the quant model must generate exactly the
    greedy tokens of a dense model running the DEQUANTIZED weights."""
    import jax
    import tests.fixtures as fixtures
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.quantization.runtime import quantize_model_params

    src = str(tmp_path / "src")
    fixtures.make_tiny_llama(src, tokenizer=True)
    model, params = _dense_model_and_params(src)

    qargs = QuantArgs(quant_method="internal", bits=bits, group_size=32)
    qmodel, qparams = quantize_model_params(model, params, qargs)

    # every declared shape exists and matches
    shapes = qmodel.param_shapes()
    flat_s = jax.tree_util.tree_leaves_with_path(
        shapes, is_leaf=lambda x: isinstance(x, tuple)
    )
    flat_p = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_leaves_with_path(qparams)
    }
    for path, shape in flat_s:
        key = jax.tree_util.keystr(path)
        assert flat_p[key] == tuple(shape), (key, flat_p[key], shape)

    deq_params = _dequant_twin_params(qmodel, params, qparams, bits)
    assert _greedy_tokens(qmodel, qparams) == _greedy_tokens(model, deq_params)


def test_runtime_quantize_lm_head_int4(tmp_path):
    """quantize_lm_head="int4" packs the lm_head triple (D/2 rows)."""
    import tests.fixtures as fixtures
    from scalellm_tpu.config import QuantArgs
    from scalellm_tpu.quantization.runtime import quantize_model_params

    src = str(tmp_path / "src")
    # lm_head quantization requires hidden_size % 128 == 0
    fixtures.make_tiny_llama(
        src, tokenizer=True, tie_word_embeddings=False,
        hidden_size=128, intermediate_size=256,
    )
    model, params = _dense_model_and_params(src)
    qargs = QuantArgs(
        quant_method="internal", bits=4, group_size=32,
        quantize_lm_head="int4",
    )
    qmodel, qparams = quantize_model_params(model, params, qargs)
    lm = qparams["lm_head"]
    assert isinstance(lm, dict)
    D = model.args.hidden_size
    assert lm["qweight"].shape[-2] == D // 2  # packed nibbles along K
    deq_params = _dequant_twin_params(qmodel, params, qparams, 4)
    assert _greedy_tokens(qmodel, qparams) == _greedy_tokens(model, deq_params)
