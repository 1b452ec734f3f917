"""Interpret-mode parity for the fused RMSNorm prologue in quant_matmul.

QUANT_FUSE_RMS=1 routes every quantized model through the in-kernel norm
on TPU, but the CPU suite otherwise only exercises the _apply_rms_xla
fallback — a numeric bug in the Pallas-side norm would silently corrupt
TPU serving outputs. These tests run the real TPU kernels in Pallas
interpret mode and require the fused output to match rms_norm +
quant_matmul exactly, across stacked/non-stacked and symmetric/asymmetric
variants (ADVICE r4 item 2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from scalellm_tpu.layers.norms import rms_norm
from scalellm_tpu.ops.quant_matmul import (
    quant_matmul,
    quantize_int4,
    tile_quant_layout,
)

EPS = 1e-6


def _make_quant(K, N, G, seed, n_layers=None):
    rng = np.random.default_rng(seed)
    L = n_layers or 1
    qws, scs, zps = [], [], []
    for _ in range(L):
        w = (rng.standard_normal((K, N)) * 0.05).astype(np.float32)
        qw, sc, zp = quantize_int4(w, G)
        qws.append(qw), scs.append(sc), zps.append(zp)
    if n_layers is None:
        return qws[0], scs[0], zps[0]
    return np.stack(qws), np.stack(scs), np.stack(zps)


def _fused_vs_unfused(x, g, qw, sc, zp, *, symmetric, layer=None,
                      variant=""):
    """Run the SAME interpret-mode kernel with (a) the fused prologue and
    (b) a pre-normed input; the docstring contract is bitwise identity."""
    kw = dict(bits=4, backend="tpu", interpret=True, symmetric=symmetric,
              variant=variant, layer=layer)
    fused = quant_matmul(x, qw, sc, None if symmetric else zp,
                         rms_gamma=g, rms_eps=EPS, **kw)
    # The kernel norms the ALREADY-bf16 input block (x_op cast), so the
    # reference is rms_norm over the bf16 x, rounded back to bf16.
    xn = rms_norm(x.astype(jnp.bfloat16), g, EPS).astype(x.dtype)
    plain = quant_matmul(xn, qw, sc, None if symmetric else zp, **kw)
    return np.asarray(fused), np.asarray(plain)


@pytest.mark.parametrize("symmetric", [True, False])
@pytest.mark.parametrize("tiled", [False, True])
def test_fused_rms_parity_flat(symmetric, tiled, capfd):
    K, N, G, M = 512, 256, 32, 4
    qw, sc, zp = _make_quant(K, N, G, seed=0)
    if tiled:
        qw = tile_quant_layout(qw, 128)
        sc = tile_quant_layout(sc, 128)
        zp = tile_quant_layout(zp, 128)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((K,)).astype(np.float32) * 0.5 + 1.0)

    import os
    os.environ["QUANT_DEBUG"] = "1"
    try:
        fused, plain = _fused_vs_unfused(
            jnp.asarray(x), g, jnp.asarray(qw), jnp.asarray(sc),
            jnp.asarray(zp), symmetric=symmetric)
    finally:
        os.environ.pop("QUANT_DEBUG", None)
    err = capfd.readouterr().err
    assert "fuse_rms=True" in err, f"fused path not taken:\n{err}"
    np.testing.assert_allclose(fused, plain, rtol=0, atol=0)


@pytest.mark.parametrize("symmetric", [True, False])
def test_fused_rms_parity_stacked(symmetric, capfd):
    """Layer-stacked weights stream through _stream_kernel's fuse path
    (the lin==0 scratch-persistence gating ADVICE flagged)."""
    K, N, G, M, L = 512, 256, 32, 2, 3
    qw, sc, zp = _make_quant(K, N, G, seed=2, n_layers=L)
    qw = tile_quant_layout(qw, 128)
    sc = tile_quant_layout(sc, 128)
    zp = tile_quant_layout(zp, 128)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((K,)).astype(np.float32) * 0.5 + 1.0)

    import os
    os.environ["QUANT_DEBUG"] = "1"
    try:
        for layer in (0, L - 1):
            fused, plain = _fused_vs_unfused(
                x, g, jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(zp),
                symmetric=symmetric, layer=jnp.asarray(layer, jnp.int32))
            np.testing.assert_allclose(fused, plain, rtol=0, atol=0)
    finally:
        os.environ.pop("QUANT_DEBUG", None)
    err = capfd.readouterr().err
    assert "fuse_rms=True" in err, f"fused path not taken:\n{err}"
