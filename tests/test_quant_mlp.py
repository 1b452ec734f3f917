"""ops/quant_mlp.quant_mlp API + semantics: the fused gate→act·up→down op
(experimental standalone kernel, see its module docstring) must match the
composition of two ref quant matmuls with the activation in between. Runs
the non-TPU path (two quant_matmul launches) — pins the tiled gate/up
layout contract (gate tiles [0, F/W), up tiles [F/W, 2F/W)) and the
output slicing."""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("act", ["silu", "gelu_pytorch_tanh"])
def test_quant_mlp_matches_two_launch(act):
    from scalellm_tpu.ops.quant_matmul import (
        quantize_int4,
        ref_quant_matmul,
        tile_quant_layout,
    )
    from scalellm_tpu.ops.quant_mlp import _ACTS, quant_mlp

    rng = np.random.default_rng(0)
    M, D, F, G, W = 3, 256, 256, 128, 128
    gate = rng.normal(size=(D, F)).astype(np.float32) * 0.1
    up = rng.normal(size=(D, F)).astype(np.float32) * 0.1
    down = rng.normal(size=(F, D)).astype(np.float32) * 0.1

    gu = np.concatenate([gate, up], axis=1)  # [D, 2F]
    gu_qw, gu_sc, gu_zp = quantize_int4(gu, G)
    dn_qw, dn_sc, dn_zp = quantize_int4(down, G)

    x = rng.normal(size=(M, D)).astype(np.float32)
    out = np.asarray(
        quant_mlp(
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(tile_quant_layout(gu_qw, W)),
            jnp.asarray(tile_quant_layout(gu_sc, W)),
            jnp.asarray(tile_quant_layout(gu_zp, W)),
            jnp.asarray(tile_quant_layout(dn_qw, W)),
            jnp.asarray(tile_quant_layout(dn_sc, W)),
            jnp.asarray(tile_quant_layout(dn_zp, W)),
            F=F,
            act=act,
        )
    )[:, :D]

    gu_ref = np.asarray(
        ref_quant_matmul(
            jnp.asarray(x, jnp.bfloat16), gu_qw, gu_sc, gu_zp, 4
        )
    )
    h = np.asarray(_ACTS[act](jnp.asarray(gu_ref[:, :F]))) * gu_ref[:, F:]
    want = np.asarray(
        ref_quant_matmul(
            jnp.asarray(h, jnp.bfloat16), dn_qw, dn_sc, dn_zp, 4
        )
    )
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)
