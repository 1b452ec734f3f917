"""Runtime (on-the-fly) weight quantization of a dense bf16/f32 param tree.

Converts a dense model's params into the canonical quantized layout of
ops/quant_matmul.py without a quantized checkpoint — the TPU-native
counterpart of serving-time quantization (the reference only loads
pre-quantized GPTQ/AWQ checkpoints; this additionally enables INT4/INT8
serving of any bf16 checkpoint). Also the reference implementation for the
accuracy harness (eval/ppl.py) which compares bf16 vs quantized variants of
the SAME weights.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from scalellm_tpu.config import ModelArgs, QuantArgs
from scalellm_tpu.ops.quant_matmul import quantize_int4, quantize_int8


def quantize_model_params(
    dense_model,
    dense_params: Dict[str, Any],
    quant: QuantArgs,
):
    """Returns (quant_model, quant_params): a new model instance whose args
    carry `quant`, with projections group-quantized from the dense params.

    dense_params must be in the FUSED runtime layout (model.param_shapes()).
    """
    import copy

    args: ModelArgs = copy.copy(dense_model.args)
    args.quant_args = quant
    qmodel = type(dense_model)(args, dense_model.parallel, dense_model.attn_impl)

    qshapes = qmodel.param_shapes()
    qfn = quantize_int4 if quant.bits == 4 else quantize_int8

    def convert(qnode, dnode):
        out: Dict[str, Any] = {}
        for name, spec in qnode.items():
            if isinstance(spec, dict) and "qweight" in spec:
                dense = np.asarray(dnode[name], dtype=np.float32)
                if "zeros" not in spec:
                    # MoE expert pair {"qweight","scales"}, layer-stacked
                    # [L, E, K, N] (ops/moe_quant.py): int4 (packed rows,
                    # per-group grids) when the declared qweight K is
                    # halved, else int8 per-(expert, channel).
                    from scalellm_tpu.ops.moe_quant import (
                        quantize_experts_int4,
                        quantize_experts_int8,
                    )

                    int4 = spec["qweight"][-2] * 2 == dense.shape[-2]
                    efn = (
                        (lambda d: quantize_experts_int4(
                            d, dense.shape[-2] // spec["scales"][-2]))
                        if int4 else quantize_experts_int8
                    )
                    qw, sc = zip(*(efn(dense[l])
                                   for l in range(dense.shape[0])))
                    out[name] = {
                        "qweight": np.stack(qw), "scales": np.stack(sc),
                    }
                elif dense.ndim == 3:  # [L, K, N] stacked layers
                    # group size from the DECLARED scales shape ((L, n_n,
                    # K/G, W) tiled) — cannot diverge from param_shapes().
                    g = dense.shape[1] // spec["scales"][-2]
                    qw, sc, zp = zip(*(qfn(dense[l], g)
                                       for l in range(dense.shape[0])))
                    out[name] = {
                        "qweight": np.stack(qw),
                        "scales": np.stack(sc),
                        "zeros": np.stack(zp),
                    }
                else:  # [K, N] (lm_head)
                    lm_fn = (
                        quantize_int4
                        if qmodel._lm_head_bits() == 4
                        else quantize_int8
                    )
                    # group size from the DECLARED scales K-dim (handles
                    # tiny-test dims where 128 doesn't divide K)
                    g_lm = dense.shape[0] // spec["scales"][-2]
                    qw, sc, zp = lm_fn(dense, g_lm)
                    out[name] = {"qweight": qw, "scales": sc, "zeros": zp}
            elif isinstance(spec, dict):
                out[name] = convert(spec, dnode[name])
            elif name == "kv_scales" and name not in dnode:
                out[name] = np.full(spec, args.kv_scale, np.float32)
            else:
                out[name] = dnode[name]
        return out

    qparams = convert(qshapes, dense_params)
    # Flat quantized triples → the N-tiled storage layout of param_shapes()
    # (models without group-quant projections — e.g. deepseek, which
    # quantizes only its MoE experts — have no tiled layout to apply).
    if hasattr(qmodel, "tile_quant_params"):
        qmodel.tile_quant_params(qparams)
    return qmodel, qparams
