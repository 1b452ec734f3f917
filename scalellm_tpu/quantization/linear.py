"""Quantized-checkpoint weight-rule generation.

Turns a model's dense hf_weight_rules into rules that match the AWQ/GPTQ
checkpoint tensor names (qweight/qzeros/scales) and attach unpack→repack
transforms producing the canonical TPU layout of ops/quant_matmul.py.

TPU-native equivalent of the reference's per-format QLinearImpl weight
loading (reference: src/layers/quantization/qlinear_awq_impl.h,
qlinear_gptq_impl.h and pack_utils repacking).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from scalellm_tpu.config import QuantArgs
from scalellm_tpu.ops.quant_matmul import pack_int4
from scalellm_tpu.quantization.formats import (
    unpack_awq_tensor,
    unpack_awq_zeros,
    unpack_gptq_tensor,
    unpack_gptq_zeros,
)

PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def build_quant_rules(base_rules: List[Tuple], quant: QuantArgs) -> List[Tuple]:
    """Rewrite projection `.weight` rules into qweight/qzeros/scales rules
    with format transforms; non-projection rules pass through unchanged."""
    method = quant.quant_method
    bits = quant.bits
    # "exllama"/"exllamav2" are kernel impl names for the GPTQ serialized
    # format (reference: qlinear_exllamav2_impl.h consumes gptq tensors).
    if method in ("exllama", "exllamav2"):
        method = "gptq"
    assert method in ("awq", "gptq"), f"unsupported quant method {method!r}"
    assert bits == 4, "int4 checkpoints only (int8 via internal quantizer)"

    def qweight_transform(t: np.ndarray) -> np.ndarray:
        u = unpack_awq_tensor(t, bits) if method == "awq" else unpack_gptq_tensor(t, bits)
        return pack_int4(u)

    def zeros_transform(t: np.ndarray) -> np.ndarray:
        z = unpack_awq_zeros(t, bits) if method == "awq" else unpack_gptq_zeros(t, bits)
        # canonical layout stores signed nibbles (value - 8); shift the zero
        # points to match
        return (z.astype(np.int32) - 8).astype(np.int8)

    out: List[Tuple] = []
    for rule in base_rules:
        rx, path, transpose = rule[:3]
        is_proj = isinstance(path, str) and any(
            path == f"layers.{p}" for p in PROJ_NAMES
        )
        if not is_proj or not rx.endswith(r"\.weight"):
            out.append(rule)
            continue
        stem = rx[: -len(r"\.weight")]
        # Checkpoint layouts are [in, out]-oriented already: no transpose.
        out.append((stem + r"\.qweight", path + ".qweight", False, qweight_transform))
        out.append((stem + r"\.qzeros", path + ".zeros", False, zeros_transform))
        out.append((stem + r"\.scales", path + ".scales", False, None))
        if quant.desc_act:
            # Activation-order grouping: rows stay in original K order in
            # the checkpoint; g_idx[k] is row k's group. fuse_params sorts
            # rows into contiguous groups and keeps the row permutation for
            # the runtime input gather (reference: qlinear_gptq_impl.h /
            # exllama q4_matrix row remap).
            out.append((stem + r"\.g_idx", path + ".g_idx", False, None))
    return out
