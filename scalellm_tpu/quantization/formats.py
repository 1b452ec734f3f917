"""AWQ / GPTQ checkpoint unpacking → canonical TPU layout.

TPU-native equivalent of the reference's repacking utilities
(reference: src/layers/quantization/pack_utils.{h,cpp} and the
Marlin repack kernels, src/kernels/quantization/marlin/). The packed int32
checkpoint tensors are unpacked ONCE at load time into the canonical layout
consumed by ops/quant_matmul.py (unsigned nibbles packed 2-per-int8 along
K, plus unpacked [K/G, N] scales and int8 zero points).

Format details:
  AWQ  (reference: qlinear_awq_impl.h):
    qweight i32[K, N/8]  — 8 nibbles along N, nibble i ↔ column offset
                           AWQ_ORDER[i] = [0, 2, 4, 6, 1, 3, 5, 7]
    qzeros  i32[K/G, N/8] — same packing; w = (q - z) * s
    scales  f16[K/G, N]
  GPTQ (reference: qlinear_gptq_impl.h):
    qweight i32[K/8, N]  — 8 nibbles along K, sequential order
    qzeros  i32[K/G, N/8] — sequential; stored value is z - 1 (the historic
                            GPTQ off-by-one: unpacked + 1 is the zero point)
    scales  f16[K/G, N]
    g_idx   i32[K]       — only desc_act=False (identity grouping) supported
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def _unpack_nibbles_last_dim(packed: np.ndarray, order) -> np.ndarray:
    """i32[..., W] → u8[..., W*8] nibbles, placing nibble i at column order[i]."""
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 8,), dtype=np.uint8)
    p = packed.astype(np.uint32)
    for i in range(8):
        out[..., order[i] :: 8] = (p >> (4 * i)) & 0xF
    return out


def _unpack_nibbles_first_dim(packed: np.ndarray) -> np.ndarray:
    """i32[R, N] → u8[R*8, N] nibbles along dim 0, sequential order."""
    R, N = packed.shape
    out = np.empty((R * 8, N), dtype=np.uint8)
    p = packed.astype(np.uint32)
    for i in range(8):
        out[i::8] = (p >> (4 * i)) & 0xF
    return out


def unpack_awq_tensor(qweight: np.ndarray, bits: int = 4) -> np.ndarray:
    """AWQ qweight i32[K, N/8] → unsigned values u8[K, N]."""
    assert bits == 4, "AWQ int4 only"
    return _unpack_nibbles_last_dim(qweight, AWQ_ORDER)


def unpack_awq_zeros(qzeros: np.ndarray, bits: int = 4) -> np.ndarray:
    """AWQ qzeros i32[K/G, N/8] → zero points i8[K/G, N]."""
    assert bits == 4
    return _unpack_nibbles_last_dim(qzeros, AWQ_ORDER).astype(np.int8)


def unpack_gptq_tensor(qweight: np.ndarray, bits: int = 4) -> np.ndarray:
    """GPTQ qweight i32[K/8, N] → unsigned values u8[K, N]."""
    assert bits in (4, 8)
    if bits == 4:
        return _unpack_nibbles_first_dim(qweight)
    # int8: 4 bytes per i32 along K.
    R, N = qweight.shape
    out = np.empty((R * 4, N), dtype=np.uint8)
    p = qweight.astype(np.uint32)
    for i in range(4):
        out[i::4] = (p >> (8 * i)) & 0xFF
    return out


def unpack_gptq_zeros(qzeros: np.ndarray, bits: int = 4) -> np.ndarray:
    """GPTQ qzeros i32[K/G, N/8] → zero points i8[K/G, N] (with the +1)."""
    if bits == 4:
        z = _unpack_nibbles_last_dim(qzeros, list(range(8)))
    else:
        R, W = qzeros.shape
        z = np.empty((R, W * 4), dtype=np.uint8)
        p = qzeros.astype(np.uint32)
        for i in range(4):
            z[..., i::4] = (p >> (8 * i)) & 0xFF
    return (z.astype(np.int32) + 1).astype(np.int8)
