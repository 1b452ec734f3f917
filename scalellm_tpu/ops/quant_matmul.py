"""Fused dequantize + matmul for weight-only INT4/INT8 quantization.

TPU-native replacement for the reference's Marlin/GPTQ/AWQ CUDA GEMMs
(reference: src/kernels/quantization/marlin/, awq/gemm_cuda_gen.cu,
gptq/gptq_kernel.cu — ~10.5k LoC of CUDA). One Pallas kernel family covers
all weight-only formats via a canonical TPU layout; checkpoint-specific
unpacking (AWQ/GPTQ nibble orders) happens once at load time
(scalellm_tpu/quantization/).

Canonical layout (column-major groups, lane-aligned N):
  qweight: int8[K/2, N]  — two SIGNED nibbles per byte along K (two's
           complement; byte r holds K=2r in bits 0-3, K=2r+1 in bits 4-7 —
           exactly int4 little-endian element order, so the kernel
           reinterprets the tile with pltpu.bitcast(int4) and the "unpack"
           is a free hardware int4→bf16 convert). Stored value is the
           checkpoint's unsigned nibble minus 8.
  or       int8[K, N]    — int8 quantization (signed values)
  scales:  [K/G, N]      — per-group scales
  zeros:   [K/G, N]      — per-group zero points, SHIFTED by -8 for int4
           (signed; symmetric checkpoints store 0)

Dequant: w = (q - z) * s, computed in bf16 feeding the MXU.

Tiled storage (the performance layout): the flat [K, N] tensors above may
also be stored N-BLOCKED as qweight [N/W, K/2, W] (scales/zeros
[N/W, K/G, W]) so each kernel grid cell reads one fully CONTIGUOUS block
from HBM — wide-N weights in flat layout make every tile row a strided 4KB
read, which measurably caps DMA bandwidth on v5e. `tile_quant_layout`
converts (padding N up to a multiple of W with zero scales, which makes the
padded output columns exactly 0 — callers slice back to N).

Two kernel strategies, selected per call (both verified bit-stable vs the
reference implementation):
  "group":   per-group batched MXU dots with POST-dot scaling (and the
             Marlin-style zero-point correction when asymmetric) — no
             elementwise work ever touches the big weight tile.
  "dequant": dequantize the tile in VMEM (free int4→bf16 convert + one VPU
             multiply) and issue ONE large dot per grid cell — fewer, larger
             MXU ops; wins at M=1 where the per-group dots serialize.
`symmetric=True` (GPTQ sym / internal quantizer) skips loading and applying
zero points entirely.

Why a kernel at all: batch-1 decode is HBM-bandwidth-bound, so INT4 wins by
moving 4x fewer bytes than bf16 — but only if dequant fuses into the matmul
(a separate dequant materializes bf16 weights and forfeits the win). XLA
cannot fuse through the bit-unpacking, hence Pallas.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- packing


def pack_int4(w_unsigned: np.ndarray) -> np.ndarray:
    """[K, N] unsigned nibble values (0..15) → packed SIGNED int8 [K//2, N]
    (each nibble stores value-8 in two's complement; see module docstring)."""
    assert w_unsigned.shape[0] % 2 == 0
    w = (w_unsigned.astype(np.int32) - 8) & 0xF
    lo = w[0::2]
    hi = w[1::2]
    packed = (hi << 4) | lo
    # view as signed bytes
    return packed.astype(np.uint8).view(np.int8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_int4: packed SIGNED int8 [K//2, N] → unsigned nibble
    values (0..15) [K, N]."""
    p = packed.view(np.uint8).astype(np.int32)
    lo = (p & 0xF).astype(np.uint8)
    hi = ((p >> 4) & 0xF).astype(np.uint8)
    K2, N = packed.shape
    out = np.empty((K2 * 2, N), dtype=np.uint8)
    out[0::2] = lo
    out[1::2] = hi
    return ((out.astype(np.int32) + 8) & 0xF).astype(np.uint8)


def quantize_int4(
    w: np.ndarray, group_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric int4 group quantization of a float [K, N] weight.
    Returns (packed int8 [K//2, N], scales scales_np_dtype() [K//G, N],
    zeros int8). The scale is rounded through the storage dtype BEFORE the
    grid is computed, so storage is lossless by construction."""
    K, N = w.shape
    assert K % group_size == 0
    # ascontiguousarray throughout: reductions over F-ordered inputs (e.g. a
    # transposed torch weight) yield F-ordered outputs, and raw-buffer
    # serializers (safetensors) would silently write them transposed.
    w = np.ascontiguousarray(w)
    g = w.reshape(K // group_size, group_size, N)
    max_abs = np.ascontiguousarray(np.abs(g).max(axis=1))  # [K/G, N]
    # Round-trip through the storage dtype BEFORE quantizing so the grid
    # matches the scale the kernel will actually apply.
    scales = np.maximum((max_abs / 7.0).astype(np.float32), 1e-10)
    scales = scales.astype(scales_np_dtype())
    q = np.clip(np.round(g / scales[:, None, :].astype(np.float32)), -8, 7)
    q_unsigned = (q + 8).astype(np.uint8).reshape(K, N)
    # canonical zero point: unsigned 8 → signed 0
    zeros = np.zeros((K // group_size, N), dtype=np.int8)
    return pack_int4(q_unsigned), scales, zeros


def quantize_int8(
    w: np.ndarray, group_size: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric int8 group quantization. Returns (int8 [K, N], scales in
    scales_np_dtype() (grid round-tripped, so storage-lossless), zeros)."""
    K, N = w.shape
    w = np.ascontiguousarray(w)
    g = w.reshape(K // group_size, group_size, N)
    max_abs = np.ascontiguousarray(np.abs(g).max(axis=1))
    scales = np.maximum((max_abs / 127.0).astype(np.float32), 1e-10)
    scales = scales.astype(scales_np_dtype())
    q = np.clip(
        np.round(g / scales[:, None, :].astype(np.float32)), -127, 127
    ).astype(np.int8)
    zeros = np.zeros((K // group_size, N), dtype=np.int8)
    return q.reshape(K, N), scales, zeros


# Swept on v5e (Llama-8B INT4 b=1 in-model): W=1024 beats 512 (+2.6%) and
# 2048 (+0.8%) — fewer grid cells than 512 at half the VMEM of 2048; 768
# (non-pow2) loses 7%. See BENCH sweeps round 4.
DEFAULT_TILE_N = 1024


def scales_np_dtype():
    """Storage dtype for per-group scales produced by the INTERNAL
    quantizers (quantize_int4/int8). bf16 halves the scale stream (~6% of
    the weight bytes at G=128 with f32) and is exact HERE ONLY because the
    quantizers round the scale through this dtype BEFORE computing the int
    grid, so the stored scale is the one the grid was built against.

    External GPTQ/AWQ checkpoints store scales as fp16 (10 mantissa bits
    vs bf16's 7): casting those to bf16 would perturb the scale the
    checkpoint's grid was computed against by up to ~0.4% relative. The
    loader therefore upcasts external scales to float32 (exact; Mosaic
    rejects f16 on TPU). Env QUANT_SCALES_DTYPE=float32 reverts the
    internal default for A/B."""
    import os

    import ml_dtypes

    name = os.environ.get("QUANT_SCALES_DTYPE", "bfloat16")
    return {"bfloat16": ml_dtypes.bfloat16, "float32": np.float32}[name]


def tile_quant_layout(
    arr: np.ndarray, tile_n: int = DEFAULT_TILE_N
) -> np.ndarray:
    """Flat [*, R, N] → N-blocked [*, N_pad/W, R, W] (contiguous kernel
    tiles). Works for qweight/scales/zeros alike; pads N with zeros (zero
    scales ⇒ padded output columns are exactly 0)."""
    *lead, R, N = arr.shape
    W = min(tile_n, N)
    n_pad = (-N) % W
    if n_pad:
        pad = [(0, 0)] * len(lead) + [(0, 0), (0, n_pad)]
        arr = np.pad(arr, pad)
        N += n_pad
    tiled = arr.reshape(*lead, R, N // W, W)
    # move the tile dim before R
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead), len(lead) + 2]
    return np.ascontiguousarray(tiled.transpose(perm))


def untile_quant_layout(arr: np.ndarray) -> np.ndarray:
    """Inverse of tile_quant_layout (keeps any N padding)."""
    *lead, n_n, R, W = arr.shape
    perm = list(range(len(lead))) + [len(lead) + 1, len(lead), len(lead) + 2]
    return np.ascontiguousarray(
        np.asarray(arr).transpose(perm).reshape(*lead, R, n_n * W)
    )


# ---------------------------------------------------------------- reference


def ref_quant_matmul(
    x: jnp.ndarray,  # [M, K]
    qweight: jnp.ndarray,  # int4: [K//2, N] packed; int8: [K, N]
    scales: jnp.ndarray,  # [K/G, N]
    zeros: jnp.ndarray,  # [K/G, N] int8
    bits: int,
) -> jnp.ndarray:
    K = x.shape[-1]
    if bits == 4:
        q = qweight.astype(jnp.int32)
        # sign-extend each nibble (two's complement)
        lo = ((q & 0xF) ^ 8) - 8
        hi = (((q >> 4) & 0xF) ^ 8) - 8
        w = jnp.stack([lo, hi], axis=1).reshape(K, -1)
    else:
        w = qweight.astype(jnp.int32)
    G = K // scales.shape[0]
    z = jnp.repeat(zeros.astype(jnp.int32), G, axis=0)
    s = jnp.repeat(scales.astype(jnp.float32), G, axis=0)
    wf = (w - z).astype(jnp.float32) * s
    return jnp.dot(
        x.astype(jnp.float32), wf, preferred_element_type=jnp.float32
    ).astype(x.dtype)


# ---------------------------------------------------------------- kernels


def _unpack_tile(qw_ref, bits):
    qw = qw_ref[:]
    if qw.ndim > 2:  # tiled [1, R, W] / layer-stacked [1, 1, R, W]
        qw = qw.reshape(qw.shape[-2:])
    if bits == 4:
        # The nibble layout (low nibble = even K row) matches int4's
        # little-endian element order, so the unpack is free (a hardware
        # int4→bf16 convert) instead of a VPU shift/mask/shuffle chain.
        return pltpu.bitcast(qw, jnp.int4)
    return qw


def _aux_tile(ref):
    t = ref[:]
    return t.reshape(t.shape[-2:]) if t.ndim > 2 else t


def _fused_rms(x_ref, g_ref, xn_ref, eps: float):
    """RMSNorm prologue: xn = x * rsqrt(mean(x^2)+eps) * gamma. Bitwise
    identical to layers/norms.rms_norm followed by the bf16 cast the
    kernel input would get — the norm just moves inside the pallas_call
    (one fewer XLA launch + HBM round trip per projection)."""
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    xn_ref[:] = (
        xf * jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
    ).astype(xn_ref.dtype)


def _rms_wrap(x_ref, qw_ref, sc_ref, *rest, body, eps: float):
    """Plain-path wrapper: normalize x into the xn scratch, then run the
    compute body against it. Requires n_k == 1 (the mean needs full K)."""
    g_ref, o_ref, acc_ref, xn_ref = rest[-4], rest[-3], rest[-2], rest[-1]
    zp = rest[:-4]
    _fused_rms(x_ref, g_ref, xn_ref, eps)
    body(xn_ref, qw_ref, sc_ref, *zp, o_ref, acc_ref)


def _group_kernel(x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool):
    """Per-group batched MXU dots, POST-dot group scaling.

    Scales/zeros are constant along K within a group, so they distribute
    out of the contraction: x_g @ ((w_g - z_g) * s_g) ==
    (x_g @ w_g - sum_k(x_g) * z_g) * s_g. This keeps ALL elementwise work
    off the big [BK, BN] weight tile (only the free int4→bf16 convert
    touches it) — the Marlin-style trick, restated for the MXU. The MXU
    consumes the int4/int8 operand directly in mixed-dtype dots.
    """
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(qw_ref, bits)  # [BK, BN]
    bk, bn = w.shape
    s = _aux_tile(sc_ref).astype(jnp.float32)  # [n_g, BN]
    n_g = s.shape[0]
    G = bk // n_g
    m = x_ref.shape[0]
    w = w.reshape(n_g, G, bn)
    x = x_ref[:].reshape(m, n_g, G).transpose(1, 0, 2)  # [n_g, M, G]
    dots = jax.lax.dot_general(
        x, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [n_g, M, BN]
    if symmetric:
        acc_ref[:] += jnp.sum(dots * s[:, None, :], axis=0)
    else:
        xsum = jnp.sum(x.astype(jnp.float32), axis=2)  # [n_g, M]
        z = _aux_tile(zp_ref).astype(jnp.float32)
        corr = xsum[:, :, None] * z[:, None, :]
        acc_ref[:] += jnp.sum((dots - corr) * s[:, None, :], axis=0)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _gemv_kernel(x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool):
    """Small-M EXPERIMENTAL variant: ONE MXU dot per grid cell via a
    block-diagonal activation matrix.

    The group variant issues n_g separate [M, G] @ [G, BN] dots. Hypothesis:
    at M=1 the per-dot MXU pipeline fill dominates. This variant instead
    builds xd[(g, m), k] = x[m, k] * (k // G == g) (a [n_g*M, BK]
    block-diagonal matrix, cheap VPU mask work) and issues a single
    [n_g*M, BK] @ [BK, BN] mixed-dtype dot: row (g, m) of the result is
    exactly the group-g partial dot for row m, so per-group scaling/
    zero-correction applies post-dot as before.

    MEASURED on v5e (Llama-8B INT4 b=1 in-model A/B): SLOWER than the
    group variant (85.8 vs 94.9 tok/s) at identical outputs — the single
    big dot costs the same ~5.4µs/tile as the n_g batched dots, so
    pipeline fill is NOT the M=1 bottleneck; the mixed bf16×int4 MXU dot
    itself is issue-limited. Kept selectable (variant="gemv") for future
    sweeps; never chosen by default.
    """
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(qw_ref, bits)  # [BK, BN]
    bk, bn = w.shape
    s = _aux_tile(sc_ref).astype(jnp.float32)  # [n_g, BN]
    n_g = s.shape[0]
    G = bk // n_g
    m = x_ref.shape[0]
    x = jnp.tile(x_ref[:], (n_g, 1))  # [(g, m) rows, BK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_g * m, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_g * m, bk), 1)
    xd = jnp.where(rows // m == cols // G, x, 0)
    dots = jax.lax.dot_general(
        xd, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(n_g, m, bn)
    if symmetric:
        acc_ref[:] += jnp.sum(dots * s[:, None, :], axis=0)
    else:
        xsum = jnp.sum(xd.astype(jnp.float32), axis=1).reshape(n_g, m)
        z = _aux_tile(zp_ref).astype(jnp.float32)
        corr = xsum[:, :, None] * z[:, None, :]
        acc_ref[:] += jnp.sum((dots - corr) * s[:, None, :], axis=0)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4a8_kernel(x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool):
    """W4A8: INT8 activations × INT4/8 weights on the MXU's integer path.

    The v5e MXU issues int8×int8 dots at 2× the bf16 rate (394 vs 197
    TOPS), and mixed bf16×int4 dots run on the bf16 path — so when the
    M=1 bottleneck is dot issue rate (measured: see _gemv_kernel note),
    integer dots can double it. Activations arrive bf16 and are quantized
    to int8 IN-KERNEL, per (row, k-block): x_blk ≈ xq * s_x with
    s_x = absmax/127 over the block. Per-block scales are finer-grained
    than per-row (slightly more accurate) and keep the whole quantize →
    int-dot → rescale chain inside one pallas_call — no XLA-side quantize
    or output-rescale launches between projections. In-kernel the dot
    structure matches _group_kernel: per-group int dots (int32
    accumulation), post-dot group scaling, Marlin-style zero correction
    (xsum in int32).
    """
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Mosaic's integer matmul path needs BOTH operands int8 ("Mix int/int
    # - NYI" on int8 x int4) — widen the int4 tile; the convert is VPU work
    # overlapped with the dots, and the int8 dot still runs at 2x bf16 rate.
    # QUANT_W4A8_WIDEN=bf16 probes routing the widen through the free
    # int4→bf16 hardware convert (value-identical; perf A/B only).
    widen = _env_str("QUANT_W4A8_WIDEN", "direct")
    packed = qw_ref[:]
    if packed.ndim > 2:  # tiled [1, R, W] / layer-stacked [1, 1, R, W]
        packed = packed.reshape(packed.shape[-2:])
    pack = 2 if bits == 4 else 1
    bk = packed.shape[0] * pack
    bn = packed.shape[1]
    s = _aux_tile(sc_ref).astype(jnp.float32)  # [n_g, BN]
    n_g = s.shape[0]
    G = bk // n_g
    m = x_ref.shape[0]
    if _env_int("QUANT_W4A8_SKIP_XQ", 0):
        # Timing-only probe (outputs wrong): bypass the per-cell activation
        # quantization to measure whether its VPU work sits on the critical
        # path or is already overlapped with the weight DMA.
        sx = jnp.ones((m, 1), jnp.float32)
        xq = x_ref[:].astype(jnp.int8)
    else:
        xf = x_ref[:].astype(jnp.float32)  # [M, BK] bf16 → f32
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-10
        ) / 127.0  # [M, 1] per-(row, k-block)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    # Sub-chunk software pipeline (QUANT_W4A8_SUBCHUNKS, default 1): split
    # the k-block so the VPU widen of sub-chunk j+1 is independent of the
    # MXU dot of sub-chunk j — Mosaic's scheduler can then overlap them
    # instead of serializing one whole-tile widen before one whole-tile
    # dot. The packed int8 tile is sliced BEFORE the int4 bitcast (Mosaic
    # rejects reshapes/indexing on int4 vectors). Value-identical: sx is
    # computed once over the full k-block.
    n_sub = _env_int("QUANT_W4A8_SUBCHUNKS", 1)
    if n_g % n_sub != 0:
        n_sub = 1
    g_sub = n_g // n_sub
    rows_sub = packed.shape[0] // n_sub
    total = jnp.zeros((m, bn), jnp.float32)
    for j in range(n_sub):
        pj = (
            packed
            if n_sub == 1
            else packed[j * rows_sub : (j + 1) * rows_sub, :]
        )
        raw_j = pltpu.bitcast(pj, jnp.int4) if bits == 4 else pj
        if bits == 4 and widen == "bf16":
            wj = raw_j.astype(jnp.bfloat16).astype(jnp.int8)
        else:
            wj = raw_j.astype(jnp.int8)  # [BK/n_sub, BN]
        wj = wj.reshape(g_sub, G, bn)
        xj = (
            xq
            if n_sub == 1
            else xq[:, j * (bk // n_sub) : (j + 1) * (bk // n_sub)]
        ).reshape(m, g_sub, G).transpose(1, 0, 2)  # int8 [g_sub, M, G]
        dots = jax.lax.dot_general(
            xj, wj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # [g_sub, M, BN]
        sj = s[j * g_sub : (j + 1) * g_sub, :]
        if symmetric:
            total += jnp.sum(dots * sj[:, None, :], axis=0)
        else:
            xsum = jnp.sum(xj.astype(jnp.int32), axis=2).astype(jnp.float32)
            z = _aux_tile(zp_ref).astype(jnp.float32)[
                j * g_sub : (j + 1) * g_sub, :
            ]
            corr = xsum[:, :, None] * z[:, None, :]
            total += jnp.sum((dots - corr) * sj[:, None, :], axis=0)
    acc_ref[:] += total * sx

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _w4a8_gemv_kernel(
    x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool
):
    """W4A8 with ONE int8 MXU dot per tile via a block-diagonal activation
    matrix (the _gemv_kernel trick on the integer path): row (g, m) of
    xd @ w is exactly group g's partial dot for row m, so per-group
    post-dot scaling applies unchanged. At M=1 the n_g separate [1, G]
    int dots of _w4a8_kernel are MXU-issue-bound; one [n_g, BK] @ [BK, BN]
    dot trades 16x redundant MACs for a single pipelined issue."""
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(qw_ref, bits).astype(jnp.int8)  # [BK, BN]
    bk, bn = w.shape
    s = _aux_tile(sc_ref).astype(jnp.float32)  # [n_g, BN]
    n_g = s.shape[0]
    G = bk // n_g
    m = x_ref.shape[0]
    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-10
    ) / 127.0  # [M, 1]
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    xd = jnp.tile(xq, (n_g, 1))  # [(g, m) rows, BK]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_g * m, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_g * m, bk), 1)
    xd = jnp.where(rows // m == cols // G, xd, 0)
    dots = jax.lax.dot_general(
        xd, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(n_g, m, bn).astype(jnp.float32)
    if symmetric:
        acc_ref[:] += jnp.sum(dots * s[:, None, :], axis=0) * sx
    else:
        xsum = jnp.sum(
            xd.astype(jnp.int32), axis=1
        ).reshape(n_g, m).astype(jnp.float32)
        z = _aux_tile(zp_ref).astype(jnp.float32)
        corr = xsum[:, :, None] * z[:, None, :]
        acc_ref[:] += jnp.sum((dots - corr) * s[:, None, :], axis=0) * sx

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dequant_kernel(x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool):
    """Dequantize the weight tile in VMEM, then ONE large dot per cell.

    The int4→bf16 convert is free; the per-group scale is a single VPU
    multiply over the tile. One [M, BK] @ [BK, BN] dot pipelines through the
    MXU far better than n_g small batched dots when M is tiny.
    """
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_tile(qw_ref, bits)
    bk, bn = w.shape
    s = _aux_tile(sc_ref).astype(jnp.bfloat16)  # [n_g, BN]
    n_g = s.shape[0]
    G = bk // n_g
    wg = w.reshape(n_g, G, bn)
    if symmetric:
        wd = wg.astype(jnp.bfloat16) * s[:, None, :]
    else:
        z = _aux_tile(zp_ref).astype(jnp.bfloat16)  # [n_g, BN]
        wd = (wg.astype(jnp.bfloat16) - z[:, None, :]) * s[:, None, :]
    wd = wd.reshape(bk, bn)
    acc_ref[:] += jnp.dot(x_ref[:], wd, preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _stream_only_kernel(
    x_ref, qw_ref, sc_ref, *rest, n_k: int, bits: int, symmetric: bool
):
    """DMA-ceiling probe body (env QUANT_STREAM_ONLY=1): same grid, same
    streamed tiles, but the matmul is replaced by a one-row touch of each
    buffer. The per-layer time under this body is the pure weight-stream
    floor the machine actually sustains for this access pattern — the
    denominator question VERDICT r4 #1 asks ("is 819 GB/s reachable?").
    Outputs are garbage; timing-diagnostic only."""
    if symmetric:
        o_ref, acc_ref = rest
        zp_ref = None
    else:
        zp_ref, o_ref, acc_ref = rest
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qw = qw_ref[:]
    if qw.ndim > 2:
        qw = qw.reshape(qw.shape[-2:])
    s = _aux_tile(sc_ref)
    # One sublane row of each streamed buffer, broadcast onto the acc —
    # consumes the DMA targets at negligible VPU cost (the explicit
    # semaphore waits already order the copies; this keeps Mosaic from
    # folding the buffers away entirely).
    touch = qw[0:1, :].astype(jnp.float32) * s[0:1, :].astype(jnp.float32)
    if zp_ref is not None:
        touch = touch + _aux_tile(zp_ref)[0:1, :].astype(jnp.float32)
    acc_ref[:] += touch + x_ref[0:1, 0:1].astype(jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _env_int(name: str, default: int) -> int:
    import os

    return int(os.environ.get(name, default))


def _env_str(name: str, default: str) -> str:
    import os

    return os.environ.get(name, default)


@functools.cache
def _default_backend() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def _shrink_block_k(block_k: int, K: int, chunk: int) -> int:
    """Largest multiple of `chunk` that divides K and is <= block_k
    (falls back to K when K itself isn't alignable). A partial k-tile is
    also an x-block LANE extent, so Mosaic additionally requires it be a
    multiple of 128 (a 1216-wide block for K=10944 is rejected at
    lowering); only the full-K block escapes that rule."""
    import math

    chunk = math.lcm(chunk, 128)
    if K % chunk == 0 and K > chunk:
        bk = (min(block_k, K) // chunk) * chunk
        while bk > chunk and K % bk != 0:
            bk -= chunk
        return max(bk, chunk)
    return K


def _pick_blocks(M: int, K: int, N: int, bits: int) -> tuple[int, int, str]:
    """(block_n, block_k, variant) defaults per shape class, from v5e sweeps
    (benchmarks/quant_kernel_bench.py). Env QUANT_BLOCK_N/K and
    QUANT_VARIANT override for experiments."""
    bn = _env_int("QUANT_BLOCK_N", 0)
    bk = _env_int("QUANT_BLOCK_K", 0)
    # Decode-sized M defaults to W4A8: int8 activation x int8-widened
    # weight dots run on the MXU's integer path at 2x the bf16 rate, which
    # is the M=1 bottleneck (measured in-model on v5e: Llama-8B INT4 b=1
    # 94.8 -> 117.7 tok/s; ppl delta on the trained fixture +0.002%).
    # Prefill (M > 64) overrides back to the bf16 large-dot paths below.
    variant = _env_str("QUANT_VARIANT", "") or ("w4a8" if M <= 64 else "group")
    return (bn or 4096, bk or 2048, variant)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bits", "block_n", "block_k", "backend", "symmetric", "variant",
        "rms_eps", "interpret",
    ),
)
def quant_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    qweight: jnp.ndarray,  # int4: int8[K//2, N]; int8: int8[K, N]
    scales: jnp.ndarray,  # [K//G, N]
    zeros: Optional[jnp.ndarray] = None,  # int8 [K//G, N] (None => symmetric)
    bits: int = 4,
    block_n: int = 0,
    block_k: int = 0,
    backend: Optional[str] = None,
    symmetric: bool = False,
    variant: str = "",
    layer: Optional[jnp.ndarray] = None,
    rms_gamma: Optional[jnp.ndarray] = None,  # [K]: fused RMSNorm prologue
    rms_eps: float = 1e-6,
    interpret: bool = False,  # run the TPU kernels in Pallas interpret mode
) -> jnp.ndarray:
    """x @ dequant(qweight) with fused dequantization.

    qweight/scales/zeros may be flat ([K(/2), N]) or tiled ([N/W, K(/2), W],
    see tile_quant_layout); tiled is the fast path (contiguous HBM reads).
    Tiled output is [M, n_n*W] — callers slice off any N padding.

    LAYER-STACKED fast path: 4-dim qweight [L, n_n, R, W] (+ matching
    scales/zeros) with a traced `layer` index streams layer `layer`'s
    tiles DIRECTLY from the stacked HBM array via in-kernel double-
    buffered DMA — no per-layer slice materialization. This is how a
    lax.scan over decoder layers should feed weights on TPU: slicing the
    scan xs materializes an HBM copy of ~all weight bytes every step
    (measured 408 GB/s scan-sliced vs 586+ GB/s copy-free on v5e), while
    the manual DMA reads the same bytes in place.
    """
    backend = backend or _default_backend()
    M, K = x.shape

    def _apply_rms_xla(x):
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (
            xf * jax.lax.rsqrt(var + rms_eps) * rms_gamma.astype(jnp.float32)
        ).astype(x.dtype)

    stacked = qweight.ndim == 4
    tiled = qweight.ndim == 3 or stacked
    if stacked:
        assert layer is not None, "layer index required for stacked weights"
        N = qweight.shape[1] * qweight.shape[3]
    else:
        N = qweight.shape[0] * qweight.shape[2] if tiled else qweight.shape[-1]
    symmetric = symmetric or zeros is None
    if backend != "tpu" and not interpret:
        if rms_gamma is not None:
            x = _apply_rms_xla(x)
        if stacked:
            qweight = qweight[layer]
            scales = scales[layer]
            if zeros is not None:
                zeros = zeros[layer]
        if tiled:
            perm = (1, 0, 2)
            qweight = qweight.transpose(perm).reshape(qweight.shape[1], N)
            scales = scales.transpose(perm).reshape(scales.shape[1], N)
            if zeros is not None:
                zeros = zeros.transpose(perm).reshape(zeros.shape[1], N)
        z = zeros if zeros is not None else jnp.zeros_like(scales, dtype=jnp.int8)
        return ref_quant_matmul(x, qweight, scales, z, bits)

    dn, dk, dv = _pick_blocks(M, K, N, bits)
    if tiled:
        block_n = qweight.shape[3] if stacked else qweight.shape[2]
    else:
        block_n = block_n or dn
    block_k = block_k or dk
    variant = variant or dv

    G = K // scales.shape[-2]
    if G < 128 and variant in ("group", "w4a8", "w4a8g"):
        # The group variant's [M, n_g, G] reshape/transpose needs the minor
        # dim to span full 128-lane registers; Mosaic rejects smaller G
        # ("unsupported shape cast"). The dequant variant only reshapes the
        # weight tile along sublanes and handles any G (as does gemv).
        variant = "dequant"
    block_n = min(block_n, N)
    # The scales/zeros blocks are [block_k/G, block_n]; Mosaic requires the
    # sublane dim to be a multiple of the dtype's native sublane count (8
    # for 4-byte, 16 for 2-byte) or the full array, so k-tiles are
    # multiples of that*G. block_k must also DIVIDE K exactly: a partial
    # tail tile would feed padding garbage into the accumulation.
    chunk = (16 if scales.dtype.itemsize == 2 else 8) * G
    # VMEM budget: the weight tile is double-buffered by the pipeline, so
    # keep it ≤ 4MB (8MB buffered + x/scales/acc/out well under the 16MB
    # scoped limit). Without this, wide tiles (e.g. the int8 lm_head at
    # W=4096) OOM the scoped vmem stack at compile time.
    w_bytes_per_k = block_n // 2 if bits == 4 else block_n
    max_bk = max((4 * 1024 * 1024) // w_bytes_per_k, chunk)
    if scales.dtype.itemsize == 2 and K % chunk != 0 and K % (8 * G) == 0:
        # bf16 scales need 16*G-aligned k-tiles; for K that are odd
        # multiples of 8*G (5120, 18944, ... 13B/Qwen-class projections)
        # the fallback would otherwise be a full-K tile that can blow the
        # VMEM cap. Upcasting scales to f32 restores 8*G tiling — scale
        # bytes double but tiles stay capped (correct > marginally fast).
        scales = scales.astype(jnp.float32)
        chunk = 8 * G
    if rms_gamma is not None and M <= 64 and K <= max_bk and K % chunk == 0:
        # The fused-norm prologue needs the in-kernel mean over FULL K, so
        # decode-sized fused calls take a single k-tile (K=4096 at W=1024
        # is a 2MB weight tile — inside the VMEM cap).
        block_k = K
    block_k = _shrink_block_k(min(block_k, max_bk), K, chunk)
    if block_k < 1024 and block_k < K <= max_bk:
        # Awkward K (e.g. 2816 = 11×256): shrinking to the largest aligned
        # divisor leaves many tiny k-tiles, each a grid launch + small DMA.
        # The full-K block is always legal (block == array dim) and fits
        # the VMEM budget here — one launch, one big DMA.
        block_k = K
    if block_k > max_bk and not tiled:
        # _shrink_block_k's K-not-chunk-aligned fallback returns full K
        # (the only k-extent that satisfies the sublane rule when K/G is
        # not a multiple of 8). Keep the weight tile under the VMEM cap by
        # shrinking block_n instead — alignment rules stay intact.
        while block_n > 256 and block_k * (block_n // 2 if bits == 4 else block_n) > 4 * 1024 * 1024:
            block_n //= 2
    assert block_k <= max(max_bk, (4 * 1024 * 1024) // (block_n // 2 if bits == 4 else block_n)), (
        f"quant_matmul: K={K} G={G} needs a full-K weight tile "
        f"({block_k}x{block_n}) that exceeds the 4MB VMEM budget; "
        f"re-tile the stored layout (smaller tile_n) or use f32 scales"
    )
    assert K % block_k == 0, (K, block_k)
    n_n = pl.cdiv(N, block_n)
    n_k = K // block_k
    # M tiling: decode batches (small M) run as a single tile (padding small
    # M to sublane multiples measurably hurt at M=1), but prefill batches
    # must be tiled or they blow past the 16MB scoped-VMEM limit: the
    # group variant materializes an [n_g, BM, BN] f32 intermediate and the
    # dequant variant a [BK, BN] bf16 tile, so large M needs an M grid dim
    # plus either a smaller BN (flat layout; measured OOMs at M=512 with
    # BN=4096: 18-23M) or the dequant variant with a smaller BK (tiled
    # layout, where BN is pinned to the stored tile width). M>64 is
    # prefill -> compute-bound; the extra weight re-fetches per M tile are
    # amortized by the MXU work.
    if M > 64:
        if variant in ("gemv", "w4a8", "w4a8g"):
            # gemv's [n_g*M, BK] block-diagonal matrix only pays off for
            # small M; w4a8's accuracy trade is tuned for decode. Prefill
            # goes through the large-dot paths below.
            variant = "group"
        if tiled or variant == "dequant":
            variant = "dequant"
            block_k = _shrink_block_k(
                min(block_k, max(4 * 1024 * 1024 // (block_n * 2), chunk)),
                K, chunk,
            )
            if not tiled:
                block_n = min(block_n, 2048)
                n_n = pl.cdiv(N, block_n)
        else:
            block_n = min(block_n, 512)
            n_n = pl.cdiv(N, block_n)
            variant = "group"
    n_k = K // block_k
    block_m = M if M <= 256 else 256
    n_m = pl.cdiv(M, block_m)

    qk_rows = block_k // 2 if bits == 4 else block_k
    kernel = {
        "group": _group_kernel,
        "dequant": _dequant_kernel,
        "gemv": _gemv_kernel,
        "w4a8": _w4a8_kernel,
        "w4a8g": _w4a8_gemv_kernel,
    }[variant]

    # Fused RMSNorm prologue: viable when one k-tile spans all of K (the
    # in-kernel mean needs full K) and one m-tile (scratch persistence);
    # otherwise fall back to the identical XLA-side norm.
    fuse_rms = rms_gamma is not None and n_k == 1 and n_m == 1
    if os.environ.get("QUANT_DEBUG"):
        print(f"quant_matmul M={M} K={K} N={N} variant={variant} "
              f"bk={block_k} bn={block_n} fuse_rms={fuse_rms}",
              file=sys.stderr)
    if rms_gamma is not None and not fuse_rms:
        x = _apply_rms_xla(x)

    # w4a8 quantizes activations in-kernel (per k-block); all variants take
    # bf16 activations.
    x_op = x.astype(jnp.bfloat16)

    if stacked:
        # Flatten [L, n_n, ...] -> [L*n_n, ...]; the kernel streams tiles
        # from the stacked HBM array itself with MANUAL double-buffered DMA
        # at a dynamic (layer, n, k) offset. A BlockSpec index_map that
        # depends on the layer scalar does NOT pipeline (Mosaic falls back
        # to serial DMA-compute: measured 56 GB/s vs 270 for static maps),
        # so the copies are issued in-kernel one grid step ahead, exactly
        # like ops/decode_attention.py streams KV pages.
        Lq = qweight.shape[0]
        qweight = qweight.reshape(Lq * n_n, *qweight.shape[2:])
        scales = scales.reshape(Lq * scales.shape[1], *scales.shape[2:])
        if zeros is not None:
            zeros = zeros.reshape(Lq * zeros.shape[1], *zeros.shape[2:])
        w_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        aux_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        x_spec = pl.BlockSpec(
            (block_m, block_k), lambda m, n, k, lr: (m, k),
            memory_space=pltpu.VMEM,
        )
        o_spec = pl.BlockSpec(
            (block_m, block_n), lambda m, n, k, lr: (m, n),
            memory_space=pltpu.VMEM,
        )
    elif tiled:
        w_spec = pl.BlockSpec(
            (1, qk_rows, block_n), lambda m, n, k: (n, k, 0),
            memory_space=pltpu.VMEM,
        )
        aux_spec = pl.BlockSpec(
            (1, block_k // G, block_n), lambda m, n, k: (n, k, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        w_spec = pl.BlockSpec(
            (qk_rows, block_n), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
        )
        aux_spec = pl.BlockSpec(
            (block_k // G, block_n), lambda m, n, k: (k, n),
            memory_space=pltpu.VMEM,
        )
    if not stacked:
        x_spec = pl.BlockSpec(
            (block_m, block_k), lambda m, n, k: (m, k), memory_space=pltpu.VMEM
        )
        o_spec = pl.BlockSpec(
            (block_m, block_n), lambda m, n, k: (m, n), memory_space=pltpu.VMEM
        )
    in_specs = [x_spec, w_spec, aux_spec]
    operands = [x_op, qweight, scales]
    n_stack = qweight.shape[0] if stacked else 1
    bytes_w = (
        qweight.size * 1 + scales.size * scales.dtype.itemsize
    ) // n_stack
    if not symmetric:
        in_specs.append(aux_spec)
        operands.append(zeros)
        bytes_w += zeros.size // n_stack
    if fuse_rms:
        g2 = jnp.asarray(rms_gamma).reshape(1, K)
        g_spec = pl.BlockSpec(
            (1, block_k),
            (lambda m, n, k, lr: (0, k)) if stacked else (lambda m, n, k: (0, k)),
            memory_space=pltpu.VMEM,
        )
        in_specs.append(g_spec)
        operands.append(g2)

    if _env_int("QUANT_STREAM_ONLY", 0) and stacked:
        # DMA-ceiling probe (timing only): layer-stacked projections stream
        # with a touch-only body; the (flat) lm_head stays real so the
        # fixed per-step cost is unchanged and per-layer slopes compare
        # directly against the full run.
        kernel = _stream_only_kernel
    body = functools.partial(kernel, n_k=n_k, bits=bits, symmetric=symmetric)
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # The stacked path's in-kernel DMA sequencing assumes the grid
            # executes in linear order.
            dimension_semantics=(
                ("arbitrary", "arbitrary", "arbitrary")
                if stacked
                else ("parallel", "parallel", "arbitrary")
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=bytes_w + M * K * 2 + M * N * 2,
            transcendentals=0,
        ),
    )
    scratch = [pltpu.VMEM((block_m, block_n), jnp.float32)]
    if stacked:
        g_rows = block_k // G
        depth = _env_int("QUANT_STREAM_DEPTH", 3)
        stream = functools.partial(
            _stream_kernel,
            body=body,
            n_m=n_m,
            n_n=n_n,
            n_k=n_k,
            qk_rows=qk_rows,
            g_rows=g_rows,
            symmetric=symmetric,
            depth=depth,
            fuse_rms=fuse_rms,
            eps=rms_eps,
        )
        split = max(1, _env_int("QUANT_STREAM_SPLIT", 1))
        sem_q_shape = (
            (depth, split) if split > 1 and qk_rows % split == 0 else (depth,)
        )
        scratch = [
            pltpu.VMEM((block_m, block_n), jnp.float32),  # acc
            pltpu.VMEM((depth, qk_rows, block_n), jnp.int8),  # qw ring
            pltpu.VMEM((depth, g_rows, block_n), scales.dtype),
            pltpu.SemaphoreType.DMA(sem_q_shape),
            pltpu.SemaphoreType.DMA((depth,)),
        ]
        if not symmetric:
            scratch += [
                pltpu.VMEM((depth, g_rows, block_n), jnp.int8),
                pltpu.SemaphoreType.DMA((depth,)),
            ]
        if fuse_rms:
            scratch.append(pltpu.VMEM((block_m, block_k), x_op.dtype))
        out = pl.pallas_call(
            stream,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_m, n_n, n_k),
                in_specs=in_specs,
                out_specs=o_spec,
                scratch_shapes=scratch,
            ),
            interpret=interpret,
            **kwargs,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    else:
        if fuse_rms:
            body = functools.partial(
                _rms_wrap, body=body, eps=rms_eps
            )
            scratch.append(pltpu.VMEM((block_m, block_k), x_op.dtype))
        out = pl.pallas_call(
            body,
            grid=(n_m, n_n, n_k),
            in_specs=in_specs,
            out_specs=o_spec,
            scratch_shapes=scratch,
            interpret=interpret,
            **kwargs,
        )(*operands)
    return out


def _stream_kernel(
    lr_ref,
    x_ref,
    qw_hbm,
    sc_hbm,
    *rest,
    body,
    n_m: int,
    n_n: int,
    n_k: int,
    qk_rows: int,
    g_rows: int,
    symmetric: bool,
    depth: int = 2,
    fuse_rms: bool = False,
    eps: float = 0.0,
):
    """Layer-stacked streaming wrapper around the compute bodies.

    qw/scales(/zeros) arrive as the FULL stacked HBM arrays
    ([L*n_n, rows, W]); this wrapper double-buffers (2-deep) manual DMA of
    one (n, k) tile per grid step at the dynamic layer offset lr_ref[0],
    issuing step s+1's copies before computing step s — the same idiom
    decode_attention.py uses for KV pages. BlockSpec index_maps that read
    the layer scalar do not pipeline (Mosaic serializes them), hence
    manual copies."""
    g_ref = xn_ref = None
    if fuse_rms:
        *rest, xn_ref = rest
    if symmetric:
        zp_hbm = None
        if fuse_rms:
            g_ref, o_ref, acc_ref, qw_buf, sc_buf, sem_q, sem_s = rest
        else:
            o_ref, acc_ref, qw_buf, sc_buf, sem_q, sem_s = rest
        zp_buf = sem_z = None
    elif fuse_rms:
        (zp_hbm, g_ref, o_ref, acc_ref, qw_buf, sc_buf, sem_q, sem_s,
         zp_buf, sem_z) = rest
    else:
        (zp_hbm, o_ref, acc_ref, qw_buf, sc_buf, sem_q, sem_s,
         zp_buf, sem_z) = rest
    m = pl.program_id(0)
    n = pl.program_id(1)
    k = pl.program_id(2)
    lin = (m * n_n + n) * n_k + k
    total = n_m * n_n * n_k
    base = lr_ref[0] * n_n

    probe = _env_int("QUANT_STREAM_ONLY", 0)
    # Split each weight-tile copy into `split` row-range sub-copies on
    # separate semaphores: concurrent sub-copies can engage more DMA
    # queues than one large copy (probe: QUANT_STREAM_SPLIT).
    split = max(1, _env_int("QUANT_STREAM_SPLIT", 1))
    rows_half = qk_rows // split if qk_rows % split == 0 else qk_rows

    def copies(lin2, slot):
        n2 = (lin2 // n_k) % n_n
        k2 = lin2 % n_k
        if rows_half != qk_rows:
            cp = [
                pltpu.make_async_copy(
                    qw_hbm.at[
                        base + n2,
                        pl.ds(k2 * qk_rows + h * rows_half, rows_half),
                        :,
                    ],
                    qw_buf.at[slot, pl.ds(h * rows_half, rows_half), :],
                    sem_q.at[slot, h],
                )
                for h in range(split)
            ]
        else:
            cp = [
                pltpu.make_async_copy(
                    qw_hbm.at[base + n2, pl.ds(k2 * qk_rows, qk_rows), :],
                    qw_buf.at[slot],
                    sem_q.at[slot],
                ),
            ]
        if probe != 2:  # QUANT_STREAM_ONLY=2: weights-only DMA probe
            cp.append(
                pltpu.make_async_copy(
                    sc_hbm.at[base + n2, pl.ds(k2 * g_rows, g_rows), :],
                    sc_buf.at[slot],
                    sem_s.at[slot],
                )
            )
        if zp_hbm is not None:
            cp.append(
                pltpu.make_async_copy(
                    zp_hbm.at[base + n2, pl.ds(k2 * g_rows, g_rows), :],
                    zp_buf.at[slot],
                    sem_z.at[slot],
                )
            )
        return cp

    slot = jax.lax.rem(lin, depth)

    @pl.when(lin == 0)
    def _():
        # prologue: start the first depth-1 tiles' copies
        for d in range(depth - 1):
            if d == 0:
                for c in copies(lin, slot):
                    c.start()
            else:
                @pl.when(d < total)
                def _(d=d):
                    for c in copies(d, jax.lax.rem(d, depth)):
                        c.start()

    @pl.when(lin + depth - 1 < total)
    def _():
        nxt = lin + depth - 1
        for c in copies(nxt, jax.lax.rem(nxt, depth)):
            c.start()

    if fuse_rms:
        # Norm once per call (x is the same block for every grid cell:
        # n_m == 1 and n_k == 1 are fusion preconditions) — the sequential
        # grid and persistent scratch make the lin==0 result visible to
        # all later cells.
        @pl.when(lin == 0)
        def _():
            _fused_rms(x_ref, g_ref, xn_ref, eps)

    for c in copies(lin, slot):
        c.wait()

    args = [xn_ref if fuse_rms else x_ref, qw_buf.at[slot], sc_buf.at[slot]]
    if not symmetric:
        args.append(zp_buf.at[slot])
    body(*args, o_ref, acc_ref)
