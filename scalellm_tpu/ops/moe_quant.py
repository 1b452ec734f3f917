"""Quantized MoE expert matmuls: int8 (per-expert per-channel scales) and
int4 (packed nibbles, per-(expert, k-group, channel) grids — the standard
int4-g128 recipe).

The reference has no quantized-MoE path at all (its MoE stack is bf16 and
its deepseek model is a TODO, src/models/deepseek/README.md); real
DeepSeek-V2-class checkpoints are served quantized in practice, and on a
16 GB v5e chip quantized experts are the difference between fitting the
model and not (V2-Lite experts: 28.8 GB bf16 → 14.4 int8 → 7.2 int4,
which fits the FULL 27-layer model on one chip).

Two TPU paths, split by batch size:

- DECODE (row count ≤ 256): a Pallas kernel that streams ONLY the routed
  experts' weight blocks from HBM (double-buffered manual DMA over a
  compacted active-expert list computed in-graph). A decode token routes
  to top-k experts, so the step reads k/E of the expert bytes — the whole
  point of MoE — where a dense dequant would read all of them.
- PREFILL: int8→bf16 cast + the stock megablox grouped matmul (gmm), then
  a per-row scale (rows are expert-sorted, so the row's expert comes from
  repeat(arange(E), group_sizes)). The cast materializes one matrix
  transiently; prefill is compute-bound so the extra HBM pass is noise.

Storage: int8 = qweight [E, K, N] + scales [E, N] (per-channel; scales
distribute out of the contraction so the dot runs on raw int8).
int4 = qweight packed [E, K//2, N] (quant_matmul.pack_int4 nibble order:
the in-kernel unpack is a free bitcast + hardware int4→bf16 convert) +
scales [E, K/G, N], applied post-dot per k-group. Layer-stacked [L, ...]
variants stream at a dynamic layer offset (no scan-slice copies).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_experts_int8(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[E, K, N] float → (int8 [E, K, N], scales f32 [E, N]) symmetric
    per-(expert, out-channel)."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.maximum(np.abs(w).max(axis=1), 1e-8)  # [E, N]
    scales = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scales[:, None, :]), -127, 127).astype(np.int8)
    return q, scales


def quantize_experts_int4(
    w: np.ndarray, group_size: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """[E, K, N] float → (packed int8 [E, K//2, N], scales [E, K/G, N])
    symmetric per-(expert, k-group, out-channel) — the standard int4-g128
    grid. Nibble layout matches ops/quant_matmul.pack_int4 (little-endian
    int4 element order: the in-kernel unpack is a free bitcast+convert).
    Scales are grid-roundtripped through scales_np_dtype() (see
    quant_matmul.quantize_int4) so storage is lossless by construction."""
    from scalellm_tpu.ops.quant_matmul import pack_int4, scales_np_dtype

    w = np.asarray(w, dtype=np.float32)
    E, K, N = w.shape
    assert K % group_size == 0
    g = w.reshape(E, K // group_size, group_size, N)
    absmax = np.maximum(np.abs(g).max(axis=2), 1e-8)  # [E, K/G, N]
    scales = np.maximum((absmax / 7.0).astype(np.float32), 1e-10)
    scales = scales.astype(scales_np_dtype())
    q = np.clip(
        np.round(g / scales[:, :, None, :].astype(np.float32)), -8, 7
    )
    qu = (q + 8).astype(np.uint8).reshape(E, K, N)
    packed = np.stack([pack_int4(qu[e]) for e in range(E)])
    return packed, np.asarray(scales)


def _dequant_int4(packed, scales, group_size: int = 128):
    """Dequant one expert's packed int4 [K//2, N] → f32 [K, N] (pure jnp:
    traceable under jit — the CPU/XLA reference unpack)."""
    u = packed.astype(jnp.uint8)
    # Raw nibbles are two's-complement signed: value = ((r + 8) & 15) - 8.
    lo = (((u & 15) + 8) & 15).astype(jnp.float32) - 8.0
    hi = ((((u >> 4) & 15) + 8) & 15).astype(jnp.float32) - 8.0
    K2, N = u.shape
    K = K2 * 2
    qu = jnp.stack([lo, hi], axis=1).reshape(K, N)
    sc = scales.astype(jnp.float32)  # [K/G, N]
    out = qu.reshape(K // group_size, group_size, N) * sc[:, None, :]
    return out.reshape(K, N)


def _ref_grouped_quant_matmul(xs, qw, scales, group_sizes, starts=None):
    """CPU/reference path: dequantize per expert, masked accumulation.
    scales [E, N] = int8 per-channel; scales [E, K/G, N] = packed int4
    with per-group grids. `starts` overrides the expert-sorted row
    offsets (cumsum of group_sizes) for the T=1 fast-dispatch layout
    where row j belongs to top-k slot j's expert, unsorted."""
    E = qw.shape[0]
    int4 = scales.ndim == 3
    if starts is None:
        starts = jnp.cumsum(group_sizes) - group_sizes
    bounds = starts + group_sizes
    t_idx = jnp.arange(xs.shape[0])[:, None]
    out = jnp.zeros((xs.shape[0], qw.shape[-1]), jnp.float32)
    xf = xs.astype(jnp.float32)
    for e in range(E):
        mask = ((t_idx >= starts[e]) & (t_idx < bounds[e])).astype(jnp.float32)
        if int4:
            K = qw.shape[1] * 2
            G = K // scales.shape[1]
            w_e = _dequant_int4(qw[e], scales[e], G)
        else:
            w_e = qw[e].astype(jnp.float32) * scales[e][None, :]
        out = out + mask * jnp.dot(xf, w_e, preferred_element_type=jnp.float32)
    return out


def _decode_kernel(
    lr_ref,  # i32[1] layer index into a stacked [L, E, K, N] array (or 0)
    act_ref,  # i32[E] compacted active experts, -1 padded (scalar prefetch)
    starts_ref,  # i32[E] group start row per EXPERT id
    sizes_ref,  # i32[E] group size per EXPERT id
    xs_ref,  # [Tp, K] bf16 (VMEM)
    qw_hbm,  # int8 [E, K, N] or layer-stacked [L, E, K, N] (ANY)
    sc_ref,  # int8: f32 [E, N] VMEM block; int4: [(L,) E, n_g, N] HBM (ANY)
    o_ref,  # [Tp, N] f32
    w_bufs,  # VMEM [2, K, N] int8 (int4: [2, K//2, N] packed)
    sems,  # DMA [2]
    *rest,  # int4 streamed-scales mode: sc_bufs VMEM [2, n_g, N] + sem DMA
    stacked: bool,
    bits: int,
    sc_stream: bool,
):
    i = pl.program_id(0)
    E = pl.num_programs(0)
    e = act_ref[i]
    valid = e >= 0
    sc_bufs = sem_sc = None
    if sc_stream:
        sc_bufs, sem_sc = rest

    def src(expert):
        if stacked:  # layer-stacked: stream at the layer offset
            return qw_hbm.at[lr_ref[0], expert]
        return qw_hbm.at[expert]

    def copies(expert, slot):
        """Weight tile + (int4) the ACTIVE expert's scale rows only —
        streaming the whole per-layer scale grid into VMEM (or slicing it
        at the XLA level) costs ~2.9 MB × 3 matmuls × layer on V2-Lite;
        the active rows are ~45 KB each."""
        cp = [pltpu.make_async_copy(src(expert), w_bufs.at[slot],
                                    sems.at[slot])]
        if sc_stream:
            sc_src = (
                sc_ref.at[lr_ref[0], expert] if stacked
                else sc_ref.at[expert]
            )
            cp.append(pltpu.make_async_copy(
                sc_src, sc_bufs.at[slot], sem_sc.at[slot]
            ))
        return cp

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

        # Under expert-parallel sharding a shard can have ZERO active
        # experts (all its tokens routed remotely): act_ref is all -1 and
        # an ungated prologue DMA would read at dynamic index -1 with no
        # matching wait (Mosaic does not clamp dynamic DMA offsets — same
        # failure class as the MLA OOB q DMA). Gate the start on a real
        # expert; every started copy is then waited by its valid step.
        @pl.when(act_ref[0] >= 0)
        def _():
            for c in copies(jnp.maximum(act_ref[0], 0), 0):
                c.start()

    @pl.when(valid)
    def _():
        nxt = jnp.minimum(i + 1, E - 1)

        @pl.when(jnp.logical_and(i + 1 < E, act_ref[nxt] >= 0))
        def _():
            for c in copies(act_ref[nxt], (i + 1) % 2):
                c.start()

        slot = i % 2
        for c in copies(e, slot):
            c.wait()

        if bits == 8:
            w = w_bufs[slot]  # int8 [K, N]; MXU consumes int8 in mixed dots
            dots = jax.lax.dot_general(
                xs_ref[:], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Tp, N]
            sc = sc_ref[pl.ds(e, 1), :].astype(jnp.float32)  # [1, N]
            dots = dots * sc
        else:  # int4: per-(k-group, channel) grids, post-dot group scaling
            # Per-group small dots, NOT dequant-then-one-dot: the full-tile
            # dequant writes a [K, N] bf16 intermediate through VMEM and
            # measured 33 µs/layer SLOWER on V2-Lite decode (198.9 vs
            # 240.7 tok/s) than eating n_g small-dot launches.
            packed = w_bufs[slot]  # int8 [K//2, N]
            if sc_stream:
                sc = sc_bufs[slot].astype(jnp.float32)[None]  # [1, n_g, N]
            else:
                sc = sc_ref[pl.ds(e, 1), :, :].astype(jnp.float32)
            n_g = sc.shape[1]
            rows_g = packed.shape[0] // n_g  # G//2 packed rows per group
            G = rows_g * 2
            dots = jnp.zeros(o_ref.shape, jnp.float32)
            for g in range(n_g):
                # Slice the packed tile BEFORE the int4 bitcast (Mosaic
                # rejects reshapes/indexing on int4 vectors); the
                # int4→bf16 convert is a free hardware cast.
                pk = packed[g * rows_g:(g + 1) * rows_g, :]
                wb = pltpu.bitcast(pk, jnp.int4).astype(jnp.bfloat16)
                xg = xs_ref[:, g * G:(g + 1) * G]
                d = jax.lax.dot_general(
                    xg, wb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dots = dots + d * sc[:, g, :]
        start = starts_ref[e]
        size = sizes_ref[e]
        rows = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
        in_grp = jnp.logical_and(rows >= start, rows < start + size)
        o_ref[:] += jnp.where(in_grp, dots, 0.0)


def _decode_kernel_pair(
    lr_ref,  # i32[1] layer index (or 0)
    act_ref,  # i32[E] compacted active experts, -1 padded (scalar prefetch)
    starts_ref,  # i32[E]
    sizes_ref,  # i32[E]
    xs_ref,  # [Tp, K] bf16 (VMEM)
    qg_hbm,  # gate weights int8 [(L,) E, Kw, N] (ANY)
    qu_hbm,  # up weights, same shape (ANY)
    scg_ref,  # gate scales (VMEM block or HBM, see sc_stream)
    scu_ref,  # up scales
    og_ref,  # [Tp, N] f32
    ou_ref,  # [Tp, N] f32
    wg_bufs,  # VMEM [2, Kw, N] int8
    wu_bufs,  # VMEM [2, Kw, N] int8
    sems_g,  # DMA [2]
    sems_u,  # DMA [2]
    *rest,  # sc_stream: scg_bufs, scu_bufs VMEM [2, n_g, N] + 2 sems
    stacked: bool,
    bits: int,
    sc_stream: bool,
):
    """Gate+up fused variant of _decode_kernel: one grid walk over the
    active experts streams BOTH projections' weight tiles (two 2-deep
    rings) and emits both outputs — halving the per-layer routed kernel
    launches (3 → 2) and the dispatch/scalar-prefetch overhead that goes
    with them (DEEPSEEK_DECOMP.md: ~8 launches/layer was a named
    above-floor cost). Same DMA-safety gating as _decode_kernel (EP
    zero-active shards start nothing)."""
    i = pl.program_id(0)
    E = pl.num_programs(0)
    e = act_ref[i]
    valid = e >= 0
    if sc_stream:
        scg_bufs, scu_bufs, sem_scg, sem_scu = rest

    def copies(expert, slot):
        def src(hbm):
            return hbm.at[lr_ref[0], expert] if stacked else hbm.at[expert]

        cp = [
            pltpu.make_async_copy(src(qg_hbm), wg_bufs.at[slot],
                                  sems_g.at[slot]),
            pltpu.make_async_copy(src(qu_hbm), wu_bufs.at[slot],
                                  sems_u.at[slot]),
        ]
        if sc_stream:
            cp.append(pltpu.make_async_copy(
                src(scg_ref), scg_bufs.at[slot], sem_scg.at[slot]))
            cp.append(pltpu.make_async_copy(
                src(scu_ref), scu_bufs.at[slot], sem_scu.at[slot]))
        return cp

    @pl.when(i == 0)
    def _():
        og_ref[:] = jnp.zeros_like(og_ref)
        ou_ref[:] = jnp.zeros_like(ou_ref)

        @pl.when(act_ref[0] >= 0)
        def _():
            for c in copies(jnp.maximum(act_ref[0], 0), 0):
                c.start()

    @pl.when(valid)
    def _():
        nxt = jnp.minimum(i + 1, E - 1)

        @pl.when(jnp.logical_and(i + 1 < E, act_ref[nxt] >= 0))
        def _():
            for c in copies(act_ref[nxt], (i + 1) % 2):
                c.start()

        slot = i % 2
        for c in copies(e, slot):
            c.wait()

        start = starts_ref[e]
        size = sizes_ref[e]
        rows = jax.lax.broadcasted_iota(jnp.int32, og_ref.shape, 0)
        in_grp = jnp.logical_and(rows >= start, rows < start + size)

        for which, (w_bufs, sc_hbm, sc_ring, o_ref) in enumerate((
            (wg_bufs, scg_ref, scg_bufs if sc_stream else None, og_ref),
            (wu_bufs, scu_ref, scu_bufs if sc_stream else None, ou_ref),
        )):
            if bits == 8:
                w = w_bufs[slot]
                dots = jax.lax.dot_general(
                    xs_ref[:], w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sc = sc_hbm[pl.ds(e, 1), :].astype(jnp.float32)
                dots = dots * sc
            else:
                packed = w_bufs[slot]
                if sc_stream:
                    sc = sc_ring[slot].astype(jnp.float32)[None]
                else:
                    sc = sc_hbm[pl.ds(e, 1), :, :].astype(jnp.float32)
                n_g = sc.shape[1]
                rows_g = packed.shape[0] // n_g
                G = rows_g * 2
                dots = jnp.zeros(o_ref.shape, jnp.float32)
                for g in range(n_g):
                    pk = packed[g * rows_g:(g + 1) * rows_g, :]
                    wb = pltpu.bitcast(pk, jnp.int4).astype(jnp.bfloat16)
                    xg = xs_ref[:, g * G:(g + 1) * G]
                    d = jax.lax.dot_general(
                        xg, wb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dots = dots + d * sc[:, g, :]
            o_ref[:] += jnp.where(in_grp, dots, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret", "max_active"))
def _decode_grouped_quant_matmul_pair(xs, qg, scg, qu, scu, group_sizes,
                                      layer=None, active=None, starts=None,
                                      interpret: bool = False,
                                      max_active: int = 0):
    Tp, K = xs.shape
    stacked = qg.ndim == 4
    E, Kw, N = qg.shape[-3:]
    bits = 4 if Kw * 2 == K else 8
    A = min(E, max_active) if max_active else E
    if active is None:
        active = jnp.nonzero(group_sizes > 0, size=A, fill_value=-1)[0]
    if starts is None:
        starts = jnp.cumsum(group_sizes) - group_sizes
    starts = starts.astype(jnp.int32)
    lr = jnp.asarray(layer if layer is not None else 0, jnp.int32).reshape(1)
    scratch = [
        pltpu.VMEM((2, Kw, N), jnp.int8),
        pltpu.VMEM((2, Kw, N), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    sc_stream = bits == 4 and scg.shape[-2] % 8 == 0
    if sc_stream:
        sc_specs = [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        n_g = scg.shape[-2]
        scratch += [
            pltpu.VMEM((2, n_g, N), scg.dtype),
            pltpu.VMEM((2, n_g, N), scu.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        sc_args = (scg, scu)
    else:
        if stacked:
            scg, scu = scg[layer], scu[layer]
        sc_specs = [
            pl.BlockSpec(s.shape, lambda i, *_, nd=s.ndim: (0,) * nd)
            for s in (scg, scu)
        ]
        sc_args = tuple(
            s if bits == 4 else s.astype(jnp.float32) for s in (scg, scu)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((Tp, K), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            *sc_specs,
        ],
        out_specs=[pl.BlockSpec((Tp, N), lambda i, *_: (0, 0))] * 2,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel_pair, stacked=stacked, bits=bits,
                          sc_stream=sc_stream),
        out_shape=[jax.ShapeDtypeStruct((Tp, N), jnp.float32)] * 2,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * Tp * K * N,
            bytes_accessed=2 * min(E, Tp) * Kw * N + Tp * K * 2
            + 2 * Tp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lr, active.astype(jnp.int32), starts, group_sizes.astype(jnp.int32),
        xs.astype(jnp.bfloat16), qg, qu, *sc_args,
    )


def grouped_quant_matmul_pair(xs, w_g: dict, w_u: dict, group_sizes, *,
                              layer=None, backend=None, active=None,
                              starts=None, interpret: bool = False,
                              max_active: int = 0):
    """Fused gate+up routed-expert matmul: returns (g, u), each [Tp, N]
    f32 dequantized. Takes the fused decode kernel when both weight dicts
    are shape-identical and fit the decode-path gates; otherwise falls back
    to two grouped_quant_matmul calls (identical numerics either way)."""
    from scalellm_tpu.ops.quant_matmul import _default_backend

    qg, scg = w_g["qweight"], w_g["scales"]
    qu, scu = w_u["qweight"], w_u["scales"]
    backend = backend or _default_backend()
    Tp, K = xs.shape
    E, Kw, N = qg.shape[-3:]
    bits = 4 if Kw * 2 == K else 8
    if bits == 4 and scg.shape[-2] % 8 == 0:
        n_scale = 2 * 2 * scg.shape[-2] * N
    elif bits == 4:
        n_scale = 2 * E * scg.shape[-2] * N
    else:
        n_scale = 2 * E * N
    decode_vmem = (
        4 * Kw * N  # two int8 weight rings
        + n_scale * (scg.dtype.itemsize if bits == 4 else 4)
        + Tp * K * 2
        + 2 * Tp * N * 4
    )
    fusable = (
        qg.shape == qu.shape
        and scg.shape == scu.shape
        and Tp <= 256
        and decode_vmem <= 12 * 1024 * 1024
        and (backend == "tpu" or interpret)
    )
    if fusable:
        g, u = _decode_grouped_quant_matmul_pair(
            xs, qg, scg, qu, scu, group_sizes, layer=layer, active=active,
            starts=starts, interpret=interpret, max_active=max_active,
        )
        return g, u
    g = grouped_quant_matmul(xs, w_g, group_sizes, layer=layer,
                             backend=backend, active=active, starts=starts,
                             interpret=interpret, max_active=max_active)
    u = grouped_quant_matmul(xs, w_u, group_sizes, layer=layer,
                             backend=backend, active=active, starts=starts,
                             interpret=interpret, max_active=max_active)
    return g, u


@functools.partial(jax.jit, static_argnames=("interpret", "max_active"))
def _decode_grouped_quant_matmul(xs, qw, scales, group_sizes, layer=None,
                                 active=None, starts=None,
                                 interpret: bool = False,
                                 max_active: int = 0):
    Tp, K = xs.shape
    stacked = qw.ndim == 4
    E, Kw, N = qw.shape[-3:]
    bits = 4 if Kw * 2 == K else 8
    assert K == (Kw * 2 if bits == 4 else Kw)
    # Grid = number of experts that CAN be active, not E: a decode batch of
    # T tokens touches at most T*top_k distinct experts (the caller's
    # max_active hint), so b=1 top-6 runs a 6-cell grid instead of 64 —
    # the 58 skipped cells otherwise still pay grid/scalar overhead per
    # kernel call, three calls per MoE layer (VERDICT r5: deepseek decode
    # decomposition).
    A = min(E, max_active) if max_active else E
    if active is None:
        active = jnp.nonzero(group_sizes > 0, size=A, fill_value=-1)[0]
    if starts is None:
        starts = jnp.cumsum(group_sizes) - group_sizes
    starts = starts.astype(jnp.int32)
    lr = jnp.asarray(layer if layer is not None else 0, jnp.int32).reshape(1)
    scratch = [
        pltpu.VMEM((2, Kw, N), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    # int4 grids are big ([E, K/G, N] ≈ 2.9 MB/layer on V2-Lite): an
    # XLA scales[layer] slice per call costs ~0.3 ms/step across the
    # stack, and a scalar-indexed BlockSpec serializes the pipeline
    # (measured 240.7 → 185 tok/s). Stream ONLY the active experts'
    # scale rows in-kernel — possible when the row count is 8-aligned
    # (Mosaic DMA tiling); e.g. V2-Lite moe_gate/up n_g=16 stream,
    # moe_down n_g=11 falls back to the VMEM-block path.
    sc_stream = bits == 4 and scales.shape[-2] % 8 == 0
    if sc_stream:
        sc_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        n_g = scales.shape[-2]
        scratch += [
            pltpu.VMEM((2, n_g, N), scales.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        sc_arg = scales
    else:
        # Whole per-layer grid as a VMEM block (int8 [E, N] is a few
        # hundred KB; unaligned int4 grids have no other option).
        if stacked:
            scales = scales[layer]
        sc_spec = pl.BlockSpec(
            scales.shape, lambda i, *_: (0,) * scales.ndim
        )
        sc_arg = scales if bits == 4 else scales.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((Tp, K), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            sc_spec,
        ],
        out_specs=pl.BlockSpec((Tp, N), lambda i, *_: (0, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel, stacked=stacked, bits=bits,
                          sc_stream=sc_stream),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            # decode expectation: ~top_k experts touched, not E
            bytes_accessed=min(E, Tp) * Kw * N + Tp * K * 2 + Tp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lr, active.astype(jnp.int32), starts, group_sizes.astype(jnp.int32),
        xs.astype(jnp.bfloat16), qw, sc_arg,
    )


def fits_decode_kernel(Tp: int, K: int, w: dict) -> bool:
    """Whether grouped_quant_matmul would take the streaming decode kernel
    for a [Tp, K] activation block against weight dict `w` (the VMEM-budget
    + row-count gate; see the comment in grouped_quant_matmul). Exposed so
    callers building the decode-only T=1 fast-dispatch layout can confirm
    the kernel path — that layout is invalid for the gmm fallback."""
    qw, scales = w["qweight"], w["scales"]
    E, Kw, N = qw.shape[-3:]
    bits = 4 if Kw * 2 == K else 8
    if bits == 4 and scales.shape[-2] % 8 == 0:
        n_scale = 2 * scales.shape[-2] * N
    elif bits == 4:
        n_scale = E * scales.shape[-2] * N
    else:
        n_scale = E * N
    decode_vmem = (
        2 * Kw * N  # int8 weight ring
        + n_scale * (scales.dtype.itemsize if bits == 4 else 4)
        + Tp * K * 2  # bf16 activations
        + Tp * N * 4  # f32 output
    )
    return Tp <= 256 and decode_vmem <= 12 * 1024 * 1024


def grouped_quant_matmul(xs, w: dict, group_sizes, *, layer=None,
                         backend=None, active=None, starts=None,
                         interpret: bool = False, max_active: int = 0):
    """xs [Tp, K] expert-sorted rows; w {"qweight" int8 [E,K,N] or
    layer-stacked [L,E,K,N] (pass `layer`), "scales" [E,N] / [L,E,N]};
    → [Tp, N] f32, already dequantized (scales folded in)."""
    from scalellm_tpu.ops.quant_matmul import _default_backend

    qw, scales = w["qweight"], w["scales"]
    backend = backend or _default_backend()
    if backend != "tpu" and not interpret:
        if qw.ndim == 4:
            qw, scales = qw[layer], scales[layer]
        return _ref_grouped_quant_matmul(xs, qw, scales, group_sizes,
                                         starts=starts)
    Tp, K = xs.shape
    # The decode kernel tiles neither N nor K: its VMEM footprint is the
    # double-buffered weight scratch + the full scales block + the
    # activation/output blocks. V2-Lite dims are ~6-8 MB; a model with
    # larger hidden/moe_intermediate sizes would overflow scoped VMEM at
    # COMPILE time, and a failing remote compile is retried forever and
    # wedges the serving process (7a2c187 postmortem) — so size-check up
    # front and fall back to the gmm/dequant path instead.
    if fits_decode_kernel(Tp, K, w):
        return _decode_grouped_quant_matmul(
            xs, qw, scales, group_sizes, layer=layer, active=active,
            starts=starts, interpret=interpret, max_active=max_active,
        )
    if backend != "tpu":
        # interpret-mode caller that fell through the decode-size gate: the
        # stock gmm below has no interpret path on CPU.
        if qw.ndim == 4:
            qw, scales = qw[layer], scales[layer]
        return _ref_grouped_quant_matmul(xs, qw, scales, group_sizes,
                                         starts=starts)
    # Prefill: cast + stock gmm, per-row expert scale. The per-layer slice
    # + cast materialize one expert matrix transiently; prefill is
    # compute-bound so the extra HBM pass is noise.
    # The gmm contract REQUIRES expert-sorted rows: a caller that built the
    # unsorted T=1 fast-dispatch layout (explicit starts) must have taken
    # the decode kernel above — fail loudly rather than compute garbage.
    assert starts is None, "custom starts layout requires the decode kernel"
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    if qw.ndim == 4:
        qw, scales = qw[layer], scales[layer]
    E, Kw, N = qw.shape
    if scales.ndim == 3:  # int4: unpack + fold group scales, then gmm
        K = Kw * 2
        G = K // scales.shape[1]
        u = qw.astype(jnp.uint8)
        # two's-complement nibbles: value = ((r + 8) & 15) - 8
        lo = ((((u & 15)) + 8) & 15).astype(jnp.float32) - 8.0
        hi = ((((u >> 4) & 15) + 8) & 15).astype(jnp.float32) - 8.0
        qu = jnp.stack([lo, hi], axis=2).reshape(E, K, N)
        w_b = (
            qu.reshape(E, K // G, G, N)
            * scales[:, :, None, :].astype(jnp.float32)
        ).reshape(E, K, N).astype(jnp.bfloat16)
        return gmm(
            xs.astype(jnp.bfloat16), w_b, group_sizes,
            preferred_element_type=jnp.float32,
        )
    y = gmm(
        xs.astype(jnp.bfloat16),
        qw.astype(jnp.bfloat16),
        group_sizes,
        preferred_element_type=jnp.float32,
    )
    e_of_row = jnp.repeat(
        jnp.arange(E), group_sizes, total_repeat_length=Tp
    )
    # Overflow rows (past sum(group_sizes)) get an arbitrary expert's
    # scale; callers mask those rows (uncovered-gmm contract).
    return y * scales[e_of_row].astype(jnp.float32)
