"""Quantized MoE expert matmuls (int8 weights, per-expert per-channel scales).

The reference has no quantized-MoE path at all (its MoE stack is bf16 and
its deepseek model is a TODO, src/models/deepseek/README.md); real
DeepSeek-V2-class checkpoints are served quantized in practice, and on a
16 GB v5e chip int8 experts are the difference between fitting the model
and not (V2-Lite experts: ~14 GB bf16 → ~7 GB int8).

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

Storage: qweight int8 [E, K, N] with symmetric per-(expert, out-channel)
scales [E, N] (f32). Out-channel scales distribute out of the contraction,
so the kernel's dot runs on raw int8 and scales apply post-dot.
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


def _ref_grouped_quant_matmul(xs, qw, scales, group_sizes):
    """CPU/reference path: dequantize per expert, masked accumulation."""
    E = qw.shape[0]
    bounds = jnp.cumsum(group_sizes)
    starts = bounds - group_sizes
    t_idx = jnp.arange(xs.shape[0])[:, None]
    out = jnp.zeros((xs.shape[0], qw.shape[-1]), jnp.float32)
    xf = xs.astype(jnp.float32)
    for e in range(E):
        mask = ((t_idx >= starts[e]) & (t_idx < bounds[e])).astype(jnp.float32)
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
    sc_ref,  # f32 [E, N] (VMEM)
    o_ref,  # [Tp, N] f32
    w_bufs,  # VMEM [2, K, N] int8
    sems,  # DMA [2]
    *,
    stacked: bool,
):
    i = pl.program_id(0)
    E = pl.num_programs(0)
    e = act_ref[i]
    valid = e >= 0

    def src(expert):
        if stacked:  # layer-stacked: stream at the layer offset
            return qw_hbm.at[lr_ref[0], expert]
        return qw_hbm.at[expert]

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
        pltpu.make_async_copy(src(act_ref[0]), w_bufs.at[0], sems.at[0]).start()

    @pl.when(valid)
    def _():
        nxt = jnp.minimum(i + 1, E - 1)

        @pl.when(jnp.logical_and(i + 1 < E, act_ref[nxt] >= 0))
        def _():
            pltpu.make_async_copy(
                src(act_ref[nxt]), w_bufs.at[(i + 1) % 2],
                sems.at[(i + 1) % 2],
            ).start()

        slot = i % 2
        pltpu.make_async_copy(
            src(e), w_bufs.at[slot], sems.at[slot]
        ).wait()

        w = w_bufs[slot]  # int8 [K, N]; MXU consumes int8 in mixed dots
        dots = jax.lax.dot_general(
            xs_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Tp, N]
        sc = sc_ref[pl.ds(e, 1), :]  # [1, N] dynamic expert row
        start = starts_ref[e]
        size = sizes_ref[e]
        rows = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
        in_grp = jnp.logical_and(rows >= start, rows < start + size)
        o_ref[:] += jnp.where(in_grp, dots * sc, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_grouped_quant_matmul(xs, qw, scales, group_sizes, layer=None,
                                 interpret: bool = False):
    Tp, K = xs.shape
    stacked = qw.ndim == 4
    E, Kw, N = qw.shape[-3:]
    assert K == Kw
    active = jnp.nonzero(group_sizes > 0, size=E, fill_value=-1)[0]
    starts = (jnp.cumsum(group_sizes) - group_sizes).astype(jnp.int32)
    if stacked:
        scales = scales[layer]  # [E, N] — tiny slice; weights stream in place
    lr = jnp.asarray(layer if layer is not None else 0, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(E,),
        in_specs=[
            pl.BlockSpec((Tp, K), lambda i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((E, N), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tp, N), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, K, N), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_decode_kernel, stacked=stacked),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            # decode expectation: ~top_k experts touched, not E
            bytes_accessed=min(E, Tp) * K * N + Tp * K * 2 + Tp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        lr, active.astype(jnp.int32), starts, group_sizes.astype(jnp.int32),
        xs.astype(jnp.bfloat16), qw, scales.astype(jnp.float32),
    )


def grouped_quant_matmul(xs, w: dict, group_sizes, *, layer=None,
                         backend=None, interpret: bool = False):
    """xs [Tp, K] expert-sorted rows; w {"qweight" int8 [E,K,N] or
    layer-stacked [L,E,K,N] (pass `layer`), "scales" [E,N] / [L,E,N]};
    → [Tp, N] f32, already dequantized (scales folded in)."""
    from scalellm_tpu.ops.quant_matmul import _default_backend

    qw, scales = w["qweight"], w["scales"]
    backend = backend or _default_backend()
    if backend != "tpu" and not interpret:
        if qw.ndim == 4:
            qw, scales = qw[layer], scales[layer]
        return _ref_grouped_quant_matmul(xs, qw, scales, group_sizes)
    Tp = xs.shape[0]
    if Tp <= 256:
        return _decode_grouped_quant_matmul(
            xs, qw, scales, group_sizes, layer=layer, interpret=interpret
        )
    # Prefill: cast + stock gmm, per-row expert scale. The per-layer slice
    # + cast materialize one expert matrix transiently; prefill is
    # compute-bound so the extra HBM pass is noise.
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    if qw.ndim == 4:
        qw, scales = qw[layer], scales[layer]
    E = qw.shape[0]
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
