"""Fused quantized MLP: gate_up matmul + activation + down matmul in ONE
Pallas kernel.

TPU-native analog of the reference's fused MLP epilogues (reference:
src/layers/quantization/qlinear_*_impl.h compose two QLinear launches; the
Marlin GEMM exists to win exactly this M=1 case). At batch-1 decode the MLP
moves ~80% of a llama layer's weight bytes (gate_up [D, 2F] + down [F, D]);
running it as one kernel keeps the whole gate→act→down chain inside a
single Mosaic pipeline: down's weight DMA streams while gate/up dots issue,
and the [M, 2F] intermediate never leaves VMEM (the two-launch path
round-trips it through HBM and pays a kernel boundary).

Grid: one sequential dimension over F-blocks. Step f:
  g = x @ Wg[:, f]        (per-group dots over D, post-dot scaling)
  u = x @ Wu[:, f]
  h = act(g) * u          (VPU, stays in VMEM)
  acc += h @ Wd[f, :]     (per-group dots over the f rows, post-dot scaling)
Weight layouts are the canonical N-tiled quant triples of
ops/quant_matmul.py: gate/up are the two halves of the fused gate_up tiles
(requires F to be a multiple of the stored tile width so gate and up halves
don't share a tile); down's tiled layout is sliced on its row (F) dim.

Supports int4 (packed) / int8, symmetric or asymmetric (zero-point
corrected like ops/quant_matmul._group_kernel). Decode/small-M only — the
caller falls back to two quant_matmul launches for prefill-sized M.

MEASURED on v5e (Llama-8B INT4 b=1 probe A/B): NO in-model gain over the
two-launch path (~299 vs ~303 GB/s achieved weight bandwidth) — Mosaic
already overlaps the second launch's weight DMA with the first's compute,
so the kernel boundary costs nothing; the per-tile mixed-dtype dot issue
rate is the shared bottleneck (see ops/quant_matmul._gemv_kernel note).
Kept as a standalone op (not wired into models/common.py) for future
sweeps on hardware where launch boundaries do cost.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_pytorch_tanh": functools.partial(jax.nn.gelu, approximate=True),
    "gelu_new": functools.partial(jax.nn.gelu, approximate=True),
}


def _bitcast4(ref_tile, bits):
    if bits == 4:
        return pltpu.bitcast(ref_tile, jnp.int4)
    return ref_tile


def _group_dots(x, w, s, z, xsum):
    """Per-group batched dots with post-dot scaling (see quant_matmul).
    x: [M, K] bf16; w: [K, N] int4/int8; s/z: [n_g, N]; xsum: [n_g, M] or
    None. Returns [M, N] f32."""
    k, n = w.shape
    n_g = s.shape[0]
    G = k // n_g
    m = x.shape[0]
    wg = w.reshape(n_g, G, n)
    xg = x.reshape(m, n_g, G).transpose(1, 0, 2)  # [n_g, M, G]
    dots = jax.lax.dot_general(
        xg, wg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [n_g, M, N]
    if z is not None:
        dots = dots - xsum[:, :, None] * z[:, None, :]
    return jnp.sum(dots * s[:, None, :], axis=0)  # [M, N]


def _mlp_kernel(
    x_ref, g_qw, g_sc, u_qw, u_sc, d_qw, d_sc, *rest,
    n_f: int, n_dn: int, bits: int, symmetric: bool, act: str,
):
    if symmetric:
        o_ref, acc_ref = rest
        g_zp = u_zp = d_zp = None
    else:
        g_zp, u_zp, d_zp, o_ref, acc_ref = rest
    ff = pl.program_id(0)

    @pl.when(ff == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [M, D]
    m = x.shape[0]
    gs = g_sc[0].astype(jnp.float32)  # [D/G, BF]
    us = u_sc[0].astype(jnp.float32)
    n_gD = gs.shape[0]
    if symmetric:
        xsum = None
        gz = uz = None
    else:
        G_D = x.shape[1] // n_gD
        xsum = jnp.sum(
            x.astype(jnp.float32).reshape(m, n_gD, G_D).transpose(1, 0, 2),
            axis=2,
        )  # [n_gD, M]
        gz = g_zp[0].astype(jnp.float32)
        uz = u_zp[0].astype(jnp.float32)

    g = _group_dots(x, _bitcast4(g_qw[0], bits), gs, gz, xsum)  # [M, BF]
    u = _group_dots(x, _bitcast4(u_qw[0], bits), us, uz, xsum)
    h = (_ACTS[act](g) * u).astype(jnp.bfloat16)  # [M, BF]

    ds_all = d_sc[:].astype(jnp.float32)  # [n_dn, BF/G, Wd]
    n_gF = ds_all.shape[1]
    if symmetric:
        hsum = None
    else:
        G_F = h.shape[1] // n_gF
        hsum = jnp.sum(
            h.astype(jnp.float32).reshape(m, n_gF, G_F).transpose(1, 0, 2),
            axis=2,
        )
    for t in range(n_dn):
        dz = None if symmetric else d_zp[t].astype(jnp.float32)
        acc_ref[:, t, :] += _group_dots(
            h, _bitcast4(d_qw[t], bits), ds_all[t], dz, hsum
        )

    @pl.when(ff == n_f - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("F", "bits", "act", "symmetric", "block_f", "backend"),
)
def quant_mlp(
    x: jnp.ndarray,  # [M, D]
    gu_qweight: jnp.ndarray,  # tiled [n_n, D(/2), W], gate tiles then up tiles
    gu_scales: jnp.ndarray,  # tiled [n_n, D/G, W]
    gu_zeros: Optional[jnp.ndarray],
    dn_qweight: jnp.ndarray,  # tiled [n_dn, F(/2), Wd]
    dn_scales: jnp.ndarray,  # tiled [n_dn, F/G, Wd]
    dn_zeros: Optional[jnp.ndarray],
    F: int,  # true intermediate width (gate cols [0,F), up cols [F,2F))
    bits: int = 4,
    act: str = "silu",
    symmetric: bool = False,
    block_f: int = 1024,
    backend: Optional[str] = None,
) -> jnp.ndarray:  # [M, n_dn*Wd] f32 (callers slice D)
    if backend is None:
        from scalellm_tpu.ops.quant_matmul import _default_backend

        backend = _default_backend()
    M, D = x.shape
    n_n, _, W = gu_qweight.shape
    n_dn, _, Wd = dn_qweight.shape
    symmetric = symmetric or gu_zeros is None

    if backend != "tpu":
        from scalellm_tpu.ops.quant_matmul import quant_matmul

        gu = quant_matmul(
            x, gu_qweight, gu_scales, gu_zeros, bits=bits,
            symmetric=symmetric, backend=backend,
        )
        h = (_ACTS[act](gu[:, :F]) * gu[:, F : 2 * F]).astype(x.dtype)
        return quant_matmul(
            h, dn_qweight, dn_scales, dn_zeros, bits=bits,
            symmetric=symmetric, backend=backend,
        ).astype(jnp.float32)

    assert F % W == 0, (F, W)  # gate/up halves must not share a tile
    n_f_tiles = F // W
    pack = 2 if bits == 4 else 1
    G = D // gu_scales.shape[-2]
    bf = min(block_f, W)
    assert W % bf == 0 and bf % G == 0, (W, bf, G)
    n_f = F // bf
    sub = W // bf  # sub-blocks per stored tile

    def gate_idx(f):
        return (f // sub, 0, f % sub)

    def up_idx(f):
        return (n_f_tiles + f // sub, 0, f % sub)

    gu_w_spec = lambda imap: pl.BlockSpec(
        (1, D // pack, bf), imap, memory_space=pltpu.VMEM
    )
    gu_s_spec = lambda imap: pl.BlockSpec(
        (1, D // G, bf), imap, memory_space=pltpu.VMEM
    )
    d_w_spec = pl.BlockSpec(
        (n_dn, bf // pack, Wd), lambda f: (0, f, 0), memory_space=pltpu.VMEM
    )
    d_s_spec = pl.BlockSpec(
        (n_dn, bf // G, Wd), lambda f: (0, f, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((M, D), lambda f: (0, 0), memory_space=pltpu.VMEM),
        gu_w_spec(gate_idx), gu_s_spec(gate_idx),
        gu_w_spec(up_idx), gu_s_spec(up_idx),
        d_w_spec, d_s_spec,
    ]
    operands = [
        x.astype(jnp.bfloat16),
        gu_qweight, gu_scales, gu_qweight, gu_scales,
        dn_qweight, dn_scales,
    ]
    if not symmetric:
        in_specs += [gu_s_spec(gate_idx), gu_s_spec(up_idx), d_s_spec]
        operands += [gu_zeros, gu_zeros, dn_zeros]

    kernel = functools.partial(
        _mlp_kernel, n_f=n_f, n_dn=n_dn, bits=bits,
        symmetric=symmetric, act=act,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, n_dn, Wd), jnp.float32),
        grid=(n_f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (M, n_dn, Wd), lambda f: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((M, n_dn, Wd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (2 * F * D + F * n_dn * Wd),
            bytes_accessed=gu_qweight.size + dn_qweight.size,
            transcendentals=M * F,
        ),
    )(*operands)
    return out.reshape(M, n_dn * Wd)
