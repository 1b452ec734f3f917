"""MLA latent attention over a K-ONLY page cache.

TPU-native counterpart of the reference's dedicated MLA kernels
(reference: src/kernels/attention/kernel/sm80_kernel_mla.cuh,
collective/sm80_collective_mla.cuh). The absorbed MLA-as-MQA formulation
needs K = [c_kv | k_pe] (kv_lora_rank + rope dims, lane-padded) and
V = c_kv — i.e. V is literally the FIRST v_dim lanes of K. Storing V rows
separately (as the generic combined K/V layout does) doubles latent cache
memory and decode bandwidth for no information; this module stores ONLY
the K rows ([P, page_size, 1, Dc] pages) and reads V as K[:, :v_dim]
inside the kernel — the latent cache drops to Dc (≈640 lane-padded) per
token, the theoretical MLA footprint.

Three entry points:
  - `set_latent_cache`: scatter the per-token latent K rows (optionally
    int8-quantized) into the paged cache.
  - `ref_mla_paged_attention`: vectorized jnp reference for mixed
    prefill/decode ragged batches (ground truth + CPU/prefill path).
  - `mla_decode_attention`: Pallas decode kernel (one query per
    sequence) — per-sequence KV streaming with double-buffered DMA and
    cross-sequence prefetch, same skeleton as ops/decode_attention.py but
    MQA-only with the asymmetric V slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def set_latent_cache(
    k_pages: jnp.ndarray,  # [P, page_size, 1, Dc]
    k_lat: jnp.ndarray,  # [T, Dc] latent K rows ([c_kv | k_pe], padded)
    slot_ids: jnp.ndarray,  # [T]
    scale: Optional[float] = None,
) -> jnp.ndarray:
    P, page_size, one, Dc = k_pages.shape
    if k_pages.dtype == jnp.int8:
        k_lat = jnp.clip(jnp.round(k_lat.astype(jnp.float32) / scale), -127, 127)
    flat = k_pages.reshape(P * page_size, Dc)
    flat = flat.at[slot_ids].set(k_lat.astype(flat.dtype), mode="drop")
    return flat.reshape(k_pages.shape)


def ref_mla_paged_attention(
    q: jnp.ndarray,  # [T, H, Dc]
    k_pages: jnp.ndarray,  # [P, page_size, 1, Dc]
    kv_lens: jnp.ndarray,  # i32[S]
    page_indices: jnp.ndarray,  # i32[S, MAXP]
    cu_q_lens: jnp.ndarray,  # i32[S+1]
    num_seqs: jnp.ndarray,  # i32[1] (unused: padding rows fully masked)
    *,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float] = None,
) -> jnp.ndarray:  # [T, H, v_dim]
    T, H, Dc = q.shape
    S, MAXP = page_indices.shape
    page_size = k_pages.shape[1]
    KV = MAXP * page_size

    tok = jnp.arange(T, dtype=jnp.int32)
    token_seg = jnp.clip(
        jnp.searchsorted(cu_q_lens[1:], tok, side="right"), 0, S - 1
    ).astype(jnp.int32)
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
    positions = (
        kv_lens[token_seg] - q_lens[token_seg] + (tok - cu_q_lens[token_seg])
    )

    pages = k_pages[page_indices]  # [S, MAXP, page, 1, Dc]
    k_seq = pages.reshape(S, KV, Dc)
    k_tok = k_seq[token_seg].astype(jnp.float32)  # [T, KV, Dc]
    if k_scale is not None:
        k_tok = k_tok * k_scale
    v_tok = k_tok[..., :v_dim]

    qf = q.astype(jnp.float32)
    scores = jnp.einsum("thd,tjd->thj", qf, k_tok) * sm_scale  # [T, H, KV]
    kv_pos = jnp.arange(KV, dtype=jnp.int32)
    mask = kv_pos[None, :] > positions[:, None]  # causal by absolute pos
    mask = jnp.logical_or(mask, kv_pos[None, :] >= kv_lens[token_seg][:, None])
    scores = jnp.where(mask[:, None, :], MASK_VALUE, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thj,tjd->thd", p, v_tok)
    return out.astype(q.dtype)


def _mla_decode_kernel(
    kv_lens_ref,  # i32[S]
    page_indices_ref,  # i32[S, pages_per_seq]
    q_ref,  # [1, H, Dc]
    k_hbm_ref,  # [P, page_size, Dc] (ANY; singleton KV-head dim squeezed —
    #             Mosaic rejects size-1 slices of the bf16-packed sublane dim)
    o_ref,  # [1, H, v_dim]
    k_bufs,  # [2, chunk_pages, page_size, Dc]
    sems,  # DMA [2]
    cnt_ref,  # SMEM [1]
    *,
    chunk_pages: int,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float],
):
    s = pl.program_id(0)
    S = pl.num_programs(0)
    _, cp, page_size, Dc = k_bufs.shape
    _, H, _ = q_ref.shape
    C = cp * page_size
    pages_per_seq = page_indices_ref.shape[1]

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, C)

    def copies(seq_idx, chunk_idx, buf_idx):
        out = []
        base = chunk_idx * chunk_pages
        for i in range(chunk_pages):
            p = base + i
            p = jax.lax.select(p < pages_per_seq, p, 0)
            page = page_indices_ref[seq_idx, p]
            out.append(
                pltpu.make_async_copy(
                    k_hbm_ref.at[page], k_bufs.at[buf_idx, i], sems.at[buf_idx]
                )
            )
        return out

    def start_chunk(seq_idx, chunk_idx, buf_idx):
        for c in copies(seq_idx, chunk_idx, buf_idx):
            c.start()

    def wait_chunk(buf_idx):
        for c in copies(0, 0, buf_idx):
            c.wait()

    @pl.when(s == 0)
    def _():
        cnt_ref[0] = 0

    @pl.when(jnp.logical_and(s == 0, n_chunks > 0))
    def _():
        start_chunk(0, 0, 0)

    q = q_ref[0].astype(jnp.float32) * sm_scale  # [H, Dc]

    def chunk_step(j, carry):
        m, l, acc = carry  # [H, 128], [H, 128], [H, v_dim]
        buf = (cnt_ref[0] + j) % 2
        is_last = j == n_chunks - 1

        @pl.when(jnp.logical_not(is_last))
        def _():
            start_chunk(s, j + 1, (cnt_ref[0] + j + 1) % 2)

        @pl.when(is_last)
        def _():
            nxt = jnp.minimum(s + 1, S - 1)
            valid = jnp.logical_and(s + 1 < S, kv_lens_ref[nxt] > 0)

            @pl.when(valid)
            def _():
                start_chunk(nxt, 0, (cnt_ref[0] + j + 1) % 2)

        wait_chunk(buf)

        k = k_bufs[buf].reshape(C, Dc)
        if k_scale is not None:
            k = k.astype(jnp.float32) * k_scale
        k = k.astype(jnp.bfloat16)
        col = j * C + jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
        sc = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, C]
        sc = jnp.where(col >= kv_len, MASK_VALUE, sc)

        row_max = jnp.max(sc, axis=1, keepdims=True)
        m2 = jnp.maximum(m, jnp.broadcast_to(row_max, m.shape))
        p = jnp.exp(sc - m2[:, :1])
        corr = jnp.exp(m - m2)
        l2 = l * corr + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), m.shape
        )
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), k[:, :v_dim], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, v_dim]
        acc2 = acc * corr[:, :1] + pv
        return m2, l2, acc2

    m0 = jnp.full((H, 128), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((H, 128), jnp.float32)
    a0 = jnp.zeros((H, v_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, chunk_step, (m0, l0, a0))
    cnt_ref[0] = cnt_ref[0] + n_chunks
    o_ref[0] = (acc / jnp.maximum(l[:, :1], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "v_dim", "k_scale", "chunk_pages", "interpret"),
)
def mla_decode_attention(
    q: jnp.ndarray,  # [S, H, Dc]
    k_pages: jnp.ndarray,  # [P, page_size, 1, Dc]
    kv_lens: jnp.ndarray,  # i32[S]
    page_indices: jnp.ndarray,  # i32[S, pages_per_seq]
    *,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float] = None,
    chunk_pages: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:  # [S, H, v_dim]
    S, H, Dc = q.shape
    P, page_size, one, Dck = k_pages.shape
    assert Dc == Dck and one == 1 and v_dim % 128 == 0
    pages_per_seq = page_indices.shape[1]
    if not chunk_pages:
        chunk_pages = max(1, min(pages_per_seq, 128 // page_size))

    kernel = functools.partial(
        _mla_decode_kernel,
        chunk_pages=chunk_pages,
        sm_scale=sm_scale,
        v_dim=v_dim,
        k_scale=k_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, H, Dc), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, v_dim), lambda s, *_: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, page_size, Dc), k_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    # Squeeze the singleton KV-head dim: a [page_size, 1, Dc] DMA slice is
    # unaligned for bf16 (sublane tiling 2) and Mosaic rejects it.
    k_pages = k_pages.reshape(P, page_size, Dck)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, H, v_dim), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * H * (Dc + v_dim) * pages_per_seq * page_size,
            bytes_accessed=S * pages_per_seq * page_size * Dc
            * k_pages.dtype.itemsize,
            transcendentals=S * H * pages_per_seq * page_size,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, q, k_pages)


def _mla_prefill_kernel(
    kv_lens_ref,  # i32[S]
    page_indices_ref,  # i32[S, pages_per_seq]
    cu_q_lens_ref,  # i32[S+1]
    q_hbm_ref,  # [T, H, Dc] (ANY)
    k_hbm_ref,  # [P, page_size, Dc] (ANY; singleton KV-head dim squeezed)
    o_hbm_ref,  # [T, H, v_dim] (ANY)
    q_buf,  # VMEM [Bq, H, Dc]
    k_bufs,  # VMEM [2, chunk_pages, page_size, Dc]
    o_buf,  # VMEM [Bq, H, v_dim]
    q_sem,
    k_sems,  # DMA [2]
    o_sem,
    *,
    chunk_pages: int,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float],
):
    s, qb = pl.program_id(0), pl.program_id(1)
    _, cp, page_size, Dc = k_bufs.shape
    Bq, H, _ = q_buf.shape
    C = cp * page_size
    pages_per_seq = page_indices_ref.shape[1]

    kv_len = kv_lens_ref[s]
    q_start = cu_q_lens_ref[s]
    q_len = cu_q_lens_ref[s + 1] - q_start
    blk_start = qb * Bq  # first token of this q block, within the chunk
    active = jnp.logical_and(blk_start < q_len, kv_len > 0)

    @pl.when(active)
    def _():
        # Rows beyond q_len load/compute garbage but are masked and their
        # outputs overwritten by the next sequence's rows or never read
        # (padding region of the ragged batch).
        row0 = q_start + blk_start
        qc = pltpu.make_async_copy(
            q_hbm_ref.at[pl.ds(row0, Bq)], q_buf, q_sem
        )
        qc.start()

        # Absolute positions of this block's tokens.
        pos0 = kv_len - q_len + blk_start
        n_chunks = pl.cdiv(jnp.minimum(pos0 + Bq, kv_len), C)

        def copies(chunk_idx, buf_idx):
            out = []
            base = chunk_idx * chunk_pages
            for i in range(chunk_pages):
                p = base + i
                p = jax.lax.select(p < pages_per_seq, p, 0)
                page = page_indices_ref[s, p]
                out.append(
                    pltpu.make_async_copy(
                        k_hbm_ref.at[page], k_bufs.at[buf_idx, i],
                        k_sems.at[buf_idx],
                    )
                )
            return out

        for c in copies(0, 0):
            c.start()
        qc.wait()
        q = q_buf[:].astype(jnp.float32) * sm_scale  # [Bq, H, Dc]
        qf = q.reshape(Bq * H, Dc).astype(jnp.bfloat16)
        # Absolute position of each (token, head) row.
        rowpos = pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (Bq * H, C), 0
        ) // H

        def chunk_step(j, carry):
            m, l, acc = carry  # [Bq*H, 128] x2, [Bq*H, v_dim]
            buf = j % 2

            @pl.when(j + 1 < n_chunks)
            def _():
                for c in copies(j + 1, (j + 1) % 2):
                    c.start()

            for c in copies(0, buf):
                c.wait()

            k = k_bufs[buf].reshape(C, Dc)
            if k_scale is not None:
                k = k.astype(jnp.float32) * k_scale
            k = k.astype(jnp.bfloat16)
            sc = jax.lax.dot_general(
                qf, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Bq*H, C]
            col = j * C + jax.lax.broadcasted_iota(
                jnp.int32, (Bq * H, C), 1
            )
            sc = jnp.where(col > rowpos, MASK_VALUE, sc)  # causal
            sc = jnp.where(col >= kv_len, MASK_VALUE, sc)

            row_max = jnp.max(sc, axis=1, keepdims=True)
            m2 = jnp.maximum(m, jnp.broadcast_to(row_max, m.shape))
            p = jnp.exp(sc - m2[:, :1])
            corr = jnp.exp(m - m2)
            l2 = l * corr + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), m.shape
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), k[:, :v_dim],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc2 = acc * corr[:, :1] + pv
            return m2, l2, acc2

        m0 = jnp.full((Bq * H, 128), MASK_VALUE, jnp.float32)
        l0 = jnp.zeros((Bq * H, 128), jnp.float32)
        a0 = jnp.zeros((Bq * H, v_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_chunks, chunk_step, (m0, l0, a0))
        out = acc / jnp.maximum(l[:, :1], 1e-30)
        o_buf[:] = out.reshape(Bq, H, v_dim).astype(o_buf.dtype)
        oc = pltpu.make_async_copy(
            o_buf, o_hbm_ref.at[pl.ds(row0, Bq)], o_sem
        )
        oc.start()
        oc.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "v_dim", "k_scale", "block_q", "chunk_pages", "interpret",
    ),
)
def mla_prefill_attention(
    q: jnp.ndarray,  # [T, H, Dc] ragged mixed prefill/decode batch
    k_pages: jnp.ndarray,  # [P, page_size, 1, Dc]
    kv_lens: jnp.ndarray,  # i32[S]
    page_indices: jnp.ndarray,  # i32[S, pages_per_seq]
    cu_q_lens: jnp.ndarray,  # i32[S+1]
    *,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float] = None,
    block_q: int = 0,
    chunk_pages: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:  # [T, H, v_dim]
    """Ragged MLA prefill kernel over the K-only latent cache: grid
    (seq, q-block), causal flash accumulation over KV chunks. Rows beyond
    a sequence's q_len are recomputed by the following sequence's blocks
    or belong to ragged padding — both safe to overwrite."""
    T, H, Dc = q.shape
    P, page_size, one, Dck = k_pages.shape
    assert Dc == Dck and one == 1 and v_dim % 128 == 0
    S = kv_lens.shape[0]
    pages_per_seq = page_indices.shape[1]
    if not block_q:
        block_q = max(1, 256 // H)
    block_q = min(block_q, T)
    if not chunk_pages:
        chunk_pages = max(1, min(pages_per_seq, 128 // page_size))
    n_qb = pl.cdiv(T, block_q)

    kernel = functools.partial(
        _mla_prefill_kernel,
        chunk_pages=chunk_pages,
        sm_scale=sm_scale,
        v_dim=v_dim,
        k_scale=k_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S, n_qb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((block_q, H, Dc), q.dtype),
            pltpu.VMEM((2, chunk_pages, page_size, Dc), k_pages.dtype),
            pltpu.VMEM((block_q, H, v_dim), q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # Pad T so every q block's dynamic slice stays in bounds. ONE EXTRA
    # block beyond the grid cover: a sequence's last q-block starts at
    # q_start + (ceil(q_len/Bq)-1)*Bq, which can run up to Bq-1 rows past
    # T — without the extra block that DMA reads out of bounds and the
    # device faults (surfacing asynchronously at the next fetch).
    T_pad = (n_qb + 1) * block_q
    q_in = jnp.pad(q, ((0, T_pad - T), (0, 0), (0, 0))) if T_pad > T else q
    # Squeeze the singleton KV-head dim (Mosaic sublane-tiling alignment).
    k_pages = k_pages.reshape(P, page_size, Dck)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T_pad, H, v_dim), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * H * (Dc + v_dim) * pages_per_seq * page_size,
            bytes_accessed=S * pages_per_seq * page_size * Dc
            * k_pages.dtype.itemsize + T * H * Dc * 4,
            transcendentals=T * H * pages_per_seq * page_size,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, cu_q_lens, q_in, k_pages)
    return out[:T]


def mla_paged_attention(
    q: jnp.ndarray,  # [T, H, Dc]
    k_pages: jnp.ndarray,  # [P, page_size, 1, Dc]
    kv_lens: jnp.ndarray,
    page_indices: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    num_seqs: jnp.ndarray,
    *,
    sm_scale: float,
    v_dim: int,
    k_scale: Optional[float] = None,
    decode_only: bool = False,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatcher: TPU decode-only batches hit the Pallas decode kernel,
    TPU mixed prefill/decode the Pallas ragged prefill kernel; CPU uses
    the vectorized jnp reference (which gathers [T, KV, Dc] — test-sized
    only)."""
    if backend is None:
        from scalellm_tpu.ops.attention import _default_backend

        backend = _default_backend()
    if backend == "tpu" and v_dim % 128 == 0:
        if decode_only:
            S = kv_lens.shape[0]
            out = mla_decode_attention(
                q[:S], k_pages, kv_lens, page_indices,
                sm_scale=sm_scale, v_dim=v_dim, k_scale=k_scale,
            )
            if q.shape[0] > S:
                out = jnp.pad(out, ((0, q.shape[0] - S), (0, 0), (0, 0)))
            return out
        return mla_prefill_attention(
            q, k_pages, kv_lens, page_indices, cu_q_lens,
            sm_scale=sm_scale, v_dim=v_dim, k_scale=k_scale,
        )
    return ref_mla_paged_attention(
        q, k_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
        sm_scale=sm_scale, v_dim=v_dim, k_scale=k_scale,
    )
