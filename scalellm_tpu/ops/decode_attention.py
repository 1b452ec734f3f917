"""In-house decode-specialized ragged paged attention (Pallas TPU).

TPU-native counterpart of the reference's decode attention path
(reference: src/kernels/attention/attn_api.h:14 paged_kv_varlen_mha with
q_len=1, and the splitKV decode kernels under src/kernels/attention/).
The general mixed prefill/decode batches go through the stock JAX ragged
kernel (ops/attention.py); this kernel owns the all-decode case — every
sequence contributes exactly ONE query token — which is the hot serving
path and admits a much simpler, tighter design than the general kernel:

- No causal mask: the single query is the last position, so it attends to
  every cached token < kv_len (a pure length mask; sliding window is a
  second length bound, kv >= kv_len - window).
- One grid cell per sequence; the cell streams that sequence's KV pages
  through a double-buffered VMEM scratch with manual async DMA (page
  gather via scalar-prefetched block tables), and the NEXT sequence's
  first chunk is prefetched before the current sequence finishes, so the
  DMA queue never drains at sequence boundaries.
- Online (flash) softmax in fp32 across KV chunks, carried as loop values
  (m/l replicated over lanes), one [G, D] @ [D, C] score dot and one
  [G, C] @ [C, D] value dot per stored KV head per chunk.
- int8 KV pages are dequantized in-kernel from the static k/v scales.

Works on the stored-head layout of ops/attention.py (packed or padded
heads): query head g attends to stored head g // (H // Hkv_stored), which
is exactly the GQA map the model code arranges when packing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _chunk_copy(pages_hbm, buf, sem, page_indices_ref, seq_idx, chunk_idx,
                chunk_pages: int, pages_per_seq: int):
    """Async-copy descriptor for one KV chunk (chunk_pages pages) of one
    sequence; out-of-range pages clamp to page 0 (the reserved padding
    page), their rows are masked out of the scores."""
    copies = []
    base = chunk_idx * chunk_pages
    for i in range(chunk_pages):
        p = base + i
        p = jax.lax.select(p < pages_per_seq, p, 0)
        page = page_indices_ref[seq_idx, p]
        copies.append(
            pltpu.make_async_copy(pages_hbm.at[page], buf.at[i], sem)
        )
    return copies


def _decode_kernel(
    # scalar prefetch
    kv_lens_ref,  # i32[S]
    page_indices_ref,  # i32[S, pages_per_seq]
    # inputs
    q_ref,  # [1, H, D] (current sequence's single query token)
    kv_hbm_ref,  # [P, page_size, 2*Hkv, D] in HBM/ANY
    # outputs
    o_ref,  # [1, H, D]
    # scratch
    kv_bufs,  # [2, chunk_pages, page_size, 2*Hkv, D]
    sems,  # DMA [2]
    cnt_ref,  # SMEM [1] — executed-chunk counter (buffer parity)
    *,
    chunk_pages: int,
    sm_scale: float,
    sliding_window: Optional[int],
    soft_cap: Optional[float],
    k_scale: Optional[float],
    v_scale: Optional[float],
):
    s = pl.program_id(0)
    S = pl.num_programs(0)
    _, cp, page_size, combined, D = kv_bufs.shape
    Hkv = combined // 2
    _, H, _ = q_ref.shape
    G = H // Hkv
    C = cp * page_size  # kv rows per chunk
    pages_per_seq = page_indices_ref.shape[1]
    n_chunks_max = pl.cdiv(pages_per_seq, chunk_pages)

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, C)  # 0 for padded sequences
    # Sliding window: chunks strictly below the window can be skipped
    # entirely (their rows are fully masked) — first needed chunk:
    if sliding_window is not None:
        first_chunk = jnp.maximum(kv_len - sliding_window, 0) // C
    else:
        first_chunk = jnp.int32(0)

    def start_chunk(seq_idx, chunk_idx, buf_idx):
        for c in _chunk_copy(
            kv_hbm_ref, kv_bufs.at[buf_idx], sems.at[buf_idx],
            page_indices_ref, seq_idx, chunk_idx, chunk_pages, pages_per_seq,
        ):
            c.start()

    def wait_chunk(buf_idx):
        for c in _chunk_copy(
            kv_hbm_ref, kv_bufs.at[buf_idx], sems.at[buf_idx],
            page_indices_ref, 0, 0, chunk_pages, pages_per_seq,
        ):
            c.wait()

    def next_seq_first_chunk(seq_idx):
        """(seq, chunk) of the first chunk of the next non-empty sequence;
        decode batches are tail-padded so only the immediate successor needs
        checking."""
        nxt = seq_idx + 1
        valid = jnp.logical_and(nxt < S, kv_lens_ref[jnp.minimum(nxt, S - 1)] > 0)
        if sliding_window is not None:
            nl = kv_lens_ref[jnp.minimum(nxt, S - 1)]
            fc = jnp.maximum(nl - sliding_window, 0) // C
        else:
            fc = jnp.int32(0)
        return valid, jnp.minimum(nxt, S - 1), fc

    @pl.when(s == 0)
    def _():
        cnt_ref[0] = 0  # SMEM scratch is uninitialized

    @pl.when(jnp.logical_and(s == 0, n_chunks > 0))
    def _():
        start_chunk(0, first_chunk, 0)

    q = q_ref[0].astype(jnp.float32) * sm_scale  # [H, D]

    def chunk_step(j, carry):
        ms, ls, accs = carry  # per-stored-head tuples: [G,128],[G,128],[G,D]
        chunk = first_chunk + j
        buf = (cnt_ref[0] + j) % 2

        # Prefetch the next needed chunk before blocking on this one.
        is_last = j == n_chunks - 1 - first_chunk

        @pl.when(jnp.logical_not(is_last))
        def _():
            start_chunk(s, chunk + 1, (cnt_ref[0] + j + 1) % 2)

        @pl.when(is_last)
        def _():
            valid, nxt, fc = next_seq_first_chunk(s)

            @pl.when(valid)
            def _():
                start_chunk(nxt, fc, (cnt_ref[0] + j + 1) % 2)

        wait_chunk(buf)

        base = chunk * C
        col = base + jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
        mask = col >= kv_len
        if sliding_window is not None:
            mask = jnp.logical_or(mask, col < kv_len - sliding_window)

        ms2, ls2, accs2 = [], [], []
        for h in range(Hkv):
            k = kv_bufs[buf, :, :, 2 * h, :].reshape(C, D)
            v = kv_bufs[buf, :, :, 2 * h + 1, :].reshape(C, D)
            if k_scale is not None:
                k = k.astype(jnp.float32) * k_scale
            if v_scale is not None:
                v = v.astype(jnp.float32) * v_scale
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)
            qh = q[h * G:(h + 1) * G].astype(jnp.bfloat16)  # [G, D]
            sc = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, C]
            if soft_cap is not None:
                sc = soft_cap * jnp.tanh(sc / soft_cap)
            sc = jnp.where(mask, MASK_VALUE, sc)

            mh = ms[h]  # [G, 128] (lane-replicated running max)
            row_max = jnp.max(sc, axis=1, keepdims=True)  # [G, 1]
            mh2 = jnp.maximum(mh, jnp.broadcast_to(row_max, mh.shape))
            p = jnp.exp(sc - mh2[:, :1])  # [G, C]
            corr = jnp.exp(mh - mh2)  # [G, 128]
            lh = ls[h] * corr + jnp.broadcast_to(
                jnp.sum(p, axis=1, keepdims=True), mh.shape
            )
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            ah = accs[h] * corr[:, :1] + pv
            ms2.append(mh2)
            ls2.append(lh)
            accs2.append(ah)
        return tuple(ms2), tuple(ls2), tuple(accs2)

    m0 = tuple(jnp.full((G, 128), MASK_VALUE, jnp.float32) for _ in range(Hkv))
    l0 = tuple(jnp.zeros((G, 128), jnp.float32) for _ in range(Hkv))
    a0 = tuple(jnp.zeros((G, D), jnp.float32) for _ in range(Hkv))
    ms, ls, accs = jax.lax.fori_loop(
        0, n_chunks - first_chunk, chunk_step, (m0, l0, a0)
    )
    cnt_ref[0] = cnt_ref[0] + jnp.maximum(n_chunks - first_chunk, 0)
    # Padded sequences (kv_len == 0) never ran a chunk: l==0 -> acc==0 -> 0.
    out = jnp.concatenate(
        [accs[h] / jnp.maximum(ls[h][:, :1], 1e-30) for h in range(Hkv)],
        axis=0,
    )  # [H, D]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale",
        "chunk_pages", "interpret",
    ),
)
def decode_paged_attention(
    q: jnp.ndarray,  # [S, H, D] — one query token per sequence
    kv_pages: jnp.ndarray,  # [P, page_size, 2*Hkv, D]
    kv_lens: jnp.ndarray,  # i32[S]
    page_indices: jnp.ndarray,  # i32[S, pages_per_seq]
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    soft_cap: Optional[float] = None,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    chunk_pages: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    S, H, D = q.shape
    P, page_size, combined, Dk = kv_pages.shape
    assert D == Dk and combined % 2 == 0
    Hkv = combined // 2
    assert H % Hkv == 0
    pages_per_seq = page_indices.shape[1]
    if not chunk_pages:
        # Aim at ~128 kv rows per chunk but never more pages than the table.
        chunk_pages = max(1, min(pages_per_seq, 128 // page_size))
    while pages_per_seq % chunk_pages != 0:
        chunk_pages -= 1

    kernel = functools.partial(
        _decode_kernel,
        chunk_pages=chunk_pages,
        sm_scale=sm_scale,
        sliding_window=sliding_window,
        soft_cap=soft_cap,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda s, *_: (s, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(
                (2, chunk_pages, page_size, combined, D), kv_pages.dtype
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kv_bytes = kv_pages.dtype.itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, H, D), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * S * H * D * pages_per_seq * page_size,
            bytes_accessed=S * pages_per_seq * page_size * combined * D
            * kv_bytes,
            transcendentals=S * H * pages_per_seq * page_size,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, q, kv_pages)
