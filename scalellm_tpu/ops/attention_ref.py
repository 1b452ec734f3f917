"""Reference ragged paged attention in pure jnp.

The semantic ground truth for the Pallas kernel path (the analog of the
reference's RefHandler, src/layers/attention/ref_handler.h:13, and the CuTe
paged_kv_varlen_mha kernel's contract, src/kernels/attention/attn_api.h:14).

Handles, in one jit-friendly call (no python loop over sequences):
  - mixed prefill/decode: q is a flattened ragged batch [T, H, D]; each
    sequence's chunk is the tail of its KV context (chunked prefill falls
    out naturally)
  - paged KV with block-table indirection, combined K/V page layout
    [P, page_size, 2*Hkv, D] (K even combined-heads, V odd)
  - GQA (n_heads a multiple of n_kv_heads)
  - causal masking by absolute position
  - sliding-window attention (reference: model_args.h:125-127)
  - attention logit soft-capping (reference: model_args.h:98-101)

Inefficient by design (gathers a [T, KV, ...] tensor); used for correctness
tests and as the fallback path on CPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def ref_ragged_paged_attention(
    q: jnp.ndarray,  # [T, n_heads, head_dim]
    kv_pages: jnp.ndarray,  # [P, page_size, 2*n_kv_heads, head_dim]
    kv_lens: jnp.ndarray,  # i32[S]
    page_indices: jnp.ndarray,  # i32[S, MAXP]
    cu_q_lens: jnp.ndarray,  # i32[S+1]
    num_seqs: jnp.ndarray,  # i32[1] (unused: padding rows are fully masked)
    *,
    sm_scale: float = 1.0,
    sliding_window: Optional[int] = None,
    logit_soft_cap: Optional[float] = None,
    k_scale: Optional[float] = None,
    v_scale: Optional[float] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,  # f32[n_heads]
) -> jnp.ndarray:
    T, n_heads, head_dim = q.shape
    S, MAXP = page_indices.shape
    page_size = kv_pages.shape[1]
    n_kv_heads = kv_pages.shape[2] // 2
    group = n_heads // n_kv_heads
    KV = MAXP * page_size

    # Owning sequence of each flattened q token, and its absolute position.
    tok = jnp.arange(T, dtype=jnp.int32)
    token_seg = jnp.clip(
        jnp.searchsorted(cu_q_lens[1:], tok, side="right"), 0, S - 1
    ).astype(jnp.int32)
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]  # [S]
    # position of token within full context: kv_len - q_len + (t - q_start)
    positions = (
        kv_lens[token_seg]
        - q_lens[token_seg]
        + (tok - cu_q_lens[token_seg])
    )

    # Gather each sequence's KV pages: [S, KV, n_kv_heads, head_dim].
    pages = kv_pages[page_indices]  # [S, MAXP, page, 2H, D]
    k_seq = pages[:, :, :, 0::2, :].reshape(S, KV, n_kv_heads, head_dim)
    v_seq = pages[:, :, :, 1::2, :].reshape(S, KV, n_kv_heads, head_dim)
    k_tok = k_seq[token_seg]  # [T, KV, H_kv, D]
    v_tok = v_seq[token_seg]

    qf = q.reshape(T, n_kv_heads, group, head_dim).astype(jnp.float32)
    kf = k_tok.astype(jnp.float32)
    vf = v_tok.astype(jnp.float32)
    # Quantized (int8) KV pages: dequantize with the static scales
    # (matches the TPU kernel's k_scale/v_scale semantics).
    if k_scale is not None:
        kf = kf * k_scale
    if v_scale is not None:
        vf = vf * v_scale

    scores = jnp.einsum("thgd,tjhd->thgj", qf, kf) * sm_scale
    if alibi_slopes is not None:
        # ALiBi (arXiv:2108.12409): score += slope_h * (j - i) — zero at
        # the query position, increasingly negative into the past
        # (reference: mask.h alibi bias path). Applied AFTER sm_scale:
        # the bias is not part of the q.k product.
        kv_idx_b = jnp.arange(KV, dtype=jnp.int32)[None, :]
        dist = kv_idx_b.astype(jnp.float32) - positions.astype(jnp.float32)[:, None]
        sl = alibi_slopes.astype(jnp.float32).reshape(1, n_kv_heads, group, 1)
        scores = scores + sl * dist[:, None, None, :]
    if logit_soft_cap is not None and logit_soft_cap > 0.0:
        scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)

    kv_idx = jnp.arange(KV, dtype=jnp.int32)[None, :]  # [1, KV]
    pos = positions.astype(jnp.int32)[:, None]  # [T, 1]
    valid = kv_idx < kv_lens[token_seg][:, None]
    causal = kv_idx <= pos
    mask = valid & causal
    if sliding_window is not None:
        win = jnp.asarray(sliding_window, dtype=jnp.int32)
        # <= 0 disables (lets callers pass a traced per-layer scalar).
        win_mask = (win <= 0) | (kv_idx > pos - win)
        mask = mask & win_mask
    mask = mask[:, None, None, :]  # [T, 1, 1, KV]

    scores = jnp.where(mask, scores, -jnp.inf)
    # NaN-safe softmax (fully-masked padding rows produce zeros, not NaN).
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    unnorm = jnp.exp(scores - smax)
    unnorm = jnp.where(mask, unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    out = jnp.einsum("thgj,tjhd->thgd", probs, vf)
    return out.reshape(T, n_heads, head_dim).astype(q.dtype)
