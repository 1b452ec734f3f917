"""Reference ragged paged attention in pure jnp.

The semantic ground truth for the Pallas kernels (the analog of the
reference's RefHandler, src/layers/attention/ref_handler.h:13, and the CuTe
paged_kv_varlen_mha kernel's contract, src/kernels/attention/attn_api.h:14).

Handles, in one call:
  - mixed prefill/decode: queries are a flattened ragged batch [T, H, D]
    with per-token sequence ids (chunked prefill falls out naturally)
  - paged KV with block-table indirection
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
    k_cache: jnp.ndarray,  # [P, page_size, n_kv_heads, head_dim] (already updated)
    v_cache: jnp.ndarray,  # [P, page_size, n_kv_heads, head_dim]
    positions: jnp.ndarray,  # [T] query token positions
    token_seg: jnp.ndarray,  # [T] owning sequence index
    block_tables: jnp.ndarray,  # [S, MAXP]
    kv_lens: jnp.ndarray,  # [S]
    sm_scale: float,
    sliding_window: Optional[int] = None,
    logit_soft_cap: float = 0.0,
) -> jnp.ndarray:
    T, n_heads, head_dim = q.shape
    S, MAXP = block_tables.shape
    page_size = k_cache.shape[1]
    n_kv_heads = k_cache.shape[2]
    group = n_heads // n_kv_heads
    KV = MAXP * page_size

    # Gather each sequence's KV pages: [S, KV, n_kv_heads, head_dim].
    k_seq = k_cache[block_tables].reshape(S, KV, n_kv_heads, head_dim)
    v_seq = v_cache[block_tables].reshape(S, KV, n_kv_heads, head_dim)
    # Per-token view: [T, KV, n_kv_heads, head_dim].
    k_tok = k_seq[token_seg]
    v_tok = v_seq[token_seg]

    qf = q.reshape(T, n_kv_heads, group, head_dim).astype(jnp.float32)
    kf = k_tok.astype(jnp.float32)
    vf = v_tok.astype(jnp.float32)

    # scores[t, h, g, j] = q[t, h, g] · k[t, j, h]
    scores = jnp.einsum("thgd,tjhd->thgj", qf, kf) * sm_scale
    if logit_soft_cap > 0.0:
        scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)

    kv_idx = jnp.arange(KV, dtype=jnp.int32)[None, :]  # [1, KV]
    pos = positions.astype(jnp.int32)[:, None]  # [T, 1]
    valid = kv_idx < kv_lens[token_seg][:, None]  # within the sequence
    causal = kv_idx <= pos
    mask = valid & causal
    if sliding_window is not None:
        # sliding_window may be a traced per-layer scalar; <= 0 disables it
        # (lets lax.scan pass a [n_layers] window array for gemma2-style
        # alternating local/global attention).
        win = jnp.asarray(sliding_window, dtype=jnp.int32)
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
