"""KV-cache scatter: write new tokens' K/V into combined paged cache pages.

TPU-native equivalent of the reference's set_kv_cache CUDA kernel
(reference: src/kernels/kv_cache_kernels.h:6). On TPU this is a dynamic
scatter which XLA performs in place when the cache buffer is donated — no
custom kernel needed.

Cache layout (shared with the ragged-paged-attention kernel):
[num_pages, page_size, 2 * n_kv_heads, head_dim], K at even combined-head
indices, V at odd. Global slot id s lives at page s // page_size, row
s % page_size. Padding tokens write to slot range [0, page_size) — page 0
is the reserved padding block (reference: block_manager.cpp:40-42) so those
writes are harmless.
"""

from __future__ import annotations

import jax.numpy as jnp


def set_kv_cache(
    kv_pages: jnp.ndarray,  # [P, page_size, 2*n_kv_heads, head_dim]
    k: jnp.ndarray,  # [T, n_kv_heads, head_dim]
    v: jnp.ndarray,  # [T, n_kv_heads, head_dim]
    slot_ids: jnp.ndarray,  # [T] global slot ids
    k_scale=None,
    v_scale=None,
) -> jnp.ndarray:
    num_pages, page_size, h2, head_dim = kv_pages.shape
    T, n_kv, _ = k.shape
    if kv_pages.dtype == jnp.int8:
        # Quantized KV cache: store round(x / scale) clamped to int8
        # (dequantized by the attention kernel's k_scale/v_scale).
        k = jnp.clip(jnp.round(k.astype(jnp.float32) / k_scale), -127, 127)
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / v_scale), -127, 127)
    # Interleave: combined[t, 2h] = k[t, h]; combined[t, 2h+1] = v[t, h].
    combined = jnp.stack([k, v], axis=2).reshape(T, 2 * n_kv, head_dim)
    flat = kv_pages.reshape(num_pages * page_size, h2, head_dim)
    flat = flat.at[slot_ids].set(combined.astype(flat.dtype), mode="drop")
    return flat.reshape(kv_pages.shape)
