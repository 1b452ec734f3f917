"""KV-cache scatter: write new tokens' K/V into paged cache arrays.

TPU-native equivalent of the reference's set_kv_cache CUDA kernel
(reference: src/kernels/kv_cache_kernels.h:6). On TPU this is a dynamic
scatter which XLA performs in place when the cache buffers are donated —
no custom kernel needed.

Cache layout: [num_pages, page_size, n_kv_heads, head_dim]; global slot id
s lives at page s // page_size, row s % page_size. Padding tokens write to
slot range [0, page_size) — page 0 is the reserved padding block
(reference: block_manager.cpp:40-42) so those writes are harmless.
"""

from __future__ import annotations

import jax.numpy as jnp


def set_kv_cache(
    kv_cache: jnp.ndarray,  # [P, page_size, n_kv_heads, head_dim]
    new_kv: jnp.ndarray,  # [T, n_kv_heads, head_dim]
    slot_ids: jnp.ndarray,  # [T] global slot ids
) -> jnp.ndarray:
    num_pages, page_size, n_kv_heads, head_dim = kv_cache.shape
    flat = kv_cache.reshape(num_pages * page_size, n_kv_heads, head_dim)
    flat = flat.at[slot_ids].set(new_kv.astype(flat.dtype), mode="drop")
    return flat.reshape(kv_cache.shape)
