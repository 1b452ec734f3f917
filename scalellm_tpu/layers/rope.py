"""Rotary position embeddings.

TPU-native equivalent of the reference's RotaryEmbedding
(reference: src/layers/pos_embedding.h:29-88, rope_scaling llama3 type at
pos_embedding.cpp:81). Supports rotated (HF llama) and interleaved (GPT-J)
layouts, partial rotary dims, linear scaling, and llama3 rope scaling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from scalellm_tpu.config import ModelArgs


def compute_inv_freq(args: ModelArgs) -> np.ndarray:
    """Per-frequency inverse wavelengths, with optional scaling applied."""
    rot_dim = args.effective_rotary_dim
    inv_freq = 1.0 / (
        args.rope_theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim)
    )
    rope_type = args.rope_scaling_rope_type
    factor = args.rope_scaling_factor
    if rope_type == "llama3" and factor > 0:
        # (reference: pos_embedding.cpp:81 apply_llama3_rope_scaling)
        low_freq_factor = args.rope_scaling_low_freq_factor
        high_freq_factor = args.rope_scaling_high_freq_factor
        orig_ctx = args.rope_scaling_original_max_position_embeddings
        low_freq_wavelen = orig_ctx / low_freq_factor
        high_freq_wavelen = orig_ctx / high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
        smooth = (orig_ctx / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        mid = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
        is_mid = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
        inv_freq = np.where(is_mid, mid, scaled)
    elif rope_type == "linear" and factor > 0:
        inv_freq = inv_freq / factor
    return inv_freq.astype(np.float32)


def compute_cos_sin(args: ModelArgs, positions: jnp.ndarray):
    """cos/sin tables for given positions: each [T, rot_dim // 2] (f32)."""
    inv_freq = jnp.asarray(compute_inv_freq(args))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jnp.ndarray,  # [T, n_heads, head_dim]
    cos: jnp.ndarray,  # [T, rot_dim//2]
    sin: jnp.ndarray,  # [T, rot_dim//2]
    interleaved: bool = False,
) -> jnp.ndarray:
    """Apply rotary embedding to the first rot_dim dims of each head."""
    rot_dim = cos.shape[-1] * 2
    dtype = x.dtype
    xr = x[..., :rot_dim].astype(jnp.float32)
    pass_through = x[..., rot_dim:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    if interleaved:
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        half = rot_dim // 2
        x1 = xr[..., :half]
        x2 = xr[..., half:]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.concatenate([o1, o2], axis=-1)
    out = out.astype(dtype)
    if pass_through.shape[-1]:
        out = jnp.concatenate([out, pass_through], axis=-1)
    return out
