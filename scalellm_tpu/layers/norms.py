"""Normalization layers (reference: src/layers/normalization.h:68,114,171).

Computed in f32 and cast back — XLA fuses these into neighbors; a Pallas
fused-norm kernel is unnecessary on TPU (the fusion is the kernel).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float, zero_centered: bool = False) -> jnp.ndarray:
    """RMSNorm; zero_centered uses (1 + w) weights (gemma convention)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if zero_centered:
        w = 1.0 + w
    return (xf * w).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
