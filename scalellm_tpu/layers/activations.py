"""Activation functions (reference: src/layers/activation.{h,cpp}).

The reference ships fused act(+mul) CUDA kernels; on TPU, XLA fuses the
elementwise act+mul into the surrounding matmuls, so plain jnp is the
roofline implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ACT2FN = {
    "silu": jax.nn.silu,
    # HF/torch "gelu" is the exact erf form; jax defaults to tanh-approx.
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
}


def act_with_mul(name: str, gate: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """act(gate) * up — the gated-MLP elementwise step."""
    return ACT2FN[name](gate) * up
