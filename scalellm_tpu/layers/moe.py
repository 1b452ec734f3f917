"""Mixture-of-experts MLP: router + top-k dispatch + grouped expert matmul.

TPU-native equivalent of the reference's MoE stack
(reference: src/layers/moe/token_dispatcher.h:22 TokenDispatcher,
local_token_dispatcher.h, src/kernels/moe/ topk/permutation kernels, and the
sm80 CUTLASS grouped GEMM, src/kernels/gemm/). On TPU the dispatch is a
sort-by-expert permutation feeding the megablox grouped-matmul Pallas kernel
(jax.experimental.pallas.ops.tpu.megablox.gmm); on CPU a dense mask loop
serves as the reference implementation.

Expert parallelism (reference: alltoall_token_dispatcher.h:12) shards the
expert dim of the stacked expert weights over the mesh axis; each shard
computes only the tokens routed to its experts (see moe_mlp's ep_axis).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp


@functools.cache
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _grouped_matmul(xs: jnp.ndarray, w: jnp.ndarray, group_sizes: jnp.ndarray):
    """xs [T', K] sorted by expert; w [E, K, N]; group_sizes i32[E] → [T', N]."""
    if _on_tpu():
        from jax.experimental.pallas.ops.tpu.megablox import gmm

        return gmm(
            xs.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            group_sizes,
            preferred_element_type=jnp.float32,
        )
    # CPU reference: segment-id mask accumulation (E is small in tests).
    E = w.shape[0]
    bounds = jnp.cumsum(group_sizes)
    starts = bounds - group_sizes
    t_idx = jnp.arange(xs.shape[0])[:, None]
    out = jnp.zeros((xs.shape[0], w.shape[-1]), jnp.float32)
    for e in range(E):
        mask = ((t_idx >= starts[e]) & (t_idx < bounds[e])).astype(jnp.float32)
        out = out + mask * jnp.dot(
            xs, w[e], preferred_element_type=jnp.float32
        )
    return out


def moe_mlp(
    x: jnp.ndarray,  # [T, D]
    router_w: jnp.ndarray,  # [D, E] (full) — router is replicated
    gate_w: jnp.ndarray,  # [E_local, D, F]
    up_w: jnp.ndarray,  # [E_local, D, F]
    down_w: jnp.ndarray,  # [E_local, F, D]
    top_k: int,
    norm_topk_prob: bool = False,
    act=jax.nn.silu,
    ep_axis=None,
) -> jnp.ndarray:
    """Returns [T, D] in f32 (pre-psum partial result under parallelism).

    Expert parallelism: when ep_axis is set, each shard holds E/ep experts
    (the expert dim of the stacked weights is sharded) and computes only the
    tokens routed to ITS experts; the caller's psum combines shards. With
    replicated activations this needs NO all_to_all at all — a strictly
    simpler dispatch than the reference's AlltoAllTokenDispatcher
    (alltoall_token_dispatcher.h:12), which exists because its activations
    are not replicated across expert ranks.
    """
    T, D = x.shape
    E = router_w.shape[-1]
    E_local = gate_w.shape[0]

    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
    topk_w, topk_e = jax.lax.top_k(probs, top_k)  # [T, k]
    if norm_topk_prob:
        topk_w = topk_w / jnp.maximum(
            jnp.sum(topk_w, axis=-1, keepdims=True), 1e-20
        )

    # Dispatch: flatten (token, slot) pairs, sort by expert id
    # (reference: permutation.{h,cpp} sort-by-expert indices).
    flat_e = topk_e.reshape(-1)  # [T*k]
    flat_w = topk_w.reshape(-1)
    if ep_axis is not None and E_local != E:
        # Keep only this shard's experts: remap [lo, hi) → [0, E_local) and
        # zero the weights of remote-expert slots (they route past E_local
        # into an ignored overflow group).
        shard = jax.lax.axis_index(ep_axis)
        lo = shard * E_local
        local = flat_e - lo
        in_range = (local >= 0) & (local < E_local)
        flat_e = jnp.where(in_range, local, E_local)
        flat_w = jnp.where(in_range, flat_w, 0.0)
    # Pad the (token, slot) rows to the grouped-matmul's row tile (megablox
    # requires multiples of 128); padding routes to the overflow group
    # (expert id E_local) so it sorts last and stays uncovered.
    total = flat_e.shape[0]
    if _on_tpu() and total % 128 != 0:
        pad = 128 - total % 128
        flat_e = jnp.concatenate(
            [flat_e, jnp.full((pad,), E_local, flat_e.dtype)]
        )
        flat_w = jnp.concatenate([flat_w, jnp.zeros((pad,), flat_w.dtype)])
    order = jnp.argsort(flat_e)  # stable
    token_of = jnp.minimum(order // top_k, T - 1)  # owner per sorted row
    xs = x[token_of]  # [T*k (padded), D]
    group_sizes = jnp.bincount(flat_e, length=E_local).astype(jnp.int32)

    # Expert FFN via grouped matmul (rows past the last real group fall in
    # the overflow region and are zero-weighted at combine).
    g = _grouped_matmul(xs, gate_w, group_sizes)
    u = _grouped_matmul(xs, up_w, group_sizes)
    h = (act(g) * u).astype(x.dtype)
    y = _grouped_matmul(h, down_w, group_sizes)  # [T*k, D]

    # Combine: weight by router prob and scatter-add back to tokens. Rows
    # past the last real group (remote-expert overflow) are uncovered by the
    # grouped matmul — mask them explicitly (0 * garbage could be NaN).
    w_sorted = flat_w[order]  # [T*k (padded)]
    covered = jnp.sum(group_sizes)
    row_idx = jnp.arange(y.shape[0])
    y = jnp.where((row_idx < covered)[:, None], y, 0.0)
    y = y * w_sorted[:, None]
    out = jnp.zeros((T, y.shape[-1]), jnp.float32).at[token_of].add(
        y, mode="drop"
    )
    return out
