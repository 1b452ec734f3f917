"""Generic decoder-only transformer core.

Where the reference defines one C++ header per model family
(reference: src/models/meta/llama.h:331, google/gemma2.h:381,
alibaba/qwen2.h:350, microsoft/phi.h:311 — each ~350 LoC of near-identical
module wiring), the TPU-native design is a single data-driven decoder whose
behavior is fully determined by ModelArgs. Per-model files only provide the
HF config loader, weight-name mapping, and chat template.

Design notes (TPU-first):
  - Params are a plain pytree with per-layer tensors STACKED along axis 0 so
    the layer loop is a single `lax.scan` — one compiled layer body instead
    of n_layers inlined copies (fast compiles, small HLO).
  - KV caches [n_layers, pages, page_size, n_kv_heads, head_dim] ride the
    scan as xs/ys and are donated by the caller, so XLA updates them in
    place.
  - Collectives (tensor parallelism) are explicit psum/all_gather guarded by
    ParallelConfig.tp_axis; the executor wraps forward in shard_map. Weight
    tensors arrive pre-sliced by shard_map's in_specs — the code below only
    ever sees local shapes (Megatron-style, like the reference's
    Column/RowParallelLinear, src/layers/linear/parallel_linear.h:42,81).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from scalellm_tpu.config import ModelArgs
from scalellm_tpu.engine.params import ModelInputs
from scalellm_tpu.layers.activations import act_with_mul
from scalellm_tpu.layers.norms import layer_norm, rms_norm
from scalellm_tpu.layers.rope import apply_rope, compute_cos_sin
from scalellm_tpu.ops.attention import kernel_head_dim, ragged_paged_attention
from scalellm_tpu.ops.kv_update import set_kv_cache
from scalellm_tpu.parallel.config import ParallelConfig


def _dtype_of(args: ModelArgs):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[
        args.dtype
    ]


class DecoderModel:
    """A causal LM: embedding → scan(decoder layer) → norm → lm_head.

    The TPU-native CausalLM (reference interface: src/models/causal_lm.h:18).
    """

    def __init__(
        self,
        args: ModelArgs,
        parallel: ParallelConfig = ParallelConfig(),
        attn_impl=None,
    ):
        self.args = args
        self.parallel = parallel
        self.attn_impl = attn_impl or ragged_paged_attention
        tp = parallel.tp_size
        assert args.n_heads % tp == 0, "n_heads must divide tp_size"
        # KV heads replicate when n_kv_heads < tp (reference:
        # qkv_parallel_linear.h:17 kv-head replication logic).
        self.n_local_heads = args.n_heads // tp
        self.kv_replication = max(1, tp // args.n_kv_heads)
        self.n_local_kv_heads = max(1, args.n_kv_heads // tp)
        assert args.intermediate_size % tp == 0
        # KV pages may store zero-padded heads when the attention backend
        # needs a wider lane-aligned head dim (TPU kernel: multiples of 128).
        self.kv_head_dim = kernel_head_dim(args.head_dim)

    # ------------------------------------------------------------ param spec

    def param_shapes(self) -> Dict[str, Any]:
        """GLOBAL (unsharded) shapes, with kv heads padded for replication."""
        a = self.args
        L, D, V, F = a.n_layers, a.hidden_size, a.vocab_size, a.intermediate_size
        H, Dh = a.n_heads, a.head_dim
        Hkv = self.n_local_kv_heads * self.parallel.tp_size  # replication-padded
        shapes = {
            "embed_tokens": (V, D),
            "layers": {
                "input_norm": (L, D),
                "q_proj": (L, D, H * Dh),
                "k_proj": (L, D, Hkv * Dh),
                "v_proj": (L, D, Hkv * Dh),
                "o_proj": (L, H * Dh, D),
                "post_norm": (L, D),
                "gate_proj": (L, D, F),
                "up_proj": (L, D, F),
                "down_proj": (L, F, D),
            },
            "final_norm": (D,),
        }
        if a.qkv_bias:
            shapes["layers"]["q_bias"] = (L, H * Dh)
            shapes["layers"]["k_bias"] = (L, Hkv * Dh)
            shapes["layers"]["v_bias"] = (L, Hkv * Dh)
        if not a.tie_word_embeddings:
            shapes["lm_head"] = (D, V)
        return shapes

    def param_partition_specs(self) -> Dict[str, Any]:
        """PartitionSpec per param for the tp mesh axis (Megatron layout)."""
        tp = self.parallel.tp_axis
        specs = {
            "embed_tokens": P(None, None),  # replicated (allreduce-free)
            "layers": {
                "input_norm": P(None, None),
                "q_proj": P(None, None, tp),  # column-parallel
                "k_proj": P(None, None, tp),
                "v_proj": P(None, None, tp),
                "o_proj": P(None, tp, None),  # row-parallel
                "post_norm": P(None, None),
                "gate_proj": P(None, None, tp),
                "up_proj": P(None, None, tp),
                "down_proj": P(None, tp, None),
            },
            "final_norm": P(None),
        }
        if self.args.qkv_bias:
            specs["layers"]["q_bias"] = P(None, tp)
            specs["layers"]["k_bias"] = P(None, tp)
            specs["layers"]["v_bias"] = P(None, tp)
        if not self.args.tie_word_embeddings:
            specs["lm_head"] = P(None, tp)  # vocab-sharded, logits all-gathered
        return specs

    def kv_cache_shape(self, num_pages: int, page_size: int) -> Tuple[int, ...]:
        """GLOBAL combined kv cache shape (K/V interleaved on the head dim,
        K even / V odd; that dim is sharded over tp)."""
        a = self.args
        Hkv = self.n_local_kv_heads * self.parallel.tp_size
        return (a.n_layers, num_pages, page_size, 2 * Hkv, self.kv_head_dim)

    def kv_cache_partition_spec(self) -> P:
        return P(None, None, None, self.parallel.tp_axis, None)

    def init_params(self, rng_key, scale: float = 0.02) -> Dict[str, Any]:
        """Random params (tests / memory profiling)."""
        dtype = _dtype_of(self.args)

        def init_leaf(path_shape, key):
            return (jax.random.normal(key, path_shape, dtype=jnp.float32) * scale).astype(dtype)

        shapes = self.param_shapes()
        leaves, treedef = jax.tree_util.tree_flatten(shapes, is_leaf=lambda x: isinstance(x, tuple))
        keys = jax.random.split(rng_key, len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [init_leaf(s, k) for s, k in zip(leaves, keys)]
        )
        # Norm weights should start at 1 (or 0 for zero-centered).
        one = 0.0 if self.args.zero_centered_norm else 1.0
        params["layers"]["input_norm"] = jnp.full_like(params["layers"]["input_norm"], one)
        params["layers"]["post_norm"] = jnp.full_like(params["layers"]["post_norm"], one)
        params["final_norm"] = jnp.full_like(params["final_norm"], one)
        return params

    # ------------------------------------------------------------ forward

    def _norm(self, x, w):
        a = self.args
        if a.norm_type == "rms_norm":
            return rms_norm(x, w, a.rms_norm_eps, a.zero_centered_norm)
        return layer_norm(x, w, None, a.layer_norm_eps)

    def _sm_scale(self) -> float:
        a = self.args
        if a.attn_scalar is not None:
            return a.attn_scalar
        if a.query_pre_attn_scalar > 0:
            return a.query_pre_attn_scalar ** -0.5
        return a.head_dim ** -0.5

    def _layer_windows(self) -> Optional[jnp.ndarray]:
        """Per-layer sliding window sizes, or None when unused.

        gemma2-style: layers where (i % pattern != pattern-1) use the window
        (reference: gemma2 sliding-window alternation, model_args.h:125-127).
        """
        a = self.args
        if not a.sliding_window:
            return None
        pattern = max(a.sliding_window_pattern, 1)
        win = [
            a.sliding_window if (i % pattern != pattern - 1 or pattern == 1) else -1
            for i in range(a.n_layers)
        ]
        return jnp.asarray(win, dtype=jnp.int32)

    def forward(
        self,
        params: Dict[str, Any],
        kv_cache: jnp.ndarray,  # [L, P, page, 2*Hkv_local, Dh] (local shapes)
        mi: ModelInputs,
    ):
        """Returns (hidden_selected [S, D], new_kv_cache)."""
        a = self.args
        tp_axis = self.parallel.tp_axis
        H_local = self.n_local_heads
        Hkv_local = self.n_local_kv_heads
        Dh = a.head_dim
        sm_scale = self._sm_scale()

        h = params["embed_tokens"][mi.token_ids]  # [T, D]
        if a.normalize_embedding:
            h = (h.astype(jnp.float32) * math.sqrt(a.hidden_size)).astype(h.dtype)

        cos, sin = compute_cos_sin(a, mi.positions)
        windows = self._layer_windows()
        soft_cap = a.attn_logit_soft_cap if a.attn_logit_soft_cap > 0 else None

        def attend(q, kvc, window):
            return self.attn_impl(
                q,
                kvc,
                mi.kv_lens,
                mi.block_tables,
                mi.cu_q_lens,
                mi.num_seqs,
                sm_scale=sm_scale,
                sliding_window=window,
                logit_soft_cap=soft_cap,
            )

        def layer_fn(carry, xs):
            h = carry
            if windows is None:
                lp, kvc = xs
                window_flag = None
            else:
                lp, kvc, window_flag = xs

            # ---- attention
            x = self._norm(h, lp["input_norm"])
            q = jnp.dot(x, lp["q_proj"], preferred_element_type=jnp.float32)
            k = jnp.dot(x, lp["k_proj"], preferred_element_type=jnp.float32)
            v = jnp.dot(x, lp["v_proj"], preferred_element_type=jnp.float32)
            if a.qkv_bias:
                q = q + lp["q_bias"].astype(jnp.float32)
                k = k + lp["k_bias"].astype(jnp.float32)
                v = v + lp["v_bias"].astype(jnp.float32)
            T = q.shape[0]
            q = q.astype(h.dtype).reshape(T, H_local, Dh)
            k = k.astype(h.dtype).reshape(T, Hkv_local, Dh)
            v = v.astype(h.dtype).reshape(T, Hkv_local, Dh)
            q = apply_rope(q, cos, sin, a.interleaved_rope)
            k = apply_rope(k, cos, sin, a.interleaved_rope)

            if self.kv_head_dim != Dh:
                pad = [(0, 0), (0, 0), (0, self.kv_head_dim - Dh)]
                q = jnp.pad(q, pad)
                k = jnp.pad(k, pad)
                v = jnp.pad(v, pad)

            kvc = set_kv_cache(kvc, k, v, mi.new_kv_slot_ids)

            if windows is None:
                o = attend(q, kvc, a.sliding_window or None)
            else:
                # Per-layer window alternation (gemma2-style): the kernel
                # needs a STATIC window, so branch on the traced flag between
                # two statically-compiled variants.
                o = lax.cond(
                    window_flag > 0,
                    lambda q, kvc: attend(q, kvc, a.sliding_window),
                    lambda q, kvc: attend(q, kvc, None),
                    q,
                    kvc,
                )
            if self.kv_head_dim != Dh:
                o = o[..., :Dh]
            o = jnp.dot(
                o.reshape(T, H_local * Dh),
                lp["o_proj"],
                preferred_element_type=jnp.float32,
            )
            if tp_axis is not None:
                o = lax.psum(o, tp_axis)
            h = h + o.astype(h.dtype)

            # ---- mlp
            x = self._norm(h, lp["post_norm"])
            g = jnp.dot(x, lp["gate_proj"], preferred_element_type=jnp.float32)
            u = jnp.dot(x, lp["up_proj"], preferred_element_type=jnp.float32)
            m = act_with_mul(a.hidden_act, g, u).astype(h.dtype)
            m = jnp.dot(m, lp["down_proj"], preferred_element_type=jnp.float32)
            if tp_axis is not None:
                m = lax.psum(m, tp_axis)
            h = h + m.astype(h.dtype)
            return h, kvc

        xs = (params["layers"], kv_cache)
        if windows is not None:
            xs = xs + (windows,)
        h, new_kv = lax.scan(layer_fn, h, xs)

        h = self._norm(h, params["final_norm"])
        hidden_sel = h[mi.selected_idxes]  # [S, D]
        return hidden_sel, new_kv

    def logits(self, params: Dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
        """[S, D] → full [S, V] logits (all-gathered over tp when sharded)."""
        a = self.args
        if a.tie_word_embeddings:
            w = params["embed_tokens"].T  # replicated: [D, V]
            logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)
        else:
            logits = jnp.dot(hidden, params["lm_head"], preferred_element_type=jnp.float32)
            if self.parallel.tp_axis is not None:
                logits = lax.all_gather(
                    logits, self.parallel.tp_axis, axis=1, tiled=True
                )
        if a.final_logit_soft_cap > 0.0:
            cap = a.final_logit_soft_cap
            logits = cap * jnp.tanh(logits / cap)
        return logits
