"""BLOOM model family (BigScience bloom-560m…176b): ALiBi attention,
embedding LayerNorm, head-interleaved fused QKV.

Reference parity: src/models/_deprecated/bloom.h (deprecated in the
reference zoo but architecturally distinct: it is the only family with a
word_embeddings_layernorm and the per-head-interleaved query_key_value
layout — BloomAttentionImpl::reshape_qkv_tensor permutes
[n_heads, 3, head_dim] → [3, n_heads, head_dim] at load; the same
permutation happens here in the weight-rule transform). ALiBi slopes,
LayerNorm(+bias) everywhere, non-gated gelu MLP, tied word embeddings.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry


@ModelRegistry.register_model_args("bloom")
def load_bloom_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    hidden = cfg.get("hidden_size") or cfg.get("n_embed", 64)
    return ModelArgs(
        model_type="bloom",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=hidden,
        hidden_act="gelu_pytorch_tanh",  # HF BloomGelu = tanh-approx gelu
        intermediate_size=4 * hidden,
        n_layers=cfg.get("n_layer", 2),
        n_heads=cfg.get("n_head", 8),
        n_kv_heads=cfg.get("n_head", 8),  # MHA
        vocab_size=cfg.get("vocab_size", 250880),
        layer_norm_eps=float(cfg.get("layer_norm_epsilon", 1e-5)),
        # bloom has no position embeddings at all; seq length is
        # unconstrained by params — use a serving-reasonable default.
        max_position_embeddings=cfg.get("seq_length", 2048),
        bos_token_id=cfg.get("bos_token_id", 1),
        eos_token_id=cfg.get("eos_token_id", 2),
        tie_word_embeddings=True,  # bloom always ties lm_head to embeddings
        pos_embedding_type="alibi",
        norm_type="layer_norm",
        norm_bias=True,
        embedding_norm=True,
        qkv_bias=True,
        o_proj_bias=True,
        mlp_bias=True,
        mlp_gated=False,
        raw=cfg,
    )


def _qkv_weight_transform(n_heads: int, head_dim: int):
    """Un-interleave the fused QKV weight. The loader transposes first, so
    the transform sees [hidden, n_heads*3*head_dim] with q/k/v interleaved
    per head; reorder to contiguous [q | k | v] so the generic
    tuple-path equal-split rule applies (reference:
    BloomAttentionImpl::reshape_qkv_tensor, bloom.h:151-160)."""

    def t(w: np.ndarray) -> np.ndarray:
        hidden = w.shape[0]
        return np.ascontiguousarray(
            w.reshape(hidden, n_heads, 3, head_dim)
            .transpose(0, 2, 1, 3)
            .reshape(hidden, 3 * n_heads * head_dim)
        )

    return t


def _qkv_bias_transform(n_heads: int, head_dim: int):
    def t(b: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(
            b.reshape(n_heads, 3, head_dim).transpose(1, 0, 2).reshape(-1)
        )

    return t


@ModelRegistry.register_causal_lm("bloom")
def create_bloom(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    P = r"(?:transformer\.)?"
    qkv = ("layers.q_proj", "layers.k_proj", "layers.v_proj")
    qkv_b = ("layers.q_bias", "layers.k_bias", "layers.v_bias")
    wt = _qkv_weight_transform(args.n_heads, args.head_dim)
    bt = _qkv_bias_transform(args.n_heads, args.head_dim)
    model.hf_weight_rules = [
        (P + r"word_embeddings\.weight", "embed_tokens", False),
        (P + r"word_embeddings_layernorm\.weight", "embed_norm", False),
        (P + r"word_embeddings_layernorm\.bias", "embed_norm_bias", False),
        (P + r"h\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
        (P + r"h\.(\d+)\.input_layernorm\.bias", "layers.input_norm_bias", False),
        (P + r"h\.(\d+)\.self_attention\.query_key_value\.weight", qkv, True, wt),
        (P + r"h\.(\d+)\.self_attention\.query_key_value\.bias", qkv_b, False, bt),
        (P + r"h\.(\d+)\.self_attention\.dense\.weight", "layers.o_proj", True),
        (P + r"h\.(\d+)\.self_attention\.dense\.bias", "layers.o_bias", False),
        (P + r"h\.(\d+)\.post_attention_layernorm\.weight", "layers.post_norm", False),
        (P + r"h\.(\d+)\.post_attention_layernorm\.bias", "layers.post_norm_bias", False),
        (P + r"h\.(\d+)\.mlp\.dense_h_to_4h\.weight", "layers.up_proj", True),
        (P + r"h\.(\d+)\.mlp\.dense_h_to_4h\.bias", "layers.up_bias", False),
        (P + r"h\.(\d+)\.mlp\.dense_4h_to_h\.weight", "layers.down_proj", True),
        (P + r"h\.(\d+)\.mlp\.dense_4h_to_h\.bias", "layers.down_bias", False),
        (P + r"ln_f\.weight", "final_norm", False),
        (P + r"ln_f\.bias", "final_norm_bias", False),
        (r"lm_head\.weight", "lm_head", True),
    ]
    return model
