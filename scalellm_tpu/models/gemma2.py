"""Gemma2 model family (reference: src/models/google/gemma2.h:381).

Gemma2 adds to gemma: alternating sliding-window/global attention (even
layers sliding), attention + final logit soft-capping, query_pre_attn_scalar
softmax scaling, and post-block norms (post_attention / pre_feedforward /
post_feedforward layernorms).
"""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

GEMMA2_WEIGHT_RULES = [
    (r"model\.embed_tokens\.weight", "embed_tokens", False),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "layers.q_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "layers.k_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "layers.v_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight", "layers.o_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.gate_proj\.weight", "layers.gate_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.up_proj\.weight", "layers.up_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.down_proj\.weight", "layers.down_proj", True),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
    # HF gemma2 "post_attention_layernorm" normalizes the ATTENTION OUTPUT
    # before the residual add; "pre_feedforward_layernorm" is the MLP
    # pre-norm (our post_norm slot).
    (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight", "layers.post_attn_norm", False),
    (r"model\.layers\.(\d+)\.pre_feedforward_layernorm\.weight", "layers.post_norm", False),
    (r"model\.layers\.(\d+)\.post_feedforward_layernorm\.weight", "layers.post_ffw_norm", False),
    (r"model\.norm\.weight", "final_norm", False),
]


@ModelRegistry.register_model_args("gemma2")
def load_gemma2_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    """(reference: gemma2.h REGISTER_MODEL_ARGS; sliding window + soft caps
    per model_args.h:98-101,125-127)"""
    return ModelArgs(
        model_type="gemma2",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 2304),
        hidden_act=cfg.get("hidden_activation", "gelu_pytorch_tanh")
        or "gelu_pytorch_tanh",
        intermediate_size=cfg.get("intermediate_size", 9216),
        n_layers=cfg.get("num_hidden_layers", 26),
        n_heads=cfg.get("num_attention_heads", 8),
        n_kv_heads=cfg.get("num_key_value_heads"),
        head_dim=cfg.get("head_dim", 256),
        vocab_size=cfg.get("vocab_size", 256000),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 10000.0),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        bos_token_id=cfg.get("bos_token_id", 2),
        eos_token_id=cfg.get("eos_token_id", 1),
        tie_word_embeddings=True,
        normalize_embedding=True,
        zero_centered_norm=True,
        residual_post_layernorm=True,
        norm_type="rms_norm",
        query_pre_attn_scalar=float(cfg.get("query_pre_attn_scalar", 256)),
        sliding_window=cfg.get("sliding_window", 4096),
        sliding_window_pattern=2,  # even layers sliding (HF: layer_idx % 2 == 0)
        attn_logit_soft_cap=float(cfg.get("attn_logit_softcapping") or 0.0),
        final_logit_soft_cap=float(cfg.get("final_logit_softcapping") or 0.0),
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("gemma2")
def create_gemma2(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = GEMMA2_WEIGHT_RULES
    return model
