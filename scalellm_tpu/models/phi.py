"""Phi family: phi-1 / phi-1.5 / phi-2 (reference: src/models/microsoft/phi.h:311).

Phi specifics: parallel residual (attention and MLP share one LayerNorm and
both add into the residual), partial rotary embedding
(partial_rotary_factor), biases on every linear including the LM head,
non-gated gelu MLP.
"""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

PHI_WEIGHT_RULES = [
    (r"model\.embed_tokens\.weight", "embed_tokens", False),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "layers.q_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.bias", "layers.q_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "layers.k_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.bias", "layers.k_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "layers.v_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.bias", "layers.v_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.dense\.weight", "layers.o_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.dense\.bias", "layers.o_bias", False),
    (r"model\.layers\.(\d+)\.mlp\.fc1\.weight", "layers.up_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.fc1\.bias", "layers.up_bias", False),
    (r"model\.layers\.(\d+)\.mlp\.fc2\.weight", "layers.down_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.fc2\.bias", "layers.down_bias", False),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
    (r"model\.layers\.(\d+)\.input_layernorm\.bias", "layers.input_norm_bias", False),
    (r"model\.final_layernorm\.weight", "final_norm", False),
    (r"model\.final_layernorm\.bias", "final_norm_bias", False),
    (r"lm_head\.weight", "lm_head", True),
    (r"lm_head\.bias", "lm_head_bias", False),
]


@ModelRegistry.register_model_args("phi")
def load_phi_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    """(reference: phi.h REGISTER_MODEL_ARGS — phi-msft layout)"""
    return ModelArgs(
        model_type="phi",
        dtype=hf_dtype(cfg, "float16"),
        hidden_size=cfg.get("hidden_size", 2048),
        hidden_act=cfg.get("hidden_act", "gelu_new"),
        intermediate_size=cfg.get("intermediate_size", 8192),
        n_layers=cfg.get("num_hidden_layers", 24),
        n_heads=cfg.get("num_attention_heads", 32),
        n_kv_heads=cfg.get("num_key_value_heads") or cfg.get("num_attention_heads", 32),
        vocab_size=cfg.get("vocab_size", 51200),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        rope_theta=cfg.get("rope_theta", 10000.0),
        rotary_pct=float(cfg.get("partial_rotary_factor", 0.5)),
        max_position_embeddings=cfg.get("max_position_embeddings", 2048),
        bos_token_id=cfg.get("bos_token_id", 1),
        eos_token_id=cfg.get("eos_token_id", 2),
        tie_word_embeddings=False,
        lm_head_bias=True,
        pos_embedding_type="rope",
        norm_type="layer_norm",
        norm_bias=True,
        qkv_bias=True,
        o_proj_bias=True,
        mlp_bias=True,
        mlp_gated=False,
        parallel_residual=True,
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("phi")
def create_phi(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = PHI_WEIGHT_RULES
    return model
