"""Qwen2-MoE family (qwen1.5-moe / qwen2-57b-a14b): top-k routed experts
plus an always-on shared expert with a learned sigmoid gate."""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

QWEN2_MOE_WEIGHT_RULES = [
    (r"model\.embed_tokens\.weight", "embed_tokens", False),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "layers.q_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "layers.k_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "layers.v_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.bias", "layers.q_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.bias", "layers.k_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.bias", "layers.v_bias", False),
    (r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight", "layers.o_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.gate\.weight", "layers.router", True),
    (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.gate_proj\.weight", "layers.moe_gate", True),
    (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.up_proj\.weight", "layers.moe_up", True),
    (r"model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.down_proj\.weight", "layers.moe_down", True),
    (r"model\.layers\.(\d+)\.mlp\.shared_expert\.gate_proj\.weight", "layers.gate_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.shared_expert\.up_proj\.weight", "layers.up_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.shared_expert\.down_proj\.weight", "layers.down_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.shared_expert_gate\.weight", "layers.shared_gate", True),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
    (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight", "layers.post_norm", False),
    (r"model\.norm\.weight", "final_norm", False),
    (r"lm_head\.weight", "lm_head", True),
]


@ModelRegistry.register_model_args("qwen2_moe")
def load_qwen2_moe_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    return ModelArgs(
        model_type="qwen2_moe",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 2048),
        hidden_act=cfg.get("hidden_act", "silu"),
        intermediate_size=cfg.get("intermediate_size", 5632),
        n_layers=cfg.get("num_hidden_layers", 24),
        n_heads=cfg.get("num_attention_heads", 16),
        n_kv_heads=cfg.get("num_key_value_heads"),
        vocab_size=cfg.get("vocab_size", 151936),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 1e6),
        max_position_embeddings=cfg.get("max_position_embeddings", 32768),
        eos_token_id=cfg.get("eos_token_id", 151643),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        norm_type="rms_norm",
        qkv_bias=True,
        n_experts=cfg.get("num_experts", 60),
        n_experts_per_token=cfg.get("num_experts_per_tok", 4),
        moe_intermediate_size=cfg.get("moe_intermediate_size", 1408),
        moe_shared_intermediate=cfg.get("shared_expert_intermediate_size", 5632),
        norm_topk_prob=bool(cfg.get("norm_topk_prob", False)),
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("qwen2_moe")
def create_qwen2_moe(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = QWEN2_MOE_WEIGHT_RULES
    return model
