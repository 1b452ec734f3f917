"""Mixtral MoE family (the reference's MoE layer stack had no registered
end-to-end model — deepseek was a TODO, src/models/deepseek/README.md; this
wires the MoE path to a real architecture)."""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

MIXTRAL_WEIGHT_RULES = [
    (r"model\.embed_tokens\.weight", "embed_tokens", False),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "layers.q_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "layers.k_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "layers.v_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight", "layers.o_proj", True),
    (r"model\.layers\.(\d+)\.block_sparse_moe\.gate\.weight", "layers.router", True),
    (r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w1\.weight", "layers.moe_gate", True),
    (r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w3\.weight", "layers.moe_up", True),
    (r"model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w2\.weight", "layers.moe_down", True),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
    (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight", "layers.post_norm", False),
    (r"model\.norm\.weight", "final_norm", False),
    (r"lm_head\.weight", "lm_head", True),
]


@ModelRegistry.register_model_args("mixtral")
def load_mixtral_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    return ModelArgs(
        model_type="mixtral",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 4096),
        hidden_act=cfg.get("hidden_act", "silu"),
        intermediate_size=cfg.get("intermediate_size", 14336),
        n_layers=cfg.get("num_hidden_layers", 32),
        n_heads=cfg.get("num_attention_heads", 32),
        n_kv_heads=cfg.get("num_key_value_heads"),
        vocab_size=cfg.get("vocab_size", 32000),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        rope_theta=cfg.get("rope_theta", 1e6),
        max_position_embeddings=cfg.get("max_position_embeddings", 32768),
        bos_token_id=cfg.get("bos_token_id", 1),
        eos_token_id=cfg.get("eos_token_id", 2),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        sliding_window=cfg.get("sliding_window"),
        norm_type="rms_norm",
        n_experts=cfg.get("num_local_experts", 8),
        n_experts_per_token=cfg.get("num_experts_per_tok", 2),
        moe_intermediate_size=cfg.get("intermediate_size", 14336),
        norm_topk_prob=True,  # HF Mixtral normalizes top-k router weights
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("mixtral")
def create_mixtral(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = MIXTRAL_WEIGHT_RULES
    return model
