"""Gemma model family (reference: src/models/google/gemma.h:352).

Gemma specifics: zero-centered (1+w) RMSNorm, embeddings scaled by
sqrt(hidden_size), gelu-tanh gated MLP, always-tied word embeddings,
explicit head_dim.
"""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

GEMMA_WEIGHT_RULES = [
    (r"model\.embed_tokens\.weight", "embed_tokens", False),
    (r"model\.layers\.(\d+)\.self_attn\.q_proj\.weight", "layers.q_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.k_proj\.weight", "layers.k_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.v_proj\.weight", "layers.v_proj", True),
    (r"model\.layers\.(\d+)\.self_attn\.o_proj\.weight", "layers.o_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.gate_proj\.weight", "layers.gate_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.up_proj\.weight", "layers.up_proj", True),
    (r"model\.layers\.(\d+)\.mlp\.down_proj\.weight", "layers.down_proj", True),
    (r"model\.layers\.(\d+)\.input_layernorm\.weight", "layers.input_norm", False),
    (r"model\.layers\.(\d+)\.post_attention_layernorm\.weight", "layers.post_norm", False),
    (r"model\.norm\.weight", "final_norm", False),
]


@ModelRegistry.register_model_args("gemma")
def load_gemma_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    """(reference: gemma.h REGISTER_MODEL_ARGS LOAD_ARG section)"""
    return ModelArgs(
        model_type="gemma",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 2048),
        # older gemma configs say "gelu" but mean the tanh approximation
        hidden_act=(
            "gelu_pytorch_tanh"
            if cfg.get("hidden_act", "gelu") in ("gelu", None)
            else cfg["hidden_act"]
        ),
        intermediate_size=cfg.get("intermediate_size", 16384),
        n_layers=cfg.get("num_hidden_layers", 18),
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
        norm_type="rms_norm",
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("gemma")
def create_gemma(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = GEMMA_WEIGHT_RULES
    return model


@ModelRegistry.register_chat_template("gemma", "gemma2")
def gemma_chat_template(messages) -> str:
    """Gemma <start_of_turn> template (reference: gemma.h chat template)."""
    out = ["<bos>"]
    for m in messages:
        role = "model" if m.role == "assistant" else m.role
        out.append(f"<start_of_turn>{role}\n{m.content}<end_of_turn>\n")
    out.append("<start_of_turn>model\n")
    return "".join(out)
