"""Qwen (v1) family (reference: src/models/alibaba/qwen.h:315).

Qwen1 specifics: fused c_attn qkv with bias, MLP computes
c_proj(w1(x) * silu(w2(x))) — so w2 is the gate and w1 the up projection
(reference: qwen.h:64-65 "gate_up[0] * act_(gate_up[1])" over ["w1.","w2."]).
"""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

_P = r"(?:transformer\.)?"
QWEN_WEIGHT_RULES = [
    (_P + r"wte\.weight", "embed_tokens", False),
    (_P + r"h\.(\d+)\.ln_1\.weight", "layers.input_norm", False),
    (_P + r"h\.(\d+)\.attn\.c_attn\.weight",
     ("layers.q_proj", "layers.k_proj", "layers.v_proj"), True),
    (_P + r"h\.(\d+)\.attn\.c_attn\.bias",
     ("layers.q_bias", "layers.k_bias", "layers.v_bias"), False),
    (_P + r"h\.(\d+)\.attn\.c_proj\.weight", "layers.o_proj", True),
    (_P + r"h\.(\d+)\.ln_2\.weight", "layers.post_norm", False),
    # w1 = up, w2 = gate (see module docstring).
    (_P + r"h\.(\d+)\.mlp\.w1\.weight", "layers.up_proj", True),
    (_P + r"h\.(\d+)\.mlp\.w2\.weight", "layers.gate_proj", True),
    (_P + r"h\.(\d+)\.mlp\.c_proj\.weight", "layers.down_proj", True),
    (_P + r"ln_f\.weight", "final_norm", False),
    (r"lm_head\.weight", "lm_head", True),
]


@ModelRegistry.register_model_args("qwen")
def load_qwen_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    """(reference: qwen.h REGISTER_MODEL_ARGS; note intermediate_size // 2
    because the checkpoint stores the doubled ff dim)"""
    return ModelArgs(
        model_type="qwen",
        dtype=hf_dtype(cfg, "bfloat16"),
        hidden_size=cfg.get("hidden_size", 4096),
        hidden_act="silu",
        intermediate_size=cfg.get("intermediate_size", 22016) // 2,
        n_layers=cfg.get("num_hidden_layers", 32),
        n_heads=cfg.get("num_attention_heads", 32),
        n_kv_heads=cfg.get("num_attention_heads", 32),
        vocab_size=cfg.get("vocab_size", 151936),
        rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
        rope_theta=cfg.get("rotary_emb_base", 10000.0),
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        eos_token_id=cfg.get("eos_token_id", 151643),
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        norm_type="rms_norm",
        qkv_bias=True,
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("qwen")
def create_qwen(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = QWEN_WEIGHT_RULES
    return model
