"""GPT-2 (reference: src/models/openai/gpt2.h:313).

GPT-2 specifics: learned positional embeddings (no RoPE), LayerNorm with
bias, fused c_attn qkv (Conv1D stores [in, out] — no transpose), non-gated
gelu MLP with biases everywhere, tied word embeddings.
"""

from __future__ import annotations

from typing import Any, Dict

from scalellm_tpu.config import ModelArgs, hf_dtype
from scalellm_tpu.models.common import DecoderModel
from scalellm_tpu.models.registry import ModelRegistry

_P = r"(?:transformer\.)?"
GPT2_WEIGHT_RULES = [
    (_P + r"wte\.weight", "embed_tokens", False),
    (_P + r"wpe\.weight", "embed_positions", False),
    (_P + r"h\.(\d+)\.ln_1\.weight", "layers.input_norm", False),
    (_P + r"h\.(\d+)\.ln_1\.bias", "layers.input_norm_bias", False),
    # Conv1D weights are [in, out] already; fused qkv splits on the out dim.
    (_P + r"h\.(\d+)\.attn\.c_attn\.weight",
     ("layers.q_proj", "layers.k_proj", "layers.v_proj"), False),
    (_P + r"h\.(\d+)\.attn\.c_attn\.bias",
     ("layers.q_bias", "layers.k_bias", "layers.v_bias"), False),
    (_P + r"h\.(\d+)\.attn\.c_proj\.weight", "layers.o_proj", False),
    (_P + r"h\.(\d+)\.attn\.c_proj\.bias", "layers.o_bias", False),
    (_P + r"h\.(\d+)\.ln_2\.weight", "layers.post_norm", False),
    (_P + r"h\.(\d+)\.ln_2\.bias", "layers.post_norm_bias", False),
    (_P + r"h\.(\d+)\.mlp\.c_fc\.weight", "layers.up_proj", False),
    (_P + r"h\.(\d+)\.mlp\.c_fc\.bias", "layers.up_bias", False),
    (_P + r"h\.(\d+)\.mlp\.c_proj\.weight", "layers.down_proj", False),
    (_P + r"h\.(\d+)\.mlp\.c_proj\.bias", "layers.down_bias", False),
    (_P + r"ln_f\.weight", "final_norm", False),
    (_P + r"ln_f\.bias", "final_norm_bias", False),
]


@ModelRegistry.register_model_args("gpt2")
def load_gpt2_model_args(cfg: Dict[str, Any]) -> ModelArgs:
    """(reference: gpt2.h REGISTER_MODEL_ARGS)"""
    hidden = cfg.get("n_embd", 768)
    return ModelArgs(
        model_type="gpt2",
        dtype=hf_dtype(cfg, "float32"),
        hidden_size=hidden,
        hidden_act=cfg.get("activation_function", "gelu_new"),
        intermediate_size=cfg.get("n_inner") or 4 * hidden,
        n_layers=cfg.get("n_layer", 12),
        n_heads=cfg.get("n_head", 12),
        n_kv_heads=cfg.get("n_head", 12),
        vocab_size=cfg.get("vocab_size", 50257),
        layer_norm_eps=cfg.get("layer_norm_epsilon", 1e-5),
        max_position_embeddings=cfg.get("n_positions", 1024),
        bos_token_id=cfg.get("bos_token_id", 50256),
        eos_token_id=cfg.get("eos_token_id", 50256),
        tie_word_embeddings=True,
        pos_embedding_type="learned",
        norm_type="layer_norm",
        norm_bias=True,
        qkv_bias=True,
        o_proj_bias=True,
        mlp_bias=True,
        mlp_gated=False,
        raw=cfg,
    )


@ModelRegistry.register_causal_lm("gpt2")
def create_gpt2(args: ModelArgs, parallel, attn_impl=None) -> DecoderModel:
    model = DecoderModel(args, parallel, attn_impl)
    model.hf_weight_rules = GPT2_WEIGHT_RULES
    return model
