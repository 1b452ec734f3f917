"""Config-only synthetic checkpoints for benchmarks.

Writes config.json + a char tokenizer (no weight files); weights come from
the loader's zero fast path (SCALELLM_FAKE_LOAD=zero) and are allocated
directly on device. Step timing is identical to real checkpoints of the
same shape — only the sampled tokens are meaningless.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_INT8_QCFG = dict(
    quant_method="gptq", bits=8, group_size=128, sym=True,
    zero_point=False, desc_act=False,
)
# Gemma2 K dims (3584 / 2304) give unalignable scale-row counts at g128
# (28 / 18 rows — the layer-stacked stream DMA needs 8-aligned rows);
# these group sizes keep every projection on the fast stream path.
_INT8_G64_QCFG = {**_INT8_QCFG, "group_size": 64}
_INT8_G32_QCFG = {**_INT8_QCFG, "group_size": 32}
_INT4_QCFG = dict(
    quant_method="gptq", bits=4, group_size=128, sym=True,
    zero_point=False, desc_act=False,
)

PRESETS = {
    "tiny": dict(  # CPU smoke tests
        model_type="llama", torch_dtype="float32", vocab_size=256,
        hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    ),
    "tinyllama-1.1b": dict(
        model_type="llama", torch_dtype="bfloat16", vocab_size=32000,
        hidden_size=2048, intermediate_size=5632, num_hidden_layers=22,
        num_attention_heads=32, num_key_value_heads=4,
        max_position_embeddings=2048, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    ),
    "llama31-8b-int4": dict(
        model_type="llama", torch_dtype="bfloat16", vocab_size=128256,
        hidden_size=4096, intermediate_size=14336, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=4096, rope_theta=500000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        quantization_config=_INT4_QCFG,
    ),
    # BASELINE config 4 target: Gemma2-9B INT8 (speculative verify model).
    "gemma2-9b-int8": dict(
        model_type="gemma2", torch_dtype="bfloat16", vocab_size=256128,
        hidden_size=3584, intermediate_size=14336, num_hidden_layers=42,
        num_attention_heads=16, num_key_value_heads=8, head_dim=256,
        max_position_embeddings=8192, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=224, sliding_window=4096,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
        quantization_config=_INT8_G64_QCFG,
    ),
    # Draft for config 4 on ONE 16 GB chip: int8 quantization keeps
    # target(10.1 GB int8) + draft under HBM (bf16 draft would need 5.2 GB
    # → 15.3 GB total + KV). Drafts are routinely quantized in practice.
    "gemma2-2b-int8": dict(
        model_type="gemma2", torch_dtype="bfloat16", vocab_size=256128,
        hidden_size=2304, intermediate_size=9216, num_hidden_layers=26,
        num_attention_heads=8, num_key_value_heads=4, head_dim=256,
        max_position_embeddings=8192, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=256, sliding_window=4096,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
        quantization_config=_INT8_G32_QCFG,
    ),
    # Draft for config 4: gemma2-2b-shaped (shared tokenizer/vocab with the
    # 9B target — the spec sampler needs one vocab space).
    "gemma2-2b": dict(
        model_type="gemma2", torch_dtype="bfloat16", vocab_size=256128,
        hidden_size=2304, intermediate_size=9216, num_hidden_layers=26,
        num_attention_heads=8, num_key_value_heads=4, head_dim=256,
        max_position_embeddings=8192, rope_theta=10000.0,
        rms_norm_eps=1e-6, query_pre_attn_scalar=256, sliding_window=4096,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
    ),
}


def make_preset_dir(preset: str) -> str:
    from tests.fixtures import save_char_tokenizer

    cfg = PRESETS[preset]
    d = os.path.join(tempfile.gettempdir(), f"serve_bench_{preset}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    if not os.path.exists(os.path.join(d, "tokenizer.json")):
        save_char_tokenizer(d)
    return d
