"""Model-zoo forward parity vs HF transformers (torch CPU) for every
registered family (mirrors the per-model coverage of the reference's
src/models/ zoo, SURVEY.md §2.4)."""

import numpy as np
import pytest

# family -> (HF config cls name, HF model cls name, config kwargs)
FAMILIES = {
    "llama": (
        "LlamaConfig", "LlamaForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, rms_norm_eps=1e-5,
             tie_word_embeddings=False),
    ),
    "gemma": (
        "GemmaConfig", "GemmaForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             head_dim=16, max_position_embeddings=256),
    ),
    "gemma2": (
        "Gemma2Config", "Gemma2ForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
             head_dim=16, max_position_embeddings=256,
             query_pre_attn_scalar=16, sliding_window=8,
             attn_logit_softcapping=50.0, final_logit_softcapping=30.0),
    ),
    "gpt2": (
        "GPT2Config", "GPT2LMHeadModel",
        dict(vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_positions=256,
             n_inner=128, activation_function="gelu_new"),
    ),
    "phi": (
        "PhiConfig", "PhiForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
             max_position_embeddings=256, partial_rotary_factor=0.5),
    ),
    "qwen2": (
        "Qwen2Config", "Qwen2ForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, tie_word_embeddings=False),
    ),
    "qwen3": (
        "Qwen3Config", "Qwen3ForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             head_dim=16, max_position_embeddings=256,
             tie_word_embeddings=False),
    ),
    "mixtral": (
        "MixtralConfig", "MixtralForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, num_local_experts=4,
             num_experts_per_tok=2, tie_word_embeddings=False),
    ),
    "qwen2_moe": (
        "Qwen2MoeConfig", "Qwen2MoeForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=96,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, num_experts=4, num_experts_per_tok=2,
             moe_intermediate_size=48, shared_expert_intermediate_size=96,
             norm_topk_prob=False, decoder_sparse_step=1, mlp_only_layers=[],
             tie_word_embeddings=False),
    ),
    "deepseek_v2": (
        "DeepseekV2Config", "DeepseekV2ForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=96,
             num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
             max_position_embeddings=256, q_lora_rank=24, kv_lora_rank=16,
             qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
             first_k_dense_replace=1, n_routed_experts=4,
             num_experts_per_tok=2, moe_intermediate_size=32,
             n_shared_experts=1, topk_method="greedy",
             routed_scaling_factor=1.0, tie_word_embeddings=False),
    ),
    "mpt": (
        "MptConfig", "MptForCausalLM",
        dict(vocab_size=128, d_model=64, n_layers=2, n_heads=4,
             expansion_ratio=4, max_seq_len=256, no_bias=True,
             attn_config={"alibi": True, "clip_qkv": 6.0},
             tie_word_embeddings=True),
    ),
    "bloom": (
        "BloomConfig", "BloomForCausalLM",
        dict(vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
             layer_norm_epsilon=1e-5, tie_word_embeddings=True),
    ),
    "mistral": (
        "MistralConfig", "MistralForCausalLM",
        dict(vocab_size=128, hidden_size=64, intermediate_size=128,
             num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
             max_position_embeddings=256, sliding_window=8,
             tie_word_embeddings=False),
    ),
}

PROMPT = [3, 17, 42, 9, 101, 7, 55, 23, 88, 121]


def make_checkpoint(tmp_path, family):
    import torch
    import transformers

    cfg_cls, model_cls, kwargs = FAMILIES[family]
    torch.manual_seed(0)
    cfg = getattr(transformers, cfg_cls)(**kwargs)
    model = getattr(transformers, model_cls)(cfg).to(torch.float32).eval()
    d = str(tmp_path / family)
    model.save_pretrained(d, safe_serialization=True)
    with torch.no_grad():
        ref = model(torch.tensor([PROMPT])).logits[0].float().numpy()
    return d, ref


def run_ours(model_dir):
    import jax.numpy as jnp

    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    loader = HFModelLoader(model_dir)
    loader.model_args.dtype = "float32"
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, ParallelConfig())
    params = loader.load_params(model)

    T = len(PROMPT)
    page_size = 4
    n_pages = (T + page_size - 1) // page_size
    kv_cache = jnp.zeros(model.kv_cache_shape(n_pages + 1, page_size), jnp.float32)
    mi = ModelInputs(
        token_ids=jnp.asarray(PROMPT, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page_size,
        block_tables=jnp.asarray([[i + 1 for i in range(n_pages)]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )
    hidden, _ = model.forward(params, kv_cache, mi)
    return np.asarray(model.logits(params, hidden))[0]


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_logits_match_hf(tmp_path, family):
    model_dir, ref = make_checkpoint(tmp_path, family)
    ours = run_ours(model_dir)
    np.testing.assert_allclose(ours, ref[-1], rtol=5e-4, atol=5e-4)


def test_deepseek_latent_cache_decode_matches_hf(tmp_path):
    """Multi-step DECODE through the MLA latent KV cache: each step re-reads
    previously-cached [c_kv | k_pe] latents via the absorbed formulation and
    must reproduce HF's full-sequence logits at that position."""
    import dataclasses

    import jax.numpy as jnp
    import torch
    import transformers

    from scalellm_tpu.engine.params import ModelInputs
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    model_dir, _ = make_checkpoint(tmp_path, "deepseek_v2")
    n_prefill, n_decode = len(PROMPT), 3
    full = PROMPT + [11, 29, 67]

    cfg = transformers.AutoConfig.from_pretrained(model_dir)
    hf = transformers.AutoModelForCausalLM.from_pretrained(model_dir).eval()
    with torch.no_grad():
        ref = hf(torch.tensor([full])).logits[0].float().numpy()

    loader = HFModelLoader(model_dir)
    loader.model_args.dtype = "float32"
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, ParallelConfig())
    params = loader.load_params(model)

    page_size = 4
    n_pages = (len(full) + page_size - 1) // page_size + 1
    kv = jnp.zeros(model.kv_cache_shape(n_pages + 1, page_size), jnp.float32)
    # latent cache: ONE K-only head (V = K[:, :kv_lora_rank]), not 2*H
    assert kv.shape[3] == 1

    def mi_for(tokens, start):
        t = len(tokens)
        return ModelInputs(
            token_ids=jnp.asarray(tokens, jnp.int32),
            positions=jnp.arange(start, start + t, dtype=jnp.int32),
            token_seg=jnp.zeros(t, jnp.int32),
            new_kv_slot_ids=jnp.arange(start, start + t, dtype=jnp.int32)
            + page_size,
            block_tables=jnp.asarray([[i + 1 for i in range(n_pages)]], jnp.int32),
            kv_lens=jnp.asarray([start + t], jnp.int32),
            cu_q_lens=jnp.asarray([0, t], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
            selected_idxes=jnp.asarray([t - 1], jnp.int32),
            seq_mask=jnp.ones(1, jnp.float32),
        )

    hidden, kv = model.forward(params, kv, mi_for(full[:n_prefill], 0))
    np.testing.assert_allclose(
        np.asarray(model.logits(params, hidden))[0], ref[n_prefill - 1],
        rtol=5e-4, atol=5e-4,
    )
    for i in range(n_decode):
        pos = n_prefill + i
        hidden, kv = model.forward(params, kv, mi_for([full[pos]], pos))
        np.testing.assert_allclose(
            np.asarray(model.logits(params, hidden))[0], ref[pos],
            rtol=5e-4, atol=5e-4,
        )
