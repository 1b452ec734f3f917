"""Synthetic tiny-model checkpoints for tests (no network access —
replaces the reference tests' HF-hub downloads of gpt2/llama-68m,
reference: tests/llm_test.py:9)."""

import os

TINY_LLAMA_KW = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def make_tiny_llama(dirpath: str, seed: int = 0, tokenizer: bool = False, **overrides) -> str:
    """Create a small random-weight HF llama checkpoint (float32)."""
    if os.path.exists(os.path.join(dirpath, "config.json")):
        return dirpath
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    kw = dict(TINY_LLAMA_KW)
    kw.update(overrides)
    cfg = LlamaConfig(**kw)
    model = LlamaForCausalLM(cfg)
    model = model.to(torch.float32)
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    if tokenizer:
        save_char_tokenizer(dirpath)
    return dirpath


def save_char_tokenizer(dirpath: str) -> None:
    """Byte/char-level tokenizer.json: token id == ord(char), ids < 256.
    Deterministic + round-trippable, so e2e tests need no HF downloads."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    vocab = {chr(i): i for i in range(256)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="\x00"))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok.decoder = decoders.Fuse()
    tok.save(os.path.join(dirpath, "tokenizer.json"))


def make_trained_tiny_llama(
    dirpath: str,
    steps: int = 250,
    seed: int = 0,
    hidden_size: int = 128,
    num_hidden_layers: int = 2,
) -> str:
    """A tiny char-level llama TRAINED on tests/data/corpus.txt (byte-level
    next-char prediction). Unlike the random fixtures, its perplexity is
    meaningful — the eval harness tests (test_eval.py) need quantization
    ppl DELTAS to be measurable against a structured model. Size overrides
    build weaker/stronger variants (e.g. a draft model for honest
    speculative-decoding acceptance rates)."""
    if os.path.exists(os.path.join(dirpath, "config.json")):
        return dirpath
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    corpus_path = os.path.join(os.path.dirname(__file__), "data", "corpus.txt")
    with open(corpus_path, "rb") as f:
        data = f.read()
    ids = torch.tensor([min(b, 255) for b in data], dtype=torch.long)

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=hidden_size,
        intermediate_size=hidden_size * 2,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).to(torch.float32)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(seed)
    T, B = 128, 16
    model.train()
    for _ in range(steps):
        starts = torch.randint(0, len(ids) - T - 1, (B,), generator=g)
        batch = torch.stack([ids[s : s + T] for s in starts])
        loss = model(input_ids=batch, labels=batch).loss
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    save_char_tokenizer(dirpath)
    return dirpath


def trained_tiny_llama_cached() -> str:
    """Session-cached trained fixture (training takes ~20s on CPU)."""
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "scalellm_trained_tiny_v1")
    return make_trained_tiny_llama(d)


def make_trained_tiny_mixtral(dirpath: str, steps: int = 250,
                              seed: int = 0) -> str:
    """A tiny char-level MIXTRAL (4 experts, top-2) trained on the corpus:
    gives the accuracy harness a structured MoE model so quantized-EXPERT
    ppl deltas (ops/moe_quant.py int8/int4 paths) are measurable."""
    if os.path.exists(os.path.join(dirpath, "config.json")):
        return dirpath
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    corpus_path = os.path.join(os.path.dirname(__file__), "data", "corpus.txt")
    with open(corpus_path, "rb") as f:
        data = f.read()
    ids = torch.tensor([min(b, 255) for b in data], dtype=torch.long)

    cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        num_local_experts=4,
        num_experts_per_tok=2,
        tie_word_embeddings=False,
        router_aux_loss_coef=0.01,
    )
    model = MixtralForCausalLM(cfg).to(torch.float32)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(seed)
    T, B = 128, 16
    model.train()
    for _ in range(steps):
        starts = torch.randint(0, len(ids) - T - 1, (B,), generator=g)
        batch = torch.stack([ids[s : s + T] for s in starts])
        loss = model(input_ids=batch, labels=batch).loss
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    save_char_tokenizer(dirpath)
    return dirpath


def trained_tiny_mixtral_cached() -> str:
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "scalellm_trained_mixtral_v1")
    return make_trained_tiny_mixtral(d)


def make_trained_tiny_deepseek(dirpath: str, steps: int = 250,
                               seed: int = 0) -> str:
    """A tiny char-level DEEPSEEK-V2 (MLA + 4 routed experts + 1 shared +
    1 dense layer) trained on the corpus: measurable ppl deltas for the
    full deepseek quantization matrix — routed experts (moe_quant),
    shared/dense/attention projections and lm_head (quant_matmul tiled
    streams, including the sub-128 group grids picked by _pick_group)."""
    if os.path.exists(os.path.join(dirpath, "config.json")):
        return dirpath
    import torch
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(seed)
    corpus_path = os.path.join(os.path.dirname(__file__), "data", "corpus.txt")
    with open(corpus_path, "rb") as f:
        data = f.read()
    ids = torch.tensor([min(b, 255) for b in data], dtype=torch.long)

    cfg = DeepseekV2Config(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=192,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=512,
        q_lora_rank=None,
        kv_lora_rank=32,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        first_k_dense_replace=1,
        n_routed_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=64,
        n_shared_experts=1,
        topk_method="greedy",
        routed_scaling_factor=1.0,
        norm_topk_prob=False,
        tie_word_embeddings=False,
    )
    model = DeepseekV2ForCausalLM(cfg).to(torch.float32)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.Generator().manual_seed(seed)
    T, B = 128, 16
    model.train()
    for _ in range(steps):
        starts = torch.randint(0, len(ids) - T - 1, (B,), generator=g)
        batch = torch.stack([ids[s : s + T] for s in starts])
        loss = model(input_ids=batch, labels=batch).loss
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    save_char_tokenizer(dirpath)
    return dirpath


def trained_tiny_deepseek_cached() -> str:
    import tempfile

    d = os.path.join(tempfile.gettempdir(), "scalellm_trained_deepseek_v1")
    return make_trained_tiny_deepseek(d)
