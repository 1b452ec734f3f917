"""Multi-LoRA serving: loader units + runtime-vs-merged equivalence.

The strongest check without PEFT as a dependency: generating with
(base checkpoint + adapter at runtime) must match generating with a dense
checkpoint whose weights were merged offline (W' = W + B@A * alpha/r)."""

import json
import os

import numpy as np
import pytest

import tests.fixtures as fixtures
from scalellm_tpu.sampling.params import SamplingParams

TARGETS = ("q_proj", "v_proj", "gate_proj", "down_proj", "o_proj")


def _make_adapter(dirpath, base_dir, r=4, alpha=8, seed=0,
                  targets=TARGETS, scale=0.02):
    """Random LoRA adapter in HF PEFT layout for the tiny llama fixture.
    Returns {(layer, target): (A [r,K], B [N,r])} for merging."""
    from safetensors.numpy import save_file

    with open(os.path.join(base_dir, "config.json")) as f:
        cfg = json.load(f)
    D = cfg["hidden_size"]
    F = cfg["intermediate_size"]
    H = cfg["num_attention_heads"]
    Hkv = cfg.get("num_key_value_heads", H)
    Dh = D // H
    L = cfg["num_hidden_layers"]
    dims = {
        "q_proj": (D, H * Dh),
        "k_proj": (D, Hkv * Dh),
        "v_proj": (D, Hkv * Dh),
        "o_proj": (H * Dh, D),
        "gate_proj": (D, F),
        "up_proj": (D, F),
        "down_proj": (F, D),
    }
    rng = np.random.RandomState(seed)
    tensors = {}
    mats = {}
    for layer in range(L):
        for t in targets:
            K, N = dims[t]
            A = (rng.randn(r, K) * scale).astype(np.float32)
            B = (rng.randn(N, r) * scale).astype(np.float32)
            grp = "self_attn" if t in ("q_proj", "k_proj", "v_proj", "o_proj") else "mlp"
            prefix = f"base_model.model.model.layers.{layer}.{grp}.{t}"
            tensors[f"{prefix}.lora_A.weight"] = A
            tensors[f"{prefix}.lora_B.weight"] = B
            mats[(layer, t)] = (A, B)
    os.makedirs(dirpath, exist_ok=True)
    save_file(tensors, os.path.join(dirpath, "adapter_model.safetensors"))
    with open(os.path.join(dirpath, "adapter_config.json"), "w") as f:
        json.dump({"peft_type": "LORA", "r": r, "lora_alpha": alpha,
                   "target_modules": list(targets)}, f)
    return mats, alpha / r


def _make_merged(dirpath, base_dir, mats, scaling):
    """Dense checkpoint with the adapter folded into the weights."""
    import shutil

    from safetensors.numpy import load_file, save_file

    os.makedirs(dirpath, exist_ok=True)
    for name in os.listdir(base_dir):
        if not name.endswith(".safetensors"):
            shutil.copy(os.path.join(base_dir, name), os.path.join(dirpath, name))
    src = [f for f in os.listdir(base_dir) if f.endswith(".safetensors")]
    assert len(src) == 1
    weights = dict(load_file(os.path.join(base_dir, src[0])))
    for (layer, t), (A, B) in mats.items():
        grp = "self_attn" if t in ("q_proj", "k_proj", "v_proj", "o_proj") else "mlp"
        key = f"model.layers.{layer}.{grp}.{t}.weight"
        w = weights[key].astype(np.float32)  # torch layout [N, K]
        weights[key] = (w + (B @ A) * scaling).astype(weights[key].dtype)
    save_file(weights, os.path.join(dirpath, src[0]))
    return dirpath


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("lora_base"))
    fixtures.make_tiny_llama(base, tokenizer=True)
    ad1 = str(tmp_path_factory.mktemp("adapter1"))
    mats1, s1 = _make_adapter(ad1, base, r=4, alpha=8, seed=1)
    ad2 = str(tmp_path_factory.mktemp("adapter2"))
    mats2, s2 = _make_adapter(ad2, base, r=2, alpha=2, seed=2,
                              targets=("q_proj", "up_proj"))
    merged1 = _make_merged(str(tmp_path_factory.mktemp("merged1")), base, mats1, s1)
    merged2 = _make_merged(str(tmp_path_factory.mktemp("merged2")), base, mats2, s2)
    return base, ad1, ad2, merged1, merged2


def _llm(model_dir, **kw):
    from scalellm_tpu import LLM

    return LLM(model_dir, num_blocks=256, block_size=4,
               enable_cuda_graph=False, **kw)


SP = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)


def test_loader_shapes(dirs):
    base, ad1, ad2, *_ = dirs
    llm = _llm(base, lora_modules={"one": ad1, "two": ad2})
    eng = llm._handler.engine
    assert eng.lora_meta.names == ["one", "two"]
    assert eng.lora_meta.n_slots == 3
    assert eng.lora_meta.r_max == 4
    A, B = eng.executor.params["layers"]["lora_q_proj"]
    assert A.shape[1] == 3 and A.shape[3] == 4  # slots, r_max
    # slot 0 (base) is all-zero
    assert float(np.abs(np.asarray(A[:, 0])).max()) == 0.0


def test_lora_matches_merged(dirs):
    base, ad1, ad2, merged1, merged2 = dirs
    prompts = ["hello lora world", "abc def"]
    want1 = _llm(merged1).generate(prompts, [SP] * 2)
    want2 = _llm(merged2).generate(prompts, [SP] * 2)
    want_base = _llm(base).generate(prompts, [SP] * 2)

    llm = _llm(base, lora_modules={"one": ad1, "two": ad2})
    got_base = llm.generate(prompts, [SP] * 2)
    got1 = llm.generate(prompts, [SP] * 2, lora="one")
    got2 = llm.generate(prompts, [SP] * 2, lora="two")

    def texts(outs):
        return [o.outputs[0].text for o in outs]

    assert texts(got_base) == texts(want_base)
    assert texts(got1) == texts(want1)
    assert texts(got2) == texts(want2)


def test_adapter_changes_logits(dirs):
    """The delta is actually applied: first-token logprobs shift. (Text
    can legitimately match at small adapter scales — greedy ties — so the
    behavior check is at the logit level.)"""
    base, ad1, *_ = dirs
    sp = SamplingParams(max_tokens=1, temperature=0.0, logprobs=True,
                        ignore_eos=True)
    llm = _llm(base, lora_modules={"one": ad1})
    lp_base = llm.generate(["probe"], [sp])[0].outputs[0].logprobs[0].logprob
    lp_one = llm.generate(["probe"], [sp], lora="one")[0].outputs[0]
    assert abs(lp_one.logprobs[0].logprob - lp_base) > 1e-5


def test_mixed_adapter_batch(dirs):
    """One batch mixing base + both adapters: per-sequence adapter
    selection, verified at the logit level (batched-vs-solo greedy text
    can legitimately flip argmax ties, so compare first-token logprobs)."""
    base, ad1, ad2, merged1, merged2 = dirs
    llm = _llm(base, lora_modules={"one": ad1, "two": ad2})
    sp = SamplingParams(max_tokens=1, temperature=0.0, logprobs=True,
                        ignore_eos=True)
    prompts = ["mixed batch prompt"] * 3
    outs = llm.generate(prompts, [sp] * 3, lora=[None, "one", "two"])
    mixed = [o.outputs[0].logprobs[0] for o in outs]
    for row, lora in zip(mixed, [None, "one", "two"]):
        solo = llm.generate(prompts[:1], [sp], lora=lora)[0].outputs[0]
        assert row.token_id == solo.logprobs[0].token_id
        assert abs(row.logprob - solo.logprobs[0].logprob) < 1e-4, lora
    # different adapters actually produce different distributions
    assert abs(mixed[1].logprob - mixed[0].logprob) > 1e-6


def test_unknown_adapter_rejected(dirs):
    base, ad1, *_ = dirs
    llm = _llm(base, lora_modules={"one": ad1})
    out = llm.generate(["x"], [SP], lora="nope")[0]
    assert out.status is not None and not out.status.ok
    assert "nope" in out.status.message
