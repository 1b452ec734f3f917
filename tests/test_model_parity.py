"""Model forward parity vs HF transformers (torch CPU) — the semantic ground
truth check for loader + RoPE + GQA attention + paged KV + incremental decode.
(Mirrors the role of the reference's RefHandler-based tests and
tests/kernels/attention/ref_attention.py.)"""

import numpy as np
import pytest

import tests.fixtures as fixtures


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama")
    return fixtures.make_tiny_llama(str(d))


@pytest.fixture(scope="module")
def hf_logits(tiny_llama):
    """Full-sequence logits from transformers for a fixed prompt."""
    import torch
    from transformers import LlamaForCausalLM

    model = LlamaForCausalLM.from_pretrained(tiny_llama).eval()
    prompt = [3, 17, 42, 9, 101, 7, 55, 23]
    with torch.no_grad():
        out = model(torch.tensor([prompt]))
    return prompt, out.logits[0].float().numpy()  # [T, V]


def build_model(tiny_llama):
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    loader = HFModelLoader(tiny_llama)
    loader.model_args.dtype = "float32"  # parity in f32
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, ParallelConfig())
    params = loader.load_params(model)
    return model, params, loader.model_args


def make_inputs(token_ids, positions, token_seg, slot_ids, block_tables, kv_lens, selected):
    import numpy as np_
    import jax.numpy as jnp

    from scalellm_tpu.engine.params import ModelInputs

    S = len(kv_lens)
    # Tokens are laid out seq-contiguously; derive cu_q_lens from token_seg.
    counts = np_.bincount(np_.asarray(token_seg), minlength=S)
    cu = np_.zeros(S + 1, np_.int32)
    cu[1:] = np_.cumsum(counts)
    return ModelInputs(
        token_ids=jnp.asarray(token_ids, dtype=jnp.int32),
        positions=jnp.asarray(positions, dtype=jnp.int32),
        token_seg=jnp.asarray(token_seg, dtype=jnp.int32),
        new_kv_slot_ids=jnp.asarray(slot_ids, dtype=jnp.int32),
        block_tables=jnp.asarray(block_tables, dtype=jnp.int32),
        kv_lens=jnp.asarray(kv_lens, dtype=jnp.int32),
        cu_q_lens=jnp.asarray(cu, dtype=jnp.int32),
        num_seqs=jnp.asarray([S], dtype=jnp.int32),
        selected_idxes=jnp.asarray(selected, dtype=jnp.int32),
        seq_mask=jnp.ones((S,), dtype=jnp.float32),
    )


def empty_kv(model, num_pages, page_size):
    import jax.numpy as jnp

    shape = model.kv_cache_shape(num_pages, page_size)
    return jnp.zeros(shape, jnp.float32)


def test_prefill_logits_match_hf(tiny_llama, hf_logits):
    prompt, ref = hf_logits
    model, params, args = build_model(tiny_llama)
    T = len(prompt)
    page_size = 4
    # seq uses blocks 1,2 (block 0 reserved for padding)
    kv_cache = empty_kv(model, num_pages=4, page_size=page_size)
    slot_ids = [page_size * 1 + i for i in range(4)] + [page_size * 2 + i for i in range(4)]
    mi = make_inputs(
        token_ids=prompt,
        positions=list(range(T)),
        token_seg=[0] * T,
        slot_ids=slot_ids,
        block_tables=[[1, 2]],
        kv_lens=[T],
        selected=[T - 1],
    )
    hidden, kv_cache = model.forward(params, kv_cache, mi)
    logits = np.asarray(model.logits(params, hidden))  # [1, V]
    np.testing.assert_allclose(logits[0], ref[-1], rtol=2e-4, atol=2e-4)


def test_decode_step_matches_full_prefill(tiny_llama, hf_logits):
    """Prefill first 7 tokens, then decode token 8 through the paged cache —
    logits must match transformers' full-sequence logits at the last position."""
    prompt, ref = hf_logits
    model, params, args = build_model(tiny_llama)
    page_size = 4
    kv_cache = empty_kv(model, num_pages=4, page_size=page_size)

    # Prefill 7 tokens into blocks [1, 2].
    T0 = 7
    slot_ids = [4 + i for i in range(4)] + [8 + i for i in range(3)]
    mi = make_inputs(prompt[:T0], list(range(T0)), [0] * T0, slot_ids, [[1, 2]], [T0], [T0 - 1])
    hidden, kv_cache = model.forward(params, kv_cache, mi)
    logits7 = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(logits7[0], ref[T0 - 1], rtol=2e-4, atol=2e-4)

    # Decode the 8th token (position 7) in slot 11.
    mi = make_inputs([prompt[7]], [7], [0], [11], [[1, 2]], [8], [0])
    hidden, kv_cache = model.forward(params, kv_cache, mi)
    logits8 = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(logits8[0], ref[-1], rtol=2e-4, atol=2e-4)


def test_two_sequence_ragged_batch(tiny_llama, hf_logits):
    """Mixed batch: two sequences with different lengths in one flattened
    step (chunked-prefill shape) — each must match its own HF logits."""
    import torch
    from transformers import LlamaForCausalLM

    prompt, ref = hf_logits
    prompt2 = [9, 8, 7, 6, 5]
    hf = LlamaForCausalLM.from_pretrained(tiny_llama).eval()
    with torch.no_grad():
        ref2 = hf(torch.tensor([prompt2])).logits[0].float().numpy()

    model, params, args = build_model(tiny_llama)
    page_size = 4
    kv_cache = empty_kv(model, num_pages=8, page_size=page_size)

    T1, T2 = len(prompt), len(prompt2)
    token_ids = prompt + prompt2
    positions = list(range(T1)) + list(range(T2))
    token_seg = [0] * T1 + [1] * T2
    # seq0 -> blocks 1,2 ; seq1 -> blocks 3,4
    slots = [4 + i for i in range(T1)] + [12 + i for i in range(T2)]
    mi = make_inputs(
        token_ids, positions, token_seg, slots,
        [[1, 2], [3, 4]], [T1, T2], [T1 - 1, T1 + T2 - 1],
    )
    hidden, _ = model.forward(params, kv_cache, mi)
    logits = np.asarray(model.logits(params, hidden))
    np.testing.assert_allclose(logits[0], ref[-1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(logits[1], ref2[-1], rtol=2e-4, atol=2e-4)
