"""Packed KV-head layout parity: forcing the TPU page layout (heads packed
pairwise onto 128-lane rows, ops/attention.py kv_layout) must produce the
same logits as the natural unpacked layout. Runs on CPU with the reference
attention backend — the transform is backend-independent once the page
rows are 128 wide."""

import numpy as np
import pytest


def _greedy_tokens(model_dir, force_tpu_layout, monkeypatch, steps=4):
    import scalellm_tpu.models.common as common
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.model_loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.ops.attention import kv_layout
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    if force_tpu_layout:
        monkeypatch.setattr(
            common, "kv_layout", lambda h, d, b=None: kv_layout(h, d, "tpu")
        )

    loader = HFModelLoader(model_dir)
    loader.model_args.dtype = "float32"
    from scalellm_tpu.parallel.config import ParallelConfig

    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(loader.model_args, ParallelConfig())
    if force_tpu_layout:
        assert model.kv_pack == 2, (model.kv_pack, model.kv_head_dim)
        assert model.kv_head_dim == 128
        assert model.kv_stored_heads == 1
    params = loader.load_params(model)
    ex = Executor(model, params)
    ex.init_kv_cache(num_blocks=16, block_size=4)

    class _B:
        def __init__(self, i):
            self.id, self.size = i, 4

        def dec_ref(self):
            pass

    seq = Sequence(
        0, [3, 17, 42, 9, 101], SamplingParams(temperature=0.0), StoppingCriteria()
    )
    seq.blocks = [_B(1), _B(2), _B(3), _B(4)]
    toks = []
    n_prompt = len(seq.token_ids)
    for i in range(steps):
        b = Batch()
        b.add(seq, n_prompt if i == 0 else 1)
        mi, si, _ = b.prepare_model_inputs(4)
        outs = ex.execute(mi, si)
        t = int(np.asarray(outs.next_tokens)[0])
        toks.append(t)
        seq.append_token(t)
        seq.kv_cache_tokens = len(seq.token_ids) - 1
    return toks


def test_packed_layout_matches_unpacked(tmp_path, monkeypatch):
    from tests.fixtures import make_tiny_llama

    # head_dim 64, 2 kv heads -> pack=2 under the TPU layout; 8 q heads,
    # GQA group 4 (q heads 0-3 -> slot 0, 4-7 -> slot 1 of stored head 0).
    model_dir = make_tiny_llama(
        str(tmp_path / "m"),
        hidden_size=512,
        intermediate_size=256,
        num_attention_heads=8,
        num_key_value_heads=2,
    )
    plain = _greedy_tokens(model_dir, False, monkeypatch)
    packed = _greedy_tokens(model_dir, True, monkeypatch)
    assert plain == packed


def test_kv_layout_rules():
    from scalellm_tpu.ops.attention import kv_layout

    assert kv_layout(4, 64, "tpu") == (2, 128, 2)  # pairs
    assert kv_layout(8, 32, "tpu") == (2, 128, 4)  # quads
    assert kv_layout(1, 64, "tpu") == (1, 128, 1)  # MQA: pad, can't pack
    assert kv_layout(3, 96, "tpu") == (3, 128, 1)  # non-dividing: pad
    assert kv_layout(4, 128, "tpu") == (4, 128, 1)  # already aligned
    assert kv_layout(4, 64, "cpu") == (4, 64, 1)  # ref backend: natural
