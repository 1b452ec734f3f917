"""Small unit tests: incremental decoder, chat templates, stopping criteria,
metrics export (mirrors the reference's per-component gtest coverage)."""

import pytest


class ByteTok:
    def decode(self, ids, skip_special_tokens=True):
        return bytes(i % 256 for i in ids).decode("utf-8", errors="replace")


def test_incremental_decoder_utf8_holdback():
    """Multi-byte glyphs emitted over several tokens surface only once
    complete (reference: incremental_decoder.h prefix/output offsets)."""
    from scalellm_tpu.request.incremental_decoder import IncrementalDecoder

    tok = ByteTok()
    # "é" = 0xC3 0xA9 arrives one byte at a time after "hi "
    ids = [104, 105, 32]
    dec = IncrementalDecoder("", 0, echo=False)
    out = dec.decode(ids, tok)
    assert out == "hi "
    ids.append(0xC3)
    assert dec.decode(ids, tok) == ""  # incomplete glyph held back
    ids.append(0xA9)
    assert dec.decode(ids, tok) == "é"


def test_incremental_decoder_echo():
    from scalellm_tpu.request.incremental_decoder import IncrementalDecoder

    tok = ByteTok()
    dec = IncrementalDecoder("prompt:", 3, echo=True)
    out = dec.decode([1, 2, 3, 104, 105], tok)
    assert out.startswith("prompt:")
    assert out.endswith("hi")


def test_coded_chat_templates():
    from scalellm_tpu.utils.chat import Message, apply_chat_template
    import scalellm_tpu.models  # registration side effects

    msgs = [Message("system", "be brief"), Message("user", "hi")]
    out = apply_chat_template(msgs, model_type="llama2")
    assert "[INST]" in out and "<<SYS>>" in out

    out = apply_chat_template(msgs, model_type="llama3")
    assert "<|start_header_id|>assistant<|end_header_id|>" in out

    out = apply_chat_template([Message("user", "hi")], model_type="qwen2")
    assert out.endswith("<|im_start|>assistant\n")

    out = apply_chat_template([Message("assistant", "yo")], model_type="gemma")
    assert "<start_of_turn>model" in out


def test_jinja_chat_template_priority():
    """A tokenizer-config jinja template wins over the coded default
    (capability superset of the reference, chat_template.h:20)."""
    from scalellm_tpu.utils.chat import Message, apply_chat_template

    tmpl = "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}GEN:"
    out = apply_chat_template(
        [Message("user", "x")], jinja_template=tmpl, model_type="llama"
    )
    assert out == "[user]xGEN:"


def test_jinja_chat_template_sandboxed():
    """Checkpoint-supplied templates are untrusted: __class__/__subclasses__
    gadget chains must not execute (sandboxed env), and the coded fallback
    takes over when the template is rejected."""
    from scalellm_tpu.utils.chat import Message, apply_chat_template

    evil = (
        "{{ ''.__class__.__mro__[1].__subclasses__() }}"
    )
    out = apply_chat_template(
        [Message("user", "hi")], jinja_template=evil, model_type="llama2"
    )
    # sandbox raised -> coded llama2 template rendered instead
    assert "<class" not in out and "[INST]" in out


def test_deepseek_yarn_rope_scaling():
    """Yarn inv_freq blending + mscale must match the HF DeepseekV2 formula
    (ADVICE r1: unscaled frequencies + unadjusted sm_scale were silently
    wrong for real V2/V2-Lite checkpoints)."""
    import math

    import numpy as np

    from scalellm_tpu.models.deepseek import (
        MLADecoderModel, load_deepseek_v2_model_args,
    )

    cfg = {
        "hidden_size": 64, "num_hidden_layers": 1, "num_attention_heads": 2,
        "vocab_size": 128, "kv_lora_rank": 32, "qk_nope_head_dim": 16,
        "qk_rope_head_dim": 16, "v_head_dim": 16, "rope_theta": 10000.0,
        "rope_scaling": {
            "type": "yarn", "factor": 40.0,
            "original_max_position_embeddings": 4096,
            "beta_fast": 32, "beta_slow": 1,
            "mscale": 0.707, "mscale_all_dim": 0.707,
        },
    }
    args = load_deepseek_v2_model_args(cfg)
    model = MLADecoderModel(args)

    # softmax scale: qk_head_dim**-0.5 * mscale(factor, mscale_all_dim)**2
    m_all = 0.1 * 0.707 * math.log(40.0) + 1.0
    assert abs(model.sm_scale - (32 ** -0.5) * m_all * m_all) < 1e-6

    # rope tables: independent reimplementation of the HF yarn blend
    positions = np.array([0, 100], dtype=np.int32)
    cos, sin = model._rope_tables(positions)
    cos, sin = np.asarray(cos), np.asarray(sin)
    r, base, factor, omax = 16, 10000.0, 40.0, 4096.0
    freq_extra = 1.0 / base ** (np.arange(0, r, 2) / r)
    freq_inter = freq_extra / factor

    def corr_dim(n_rot):
        return (r * math.log(omax / (n_rot * 2 * math.pi))) / (2 * math.log(base))

    low = max(math.floor(corr_dim(32)), 0)
    high = min(math.ceil(corr_dim(1)), r - 1)
    ramp = np.clip((np.arange(r // 2) - low) / max(high - low, 0.001), 0, 1)
    inv_freq = freq_inter * ramp + freq_extra * (1 - ramp)
    mscale = (0.1 * 0.707 * math.log(40.0) + 1.0) / m_all  # = 1 here
    expect_cos = np.cos(positions[:, None] * inv_freq[None, :]) * mscale
    np.testing.assert_allclose(cos, expect_cos, rtol=2e-5, atol=2e-5)
    assert abs(sin[0].sum()) < 1e-6  # position 0


def test_deepseek_router_norm_topk_prob():
    """norm_topk_prob=True normalizes top-k weights (no scaling factor);
    False multiplies by routed_scaling_factor (HF DeepseekV2MoEGate)."""
    import numpy as np

    from scalellm_tpu.models.deepseek import (
        MLADecoderModel, load_deepseek_v2_model_args,
    )

    base_cfg = {
        "hidden_size": 8, "num_hidden_layers": 2, "num_attention_heads": 1,
        "vocab_size": 32, "kv_lora_rank": 8, "qk_nope_head_dim": 4,
        "qk_rope_head_dim": 4, "v_head_dim": 4,
        "n_routed_experts": 4, "num_experts_per_tok": 2,
        "first_k_dense_replace": 1, "routed_scaling_factor": 2.5,
    }
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    w = rng.standard_normal((8, 4)).astype(np.float32)

    m_norm = MLADecoderModel(load_deepseek_v2_model_args(
        dict(base_cfg, norm_topk_prob=True)))
    tw, _ = m_norm._router(x, w)
    np.testing.assert_allclose(np.asarray(tw).sum(-1), 1.0, rtol=1e-5)

    m_scale = MLADecoderModel(load_deepseek_v2_model_args(
        dict(base_cfg, norm_topk_prob=False)))
    tw2, te2 = m_scale._router(x, w)
    import jax.numpy as jnp
    import jax

    scores = np.asarray(jax.nn.softmax(jnp.dot(x, w), axis=-1))
    picked = np.take_along_axis(scores, np.asarray(te2), axis=-1)
    np.testing.assert_allclose(np.asarray(tw2), picked * 2.5, rtol=1e-5)


def test_stopping_criteria_stop_sequence_hiding():
    from scalellm_tpu.request.output import FinishReason
    from scalellm_tpu.request.stopping import StoppingCriteria

    sc = StoppingCriteria(max_tokens=100, stop_sequences=[[7, 8]])
    reason, hide = sc.check_finished([1, 2, 7, 8], 2)
    assert reason == FinishReason.STOP
    assert hide == 2  # both stop tokens hidden from output


def test_metrics_export_format():
    from scalellm_tpu.utils import metrics

    metrics.reset_all()
    metrics.COUNTERS.inc("test_counter_total", 3)
    metrics.GAUGES.set("test_gauge", 1.5)
    metrics.HISTOGRAMS.observe("time_to_first_token_latency_seconds", 0.003)
    text = metrics.export_prometheus()
    assert "# TYPE test_counter_total counter" in text
    assert "test_counter_total 3.0" in text
    assert "test_gauge 1.5" in text
    assert 'time_to_first_token_latency_seconds_bucket{le="0.005"} 1' in text
    assert "time_to_first_token_latency_seconds_count 1" in text
    metrics.reset_all()


def test_sampling_params_validation():
    from scalellm_tpu.errors import ValidationError
    from scalellm_tpu.sampling.params import SamplingParams

    SamplingParams(max_tokens=1).verify()  # ok
    for bad in (
        dict(max_tokens=0),
        dict(temperature=-1.0),
        dict(top_p=0.0),
        dict(top_k=0),
        dict(frequency_penalty=3.0),
        dict(n=2, best_of=1),
    ):
        with pytest.raises(ValidationError):
            SamplingParams(**bad).verify()


def test_70b_feasibility_memory_math():
    """BASELINE config 5: Llama-3.1-70B INT4 must fit 2 v5e-8 hosts (tp=16)
    with usable KV capacity (benchmarks/feasibility_70b.py)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchmarks"),
    )
    from feasibility_70b import memory_math

    out = memory_math(tp=16)
    assert out["fits"]
    assert out["weights_gb_per_chip"] < 4.0
    assert out["kv_capacity_8k_contexts"] >= 16


def test_model_args_overrides():
    """args_overrider.h parity: dotted-path CLI overrides with type
    coercion; typos fail loudly."""
    import pytest

    from scalellm_tpu.config import ModelArgs, QuantArgs
    from scalellm_tpu.utils.args_override import apply_overrides

    a = ModelArgs(model_type="llama", quant_args=QuantArgs(bits=4))
    applied = apply_overrides(
        a, ["rope_theta=1e6", "n_layers=12", "quant_args.bits=8",
            "tie_word_embeddings=true"]
    )
    assert a.rope_theta == 1e6 and a.n_layers == 12
    assert a.quant_args.bits == 8 and a.tie_word_embeddings is True
    assert len(applied) == 4
    with pytest.raises(ValueError):
        apply_overrides(a, ["not_a_field=3"])
    with pytest.raises(ValueError):
        apply_overrides(a, ["rope_theta"])
