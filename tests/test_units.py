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
