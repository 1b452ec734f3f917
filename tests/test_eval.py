"""Accuracy-harness tests (BASELINE acceptance: quantized perplexity must
stay within the bit-width's accepted band of the float model).

Runs on a tiny char-LM TRAINED on tests/data/corpus.txt (session-cached) so
perplexity deltas are meaningful — a random model's ppl is flat at ~vocab
and cannot detect quantization damage.
"""

import json
import os

import numpy as np
import pytest

import tests.fixtures as fixtures


@pytest.fixture(scope="module")
def trained_dir():
    return fixtures.trained_tiny_llama_cached()


@pytest.fixture(scope="module")
def corpus_ids():
    p = os.path.join(os.path.dirname(__file__), "data", "corpus.txt")
    with open(p, "rb") as f:
        return np.asarray([min(b, 255) for b in f.read()], np.int32)[:8192]


def _ppl(trained_dir, ids, **kw):
    from scalellm_tpu.eval.ppl import load_for_eval, perplexity

    model, params = load_for_eval(trained_dir, dtype="float32", **kw)
    return perplexity(model, params, ids, window=256)["ppl"]


def test_float_ppl_is_trained(trained_dir, corpus_ids):
    """The fixture must actually have learned the corpus (ppl far below
    the 256-vocab uniform baseline)."""
    assert _ppl(trained_dir, corpus_ids) < 20.0


def test_int8_ppl_parity(trained_dir, corpus_ids):
    base = _ppl(trained_dir, corpus_ids)
    q8 = _ppl(trained_dir, corpus_ids, quantize="int8")
    assert abs(q8 - base) / base < 0.005  # int8 is ~lossless


def test_int4_ppl_band(trained_dir, corpus_ids):
    base = _ppl(trained_dir, corpus_ids)
    q4 = _ppl(trained_dir, corpus_ids, quantize="int4")
    assert (q4 - base) / base < 0.05  # int4 g=128: few-percent band


def test_int8_kv_calibration_beats_default(trained_dir, corpus_ids):
    """Calibrated per-layer KV scales must not be worse than the hardcoded
    global default, and must stay near float-KV ppl."""
    base = _ppl(trained_dir, corpus_ids)
    kv_default = _ppl(trained_dir, corpus_ids, kv_cache_dtype="int8")
    kv_calib = _ppl(
        trained_dir, corpus_ids, kv_cache_dtype="int8",
        calibrate_kv=True, calib_tokens=corpus_ids[:2048],
    )
    assert (kv_calib - base) / base < 0.01
    assert kv_calib <= kv_default * 1.001


def test_kv_scales_sidecar_roundtrip(trained_dir, corpus_ids, tmp_path):
    """kv_calibration CLI writes a sidecar the loader picks up."""
    import shutil

    from scalellm_tpu.eval.kv_calibration import calibrate_kv_scales, main
    from scalellm_tpu.eval.ppl import load_for_eval

    d = str(tmp_path / "model")
    shutil.copytree(trained_dir, d)
    text = str(tmp_path / "calib.txt")
    with open(text, "w") as f:
        f.write("the quick brown fox jumps over the lazy dog. " * 50)
    main(["--model", d, "--text", text, "--max-tokens", "1024",
          "--window", "256", "--cpu"])
    sidecar = os.path.join(d, "kv_scales.json")
    assert os.path.exists(sidecar)
    with open(sidecar) as f:
        data = json.load(f)
    assert len(data["k"]) == 2 and len(data["v"]) == 2  # n_layers

    model, params = load_for_eval(d, dtype="float32", kv_cache_dtype="int8")
    got = np.asarray(params["layers"]["kv_scales"])
    want = np.stack([data["k"], data["v"]], axis=1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
