"""Quantized-accuracy harness driver: produces the ACCURACY_r*.json
artifact (BASELINE quantized-accuracy criterion).

Scores trained fixtures (egress-blocked environment: real checkpoints are
unavailable; the harness works on any registered checkpoint via
scalellm_tpu.eval.ppl) across the quantization matrix:

- char-llama: float32 / int8 / int4 / int4+quant-lm_head / calibrated
  int8-KV (the round-3 matrix, re-validated against the current kernels —
  including the fused RMSNorm prologue).
- char-mixtral (NEW round 4): float32 / int8 experts / int4-g128 experts
  (ops/moe_quant.py — the reference has no quantized-MoE path at all).

Usage: python benchmarks/accuracy_eval.py [--out ACCURACY_r04.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(model_dir, ids, window=256, **kw):
    from scalellm_tpu.eval.ppl import load_for_eval, perplexity

    model, params = load_for_eval(model_dir, calib_tokens=ids[: 4 * window],
                                  **kw)
    return perplexity(model, params, ids, window=window)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACCURACY_r04.json")
    ap.add_argument("--max-tokens", type=int, default=16384)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tests.fixtures import (
        trained_tiny_llama_cached, trained_tiny_mixtral_cached,
    )
    from scalellm_tpu.tokenizer.tokenizer import load_tokenizer

    corpus = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                          "corpus.txt")
    with open(corpus, encoding="utf-8") as f:
        text = f.read()

    results = {}

    llama = trained_tiny_llama_cached()
    tok = load_tokenizer(llama, None)
    ids = np.asarray(tok.encode(text), dtype=np.int32)[: args.max_tokens]

    def rec(name, r, base=None):
        d = {"ppl": round(r["ppl"], 5), "tokens": r["tokens"]}
        if base is not None:
            d["delta_pct"] = round((r["ppl"] / base - 1) * 100, 4)
        results[name] = d
        print(name, d, flush=True)
        return r["ppl"]

    base = rec("float32", run_variant(llama, ids))
    rec("int8", run_variant(llama, ids, quantize="int8"), base)
    rec("int4", run_variant(llama, ids, quantize="int4"), base)
    rec("int4_lm_head_int4",
        run_variant(llama, ids, quantize="int4", quantize_lm_head="int4"),
        base)
    rec("int8_kv_calibrated",
        run_variant(llama, ids, kv_cache_dtype="int8", calibrate_kv=True),
        base)

    mixtral = trained_tiny_mixtral_cached()
    mbase = rec("moe_float32", run_variant(mixtral, ids))
    rec("moe_int8_experts", run_variant(mixtral, ids, quantize="int8"),
        mbase)
    rec("moe_int4_experts", run_variant(mixtral, ids, quantize="int4"),
        mbase)

    # DeepSeek matrix (round 5): MLA + routed/shared experts + dense layer
    # + attention projections + lm_head all quantized — covers the
    # sub-128 group grids _pick_group selects for awkward K dims.
    from tests.fixtures import trained_tiny_deepseek_cached

    ds = trained_tiny_deepseek_cached()
    dbase = rec("deepseek_float32", run_variant(ds, ids))
    rec("deepseek_int8_full", run_variant(ds, ids, quantize="int8"), dbase)
    rec("deepseek_int4_full", run_variant(ds, ids, quantize="int4"), dbase)

    out = {
        "harness": "benchmarks/accuracy_eval.py -> scalellm_tpu.eval.ppl "
                   "(strided window=256)",
        "model": "tiny char-llama + char-mixtral (4 experts, top-2) TRAINED "
                 "on tests/data/corpus.txt (no network egress; harness works "
                 "on any registered checkpoint via the CLI)",
        "corpus": f"tests/data/corpus.txt[:{args.max_tokens}]",
        "acceptance": "int8 |d|<0.5%, int4 d<5%, int8-KV d<1%, "
                      "int8 experts |d|<1%, int4-g128 experts d<5%",
        "results": results,
        "notes": "moe_int8/int4_experts quantize the routed experts via "
                 "ops/moe_quant.py (plus the dense projections via the "
                 "standard runtime path) — the reference has no "
                 "quantized-MoE path to compare against.",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
