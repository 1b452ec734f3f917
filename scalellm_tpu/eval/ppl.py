"""Perplexity harness: teacher-forced NLL of a checkpoint over a text file.

The BASELINE acceptance criterion for quantized serving is perplexity
parity with the bf16 model at the same bit-width — this is the tool that
measures it. Works on any registered checkpoint; the quantized variants are
produced with the runtime quantizer (quantization/runtime.py) so bf16 and
INT4/INT8 numbers come from the SAME weights.

Scoring is windowed (stride = window): the token stream is cut into
independent windows of `window` tokens and each window is scored with a
single ragged-attention prefill pass (logits at every position). No
cross-window context — standard strided-ppl methodology.

CLI:
  python -m scalellm_tpu.eval.ppl --model <dir> --text <file> \
      [--quantize int4|int8] [--kv-cache-dtype int8] [--calibrate-kv] \
      [--quantize-lm-head int8|int4] [--window 512] [--max-tokens 65536]
prints one JSON line: {"ppl": ..., "nll": ..., "tokens": N, ...}.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import numpy as np


def _window_inputs(T: int, page_size: int):
    import jax.numpy as jnp

    from scalellm_tpu.engine.params import ModelInputs

    n_pages = T // page_size + 1
    return ModelInputs(
        token_ids=jnp.zeros(T, jnp.int32),  # placeholder, replaced per window
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page_size,
        block_tables=jnp.asarray([[i + 1 for i in range(n_pages)]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.arange(T, dtype=jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )


def make_window_scorer(model, params, window: int, page_size: int = 16):
    """Returns scorer(tokens[window], n_valid) -> (sum_nll, n_scored):
    one jitted prefill scoring next-token NLL at positions 0..n_valid-2."""
    import jax
    import jax.numpy as jnp

    a = model.args
    dtype = jnp.bfloat16 if a.dtype in ("bfloat16", "float16") else jnp.float32
    kv_dtype = jnp.int8 if model.kv_quant else dtype
    n_pages = window // page_size + 2
    kv_shape = model.kv_cache_shape(n_pages, page_size)
    base_mi = _window_inputs(window, page_size)

    import dataclasses

    @jax.jit
    def scorer(params, tokens, n_valid):
        mi = dataclasses.replace(base_mi, token_ids=tokens)
        kv = jnp.zeros(kv_shape, kv_dtype)
        hidden, _ = model.forward(params, kv, mi)
        logits = model.logits(params, hidden)  # [T, V]
        logp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32), axis=-1)
        tgt = tokens[1:]
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        mask = (jnp.arange(window - 1) < (n_valid - 1)).astype(jnp.float32)
        return jnp.sum(nll * mask), jnp.sum(mask)

    return lambda tokens, n_valid: scorer(params, tokens, n_valid)


def perplexity(
    model,
    params,
    token_ids: np.ndarray,
    window: int = 512,
    page_size: int = 16,
    progress: bool = False,
) -> Dict[str, Any]:
    """Strided perplexity of `token_ids` under (model, params)."""
    token_ids = np.asarray(token_ids, dtype=np.int32)
    scorer = make_window_scorer(model, params, window, page_size)
    total_nll, total_n = 0.0, 0.0
    for start in range(0, len(token_ids) - 1, window):
        chunk = token_ids[start : start + window]
        n_valid = len(chunk)
        if n_valid < 2:
            break
        if n_valid < window:
            chunk = np.pad(chunk, (0, window - n_valid))
        nll, n = scorer(chunk, n_valid)
        total_nll += float(nll)
        total_n += float(n)
        if progress:
            print(
                f"  scored {start + n_valid}/{len(token_ids)} tokens "
                f"(running ppl {np.exp(total_nll / total_n):.4f})",
                flush=True,
            )
    mean_nll = total_nll / max(total_n, 1.0)
    return {
        "ppl": float(np.exp(mean_nll)),
        "nll": float(mean_nll),
        "tokens": int(total_n),
    }


def load_for_eval(
    model_dir: str,
    quantize: str = "",
    kv_cache_dtype: str = "auto",
    quantize_lm_head: "bool | str" = False,
    calibrate_kv: bool = False,
    calib_tokens: Optional[np.ndarray] = None,
    dtype: str = "",
):
    """Build (model, params) for scoring, applying runtime quantization /
    int8-KV / calibration the same way the serving engine does."""
    from scalellm_tpu.model_loader.loader import HFModelLoader
    from scalellm_tpu.models.registry import ModelRegistry
    from scalellm_tpu.parallel.config import ParallelConfig

    loader = HFModelLoader(model_dir)
    args = loader.model_args
    if dtype:
        args.dtype = dtype
    if kv_cache_dtype != "auto":
        args.kv_cache_dtype = kv_cache_dtype
    factory = ModelRegistry.get_causal_lm_factory(loader.model_type)
    model = factory(args, ParallelConfig())
    params = loader.load_params(model)
    if quantize and not (args.quant_args and args.quant_args.enabled):
        from scalellm_tpu.config import QuantArgs
        from scalellm_tpu.quantization.runtime import quantize_model_params

        qargs = QuantArgs(
            quant_method="internal",
            bits=4 if quantize == "int4" else 8,
            group_size=128,
            quantize_lm_head=quantize_lm_head,
        )
        model, params = quantize_model_params(model, params, qargs)
    if calibrate_kv and model.kv_quant:
        from scalellm_tpu.eval.kv_calibration import calibrate_kv_scales

        assert calib_tokens is not None, "--calibrate-kv needs tokens"
        params["layers"]["kv_scales"] = calibrate_kv_scales(
            model, params, calib_tokens
        )
    return model, params


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--text", required=True, help="UTF-8 text file to score")
    p.add_argument("--quantize", default="", choices=["", "int4", "int8"])
    p.add_argument("--kv-cache-dtype", default="auto", choices=["auto", "int8"])
    p.add_argument("--quantize-lm-head", default="", choices=["", "int8", "int4"])
    p.add_argument("--calibrate-kv", action="store_true")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=65536)
    p.add_argument("--dtype", default="", help="override model dtype")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from scalellm_tpu.tokenizer.tokenizer import load_tokenizer

    tok = load_tokenizer(args.model, None)
    with open(args.text, encoding="utf-8") as f:
        text = f.read()
    ids = np.asarray(tok.encode(text), dtype=np.int32)[: args.max_tokens]

    lm_head = {"": False, "int8": True, "int4": "int4"}[args.quantize_lm_head]
    model, params = load_for_eval(
        args.model,
        quantize=args.quantize,
        kv_cache_dtype=args.kv_cache_dtype,
        quantize_lm_head=lm_head,
        calibrate_kv=args.calibrate_kv,
        calib_tokens=ids[: 4 * args.window],
        dtype=args.dtype,
    )
    result = perplexity(model, params, ids, window=args.window, progress=True)
    result.update(
        model=args.model,
        quantize=args.quantize or "bf16",
        kv_cache_dtype=args.kv_cache_dtype,
        calibrated_kv=bool(args.calibrate_kv),
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
