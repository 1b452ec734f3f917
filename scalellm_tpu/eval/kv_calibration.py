"""int8 KV-cache scale calibration.

Replaces the hardcoded global `ModelArgs.kv_scale` with per-layer
[k_scale, v_scale] measured on calibration text. The trick: run a
float-KV twin of the model over the calibration windows and read the
K/V values straight out of the paged KV cache it wrote — no hooks or
per-layer instrumentation needed (the cache IS the activation record).

scales = amax / 127 guarantees no clipping at int8.

CLI:
  python -m scalellm_tpu.eval.kv_calibration --model <dir> --text <file> \
      [--out <dir>/kv_scales.json] [--window 512] [--max-tokens 4096]
writes a sidecar kv_scales.json that HFModelLoader picks up automatically
when serving with kv_cache_dtype=int8.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Optional

import numpy as np


def calibrate_kv_scales(
    model,
    params,
    token_ids: np.ndarray,
    window: int = 512,
    page_size: int = 16,
) -> np.ndarray:
    """Per-layer [L, 2] float32 scales ([k_scale, v_scale]) from running a
    float-KV twin of `model` over `token_ids` in windows."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from scalellm_tpu.eval.ppl import _window_inputs

    args = copy.copy(model.args)
    args.kv_cache_dtype = "auto"
    twin = type(model)(args, model.parallel, model.attn_impl)
    tparams = dict(params)
    tparams["layers"] = {
        k: v for k, v in params["layers"].items() if k != "kv_scales"
    }

    a = twin.args
    dtype = jnp.bfloat16 if a.dtype in ("bfloat16", "float16") else jnp.float32
    n_pages = window // page_size + 2
    kv_shape = twin.kv_cache_shape(n_pages, page_size)
    base_mi = _window_inputs(window, page_size)

    @jax.jit
    def kv_amax(params, tokens):
        mi = dataclasses.replace(base_mi, token_ids=tokens)
        kv = jnp.zeros(kv_shape, dtype)
        _, kv = twin.forward(params, kv, mi)
        # kv: [L, P, page, 2*Hkv, Dh], K even / V odd on the head dim.
        # Unwritten slots stay 0 and cannot raise the amax.
        k_amax = jnp.max(jnp.abs(kv[:, :, :, 0::2, :].astype(jnp.float32)),
                         axis=(1, 2, 3, 4))
        v_amax = jnp.max(jnp.abs(kv[:, :, :, 1::2, :].astype(jnp.float32)),
                         axis=(1, 2, 3, 4))
        return k_amax, v_amax

    token_ids = np.asarray(token_ids, dtype=np.int32)
    L = a.n_layers
    k_max = np.zeros(L, np.float32)
    v_max = np.zeros(L, np.float32)
    for start in range(0, max(len(token_ids) - 1, 1), window):
        chunk = token_ids[start : start + window]
        if len(chunk) < 2:
            break
        if len(chunk) < window:
            chunk = np.pad(chunk, (0, window - len(chunk)))
        k_a, v_a = kv_amax(tparams, jnp.asarray(chunk))
        k_max = np.maximum(k_max, np.asarray(k_a))
        v_max = np.maximum(v_max, np.asarray(v_a))

    eps = 1e-6
    scales = np.stack([k_max, v_max], axis=1) / 127.0
    return np.maximum(scales, eps).astype(np.float32)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="", help="default: <model>/kv_scales.json")
    p.add_argument("--window", type=int, default=512)
    p.add_argument("--max-tokens", type=int, default=4096)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from scalellm_tpu.eval.ppl import load_for_eval
    from scalellm_tpu.tokenizer.tokenizer import load_tokenizer

    tok = load_tokenizer(args.model, None)
    with open(args.text, encoding="utf-8") as f:
        ids = np.asarray(tok.encode(f.read()), dtype=np.int32)[: args.max_tokens]

    model, params = load_for_eval(args.model, kv_cache_dtype="int8")
    scales = calibrate_kv_scales(model, params, ids, window=args.window)
    out = args.out or os.path.join(args.model, "kv_scales.json")
    with open(out, "w") as f:
        json.dump(
            {"k": scales[:, 0].tolist(), "v": scales[:, 1].tolist()}, f
        )
    print(json.dumps({"out": out, "k_mean": float(scales[:, 0].mean()),
                      "v_mean": float(scales[:, 1].mean())}))


if __name__ == "__main__":
    main()
