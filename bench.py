"""Benchmark driver entry: prints ONE JSON line with the headline metric.

Headline: decode tokens/s on a Llama-3.1-8B-shaped INT4 (group-128) model,
batch=1 — BASELINE.json's north-star config, running the fused
dequant+matmul Pallas kernel (ops/quant_matmul.py) and the ragged paged
attention kernel. Weights are random/zero-initialized (no network egress);
decode runs as a device-side lax.scan autoregressive loop (sampled token
feeds back as the next input) so host↔device round-trips don't pollute the
measurement.

Crash isolation (round-4 fix): every preset runs in its OWN subprocess
(``python bench.py --child <preset>``), each metric line is flushed to
stderr the moment it is produced, and each child pre-flight-checks
``resident_bytes + kv_bytes <= HBM budget`` and SKIPS (with a JSON
warning) instead of dying with RESOURCE_EXHAUSTED. A crash in any one
preset, serve run, or spec run can no longer erase the rest of the
round's evidence; the headline JSON prints in a ``finally``.

vs_baseline compares against the HBM-bandwidth roofline for batch-1 decode:
every step must stream all weights from HBM once, so
  roofline tokens/s = HBM_BW / bytes(weights + scales).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Per-preset decode batch sizes measured on TPU (b=1 always first).
PRESET_BATCHES = {
    "tinyllama-1.1b": (1, 8, 32),
    "llama31-8b-int4": (1, 8),
    "deepseek-v2-lite": (1, 8),
    "tiny": (1,),
}
# v5e HBM is 16 GB; leave headroom for XLA scratch + donated-buffer copies.
HBM_BUDGET_BYTES = float(os.environ.get("BENCH_HBM_BYTES", 13.8e9))


def build_model(preset: str):
    from scalellm_tpu.config import ModelArgs
    from scalellm_tpu.models.common import DecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig

    import os as _os
    layers_override = int(_os.environ.get("BENCH_LAYERS", 0))
    if preset == "llama31-8b-int4":
        from scalellm_tpu.config import QuantArgs

        args = ModelArgs(
            model_type="llama",
            dtype="bfloat16",
            hidden_size=4096,
            intermediate_size=14336,
            n_layers=32,
            n_heads=32,
            n_kv_heads=8,
            vocab_size=128256,
            max_position_embeddings=4096,
            rope_theta=500000.0,
            quant_args=QuantArgs(
                quant_method="gptq", bits=4, group_size=128,
                quantize_lm_head=_os.environ.get("BENCH_LM_HEAD", "") or True,
            ),
            # BENCH_KV=int8: quantized KV cache A/B (halves KV bytes; the
            # attention kernel dequantizes per page with kv_scale).
            kv_cache_dtype=_os.environ.get("BENCH_KV", "auto"),
        )
    elif preset == "tinyllama-1.1b":
        args = ModelArgs(
            model_type="llama",
            dtype="bfloat16",
            hidden_size=2048,
            intermediate_size=5632,
            n_layers=22,
            n_heads=32,
            n_kv_heads=4,
            vocab_size=32000,
            max_position_embeddings=2048,
        )
    elif preset == "deepseek-v2-lite":
        # DeepSeek-V2-Lite at FULL depth (27 layers), MLA + MoE with
        # runtime-int4 ROUTED EXPERTS (ops/moe_quant.py, group-128 grids):
        # experts are ~97% of the weights (28.8 GB of the 29.3 GB bf16
        # model), int4 quarters them to 7.2 GB so the whole model fits a
        # 16 GB v5e, and the decode path streams only the ROUTED experts'
        # packed blocks. Exercises the K-only latent cache + the Pallas
        # MLA decode kernel + the routed-expert quant kernel.
        from scalellm_tpu.models.deepseek import (
            MLADecoderModel, load_deepseek_v2_model_args,
        )

        args = load_deepseek_v2_model_args(dict(
            torch_dtype="bfloat16",
            hidden_size=2048,
            intermediate_size=10944,
            num_hidden_layers=layers_override or 27,
            num_attention_heads=16,
            vocab_size=102400,
            max_position_embeddings=4096,
            q_lora_rank=None,
            kv_lora_rank=512,
            qk_nope_head_dim=128,
            qk_rope_head_dim=64,
            v_head_dim=128,
            first_k_dense_replace=1,
            n_routed_experts=64,
            num_experts_per_tok=6,
            moe_intermediate_size=1408,
            n_shared_experts=2,
            norm_topk_prob=False,
        ))
        from scalellm_tpu.config import QuantArgs

        args.quant_args = QuantArgs(quant_method="internal", bits=4,
                                    group_size=128)
        mla_attn = None
        if _os.environ.get("BENCH_SKIP_ATTN"):
            # Identity MLA attention (perf decomposition): output shape
            # [T, H, v_dim] taken straight from the query latents.
            def mla_attn(q, kvc, *a_, v_dim=None, **k_):
                return q[..., :v_dim]
        return MLADecoderModel(args, ParallelConfig(), mla_attn)
    elif preset == "tiny":  # CPU smoke test
        args = ModelArgs(
            model_type="llama",
            dtype="float32",
            hidden_size=128,
            intermediate_size=256,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            vocab_size=256,
            max_position_embeddings=512,
        )
    else:
        raise ValueError(preset)
    if layers_override:
        args.n_layers = layers_override
    attn_impl = None
    if _os.environ.get("BENCH_SKIP_ATTN"):
        # Perf-decomposition mode: identity attention isolates the
        # projection/kernel cost from the attention kernel cost.
        def attn_impl(q, kvc, *a_, **k_):
            return q
    return DecoderModel(args, ParallelConfig(), attn_impl)


def param_bytes(model) -> int:
    """Bytes streamed from HBM per decode step (all weights once)."""
    return _weight_bytes(model, resident=False)


def resident_bytes(model) -> int:
    """Bytes of HBM the parameters occupy (pre-flight memory check)."""
    return _weight_bytes(model, resident=True)


def _weight_bytes(model, resident: bool) -> int:
    import numpy as np

    total = 0
    float_itemsize = 2 if model.args.dtype in ("bfloat16", "float16") else 4

    from scalellm_tpu.ops.quant_matmul import scales_np_dtype

    sc_itemsize = np.dtype(scales_np_dtype()).itemsize

    a = model.args
    # Routed MoE experts: a decode step streams only the top-k (+shared)
    # experts' bytes, not all E — the stream estimate (roofline
    # denominator) must count that fraction or the roofline reads low.
    routed_frac = (
        (a.n_experts_per_token / a.n_experts)
        if getattr(a, "n_experts", 0) and not resident
        else 1.0
    )

    def walk(node, name=""):
        nonlocal total
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, k)
            else:
                itemsize = (
                    1 if k in ("qweight", "zeros")
                    else sc_itemsize if k == "scales"
                    else float_itemsize
                )
                if (
                    not resident
                    and k == "embed_tokens"
                    and not model.args.tie_word_embeddings
                ):
                    # decode reads one embedding row, not the whole table
                    continue
                expert_keys = ("moe_gate", "moe_up", "moe_down")
                frac = (
                    routed_frac
                    if (k in expert_keys or name in expert_keys)
                    else 1.0
                )
                total += int(int(np.prod(v)) * itemsize * frac)

    walk(model.param_shapes())
    return total


def preflight_bytes(model, batch: int, steps: int, ctx: int,
                    page_size: int = 16) -> int:
    """Resident params + KV cache for the bench config, in bytes."""
    import numpy as np

    pages_per_seq = (ctx + 1 + steps + page_size - 1) // page_size + 1
    num_pages = 1 + batch * pages_per_seq
    shape = model.kv_cache_shape(num_pages, page_size)
    kv_itemsize = 2 if model.args.dtype in ("bfloat16", "float16") else 4
    if getattr(model, "kv_quant", False):
        kv_itemsize = 1
    kv = int(np.prod(shape)) * kv_itemsize
    return resident_bytes(model) + kv


def zero_params(model):
    """Zero weights in the exact runtime layout (tokens meaningless, step
    timing identical — quantized values don't affect the memory path)."""
    import jax
    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import scales_np_dtype

    a = model.args

    def zero_leaf(path, shape):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("qweight", "zeros"):
            return jnp.zeros(shape, jnp.int8)
        if name == "scales":
            # Must match the production loader's dtype (bf16 for the
            # internal quantizer): scales dtype selects the kernel's
            # k-tile alignment and halves the scale stream.
            return jnp.zeros(shape, jnp.dtype(scales_np_dtype()))
        if name == "kv_scales":
            return jnp.full(shape, a.kv_scale, jnp.float32)
        dt = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
        return jnp.zeros(shape, dt)

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        model.param_shapes(), is_leaf=lambda x: isinstance(x, tuple)
    )
    return jax.tree_util.tree_unflatten(
        treedef, [zero_leaf(p, sh) for p, sh in paths_leaves]
    )


def run_decode_bench(preset: str, batch: int, steps: int, page_size: int = 16,
                     model=None, ctx: int = 0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scalellm_tpu.engine.params import ModelInputs

    model = model or build_model(preset)
    a = model.args

    if os.environ.get("BENCH_FAST_INIT") or preset in (
        "llama31-8b-int4", "deepseek-v2-lite",
    ):
        # 8B random init costs minutes over the tunnel; zero weights time
        # identically (quantized values don't affect the memory path).
        # Zero weights: tokens are meaningless but per-step timing identical.
        params = zero_params(model)
    else:
        key = jax.random.PRNGKey(0)
        params = model.init_params(key)

    # One sequence per batch lane, each with a 128-token prefilled context
    # (BENCH_CTX / the ctx arg override for KV-depth sweeps).
    ctx = ctx or int(os.environ.get("BENCH_CTX", 0)) or 128
    pages_per_seq = (ctx + 1 + steps + page_size - 1) // page_size + 1
    num_pages = 1 + batch * pages_per_seq  # page 0 reserved
    shape = model.kv_cache_shape(num_pages, page_size)
    dtype = jnp.bfloat16 if a.dtype == "bfloat16" else jnp.float32
    if getattr(model, "kv_quant", False):
        dtype = jnp.int8  # int8 KV cache (kv_cache_dtype="int8")
    kv_cache = jnp.zeros(shape, dtype)

    block_tables = np.zeros((batch, pages_per_seq), np.int32)
    for s in range(batch):
        block_tables[s] = 1 + s * pages_per_seq + np.arange(pages_per_seq)
    block_tables = jnp.asarray(block_tables)
    base_slot = jnp.asarray(
        [(1 + s * pages_per_seq) * page_size for s in range(batch)], jnp.int32
    )

    def decode_steps(params, kv_cache, tokens0):
        """Autoregressive device loop: each iteration decodes one token per
        sequence through the paged KV cache and feeds it back."""

        def step(carry, i):
            kv_cache, tokens = carry
            pos = ctx + i
            mi = ModelInputs(
                token_ids=tokens,
                positions=jnp.full((batch,), pos, jnp.int32),
                token_seg=jnp.arange(batch, dtype=jnp.int32),
                new_kv_slot_ids=base_slot + pos,
                block_tables=block_tables,
                kv_lens=jnp.full((batch,), pos + 1, jnp.int32),
                cu_q_lens=jnp.arange(batch + 1, dtype=jnp.int32),
                num_seqs=jnp.asarray([batch], jnp.int32),
                selected_idxes=jnp.arange(batch, dtype=jnp.int32),
                seq_mask=jnp.ones((batch,), jnp.float32),
            )
            hidden, kv_cache = model.forward(
                params, kv_cache, mi, decode_only=True
            )
            if "logits" in os.environ.get("BENCH_ABLATE", ""):
                # Fixed-cost decomposition: skip lm_head+argmax entirely
                # (tokens become constant — timing diagnostic only).
                next_tokens = tokens + hidden[0, :1].astype(jnp.int32) * 0
            else:
                logits = model.logits(params, hidden)
                next_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (kv_cache, next_tokens), next_tokens

        (kv_cache, _), out = jax.lax.scan(
            step, (kv_cache, tokens0), jnp.arange(steps)
        )
        return out, kv_cache

    fn = jax.jit(decode_steps, donate_argnums=(1,))
    tokens0 = jnp.zeros((batch,), jnp.int32)

    # Warmup / compile.
    out, kv_cache = fn(params, kv_cache, tokens0)
    jax.block_until_ready(out)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out, kv_cache = fn(params, kv_cache, tokens0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_tokens = reps * steps * batch
    toks_per_s = total_tokens / dt
    return toks_per_s, model


def run_prefill_bench(preset: str, T: int = 2048, page_size: int = 16):
    """Prefill tokens/s at context length T (TTFT proxy): one ragged-
    attention prefill pass over a T-token prompt."""
    import jax
    import jax.numpy as jnp

    from scalellm_tpu.engine.params import ModelInputs

    model = build_model(preset)
    if os.environ.get("BENCH_FAST_INIT") or preset in (
        "llama31-8b-int4", "deepseek-v2-lite",
    ):
        params = zero_params(model)
    else:
        key = jax.random.PRNGKey(0)
        params = model.init_params(key)
    n_pages = T // page_size + 2
    kv_cache = jnp.zeros(
        model.kv_cache_shape(n_pages, page_size),
        jnp.bfloat16 if model.args.dtype == "bfloat16" else jnp.float32,
    )
    mi = ModelInputs(
        token_ids=jnp.zeros(T, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        token_seg=jnp.zeros(T, jnp.int32),
        new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32) + page_size,
        block_tables=jnp.asarray([[i + 1 for i in range(T // page_size + 1)]], jnp.int32),
        kv_lens=jnp.asarray([T], jnp.int32),
        cu_q_lens=jnp.asarray([0, T], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
        selected_idxes=jnp.asarray([T - 1], jnp.int32),
        seq_mask=jnp.ones(1, jnp.float32),
    )

    @jax.jit
    def prefill(params, kv_cache, mi):
        hidden, new_kv = model.forward(params, kv_cache, mi)
        return model.logits(params, hidden), new_kv

    logits, kv_cache = prefill(params, kv_cache, mi)
    jax.block_until_ready(logits)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        logits, kv_cache = prefill(params, kv_cache, mi)
    jax.block_until_ready(logits)
    dt = (time.perf_counter() - t0) / reps
    return T / dt, dt


def _emit(obj) -> None:
    """One metric JSON line, flushed immediately (crash-survivable)."""
    print(json.dumps(obj), flush=True)


def _honor_platform_env():
    """sitecustomize force-registers the axon TPU plugin programmatically;
    the JAX_PLATFORMS env var alone does NOT select CPU (CLAUDE.md) — it
    must be applied via jax.config."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def child_main(preset: str) -> None:
    """Run every measurement for ONE preset; each metric is a flushed
    JSON line on stdout. Pre-flight memory math skips configs that cannot
    fit the chip instead of dying with RESOURCE_EXHAUSTED."""
    import jax

    _honor_platform_env()

    from scalellm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.devices()[0].platform == "tpu"
    steps = 64 if on_tpu else 8
    ctx = int(os.environ.get("BENCH_CTX", 0)) or 128

    batches = PRESET_BATCHES.get(preset, (1,))
    if os.environ.get("BENCH_QUICK"):
        batches = batches[:1]  # b=1 only (kernel sweeps)

    model = build_model(preset)
    need = preflight_bytes(model, max(batches), steps, ctx)
    if on_tpu and need > HBM_BUDGET_BYTES:
        biggest = max(
            (b for b in batches
             if preflight_bytes(model, b, steps, ctx) <= HBM_BUDGET_BYTES),
            default=0,
        )
        if not biggest:
            _emit({
                "metric": f"decode_tokens_per_s_{preset}",
                "skipped": "preflight: "
                           f"{need / 1e9:.1f} GB > {HBM_BUDGET_BYTES / 1e9:.1f} GB budget",
            })
            return
        batches = tuple(b for b in batches if b <= biggest)
        _emit({
            "metric": f"decode_tokens_per_s_{preset}",
            "warning": f"preflight trimmed batches to {batches} "
                       f"({need / 1e9:.1f} GB over budget at b={max(PRESET_BATCHES[preset])})",
        })

    b1_value = None
    for batch in batches:
        toks_per_s, model = run_decode_bench(preset, batch, steps, model=model)
        result = {
            "metric": f"decode_tokens_per_s_{preset}_b{batch}",
            "value": round(toks_per_s, 2),
            "unit": "tokens/s",
        }
        if batch == 1:
            b1_value = toks_per_s
            hbm_bw = 819e9 if on_tpu else 50e9
            result["vs_baseline"] = round(
                toks_per_s / (hbm_bw / param_bytes(model)), 4
            )
            if on_tpu:
                # vs the MEASURED sustained HBM read (~700 GB/s,
                # DMA_CEILING.md) — the spec 819 GB/s is not sustainable;
                # vs_baseline keeps the spec denominator for continuity.
                result["vs_machine_ceiling"] = round(
                    toks_per_s / (700e9 / param_bytes(model)), 4
                )
        if preset == "deepseek-v2-lite":
            result["layers"] = model.args.n_layers
        _emit(result)

    if (preset == "llama31-8b-int4" and on_tpu and b1_value
            and os.environ.get("BENCH_DMA_PROBE", "1") != "0"):
        # Machine-ceiling probe (DMA_CEILING.md): the same stream kernel
        # with its compute body removed — same tiles, same DMAs, zero
        # matmuls. headline/ceiling says how much of the MACHINE's
        # sustained bandwidth the production kernel captures; vs_baseline
        # stays pinned to the 819 GB/s spec roofline for continuity.
        os.environ["QUANT_STREAM_ONLY"] = "1"
        try:
            ceil_tps, _ = run_decode_bench(preset, 1, steps, model=model)
            _emit({
                "metric": f"dma_ceiling_tokens_per_s_{preset}_b1",
                "value": round(ceil_tps, 2),
                "unit": "tokens/s",
                "headline_fraction_of_ceiling": round(b1_value / ceil_tps, 4),
                "note": "stream-only probe: structural ceiling at the "
                        "machine's measured ~700 GB/s sustained HBM read "
                        "(DMA_CEILING.md; 819 GB/s spec is not sustainable)",
            })
        except Exception as e:
            _emit({"metric": f"dma_ceiling_{preset}", "error": str(e)})
        finally:
            os.environ.pop("QUANT_STREAM_ONLY", None)

    if preset == "tinyllama-1.1b" and not os.environ.get("BENCH_QUICK"):
        pre_tps, pre_dt = run_prefill_bench(preset)
        _emit({
            "metric": f"prefill_tokens_per_s_{preset}_T2048",
            "value": round(pre_tps, 1),
            "unit": "tokens/s",
            "ttft_s": round(pre_dt, 4),
        })

    if preset == "llama31-8b-int4" and not os.environ.get("BENCH_QUICK"):
        # Long context (VERDICT r4 weak #8): decode b=1 at deep KV +
        # prefill TTFT at T=8k; regression-guards the round-3 attention
        # VMEM fix. Then the int8-KV A/B at the same depth (VERDICT #7):
        # halved KV bytes should show exactly where KV reads matter.
        for lc in (8192, 16384):
            if preflight_bytes(model, 1, steps, lc) > HBM_BUDGET_BYTES:
                _emit({"metric": f"decode_tokens_per_s_{preset}_b1_ctx{lc}",
                       "skipped": "preflight over HBM budget"})
                continue
            tps, model = run_decode_bench(preset, 1, steps, model=model,
                                          ctx=lc)
            _emit({
                "metric": f"decode_tokens_per_s_{preset}_b1_ctx{lc}",
                "value": round(tps, 2),
                "unit": "tokens/s",
            })
        try:
            pre_tps, pre_dt = run_prefill_bench(preset, T=8192)
            _emit({
                "metric": f"prefill_tokens_per_s_{preset}_T8192",
                "value": round(pre_tps, 1),
                "unit": "tokens/s",
                "ttft_s": round(pre_dt, 4),
            })
        except Exception as e:
            _emit({"metric": f"prefill_{preset}_T8192", "error": str(e)})
        os.environ["BENCH_KV"] = "int8"
        try:
            kv_model = build_model(preset)
            for lc in (128, 8192):
                tps, kv_model = run_decode_bench(
                    preset, 1, steps, model=kv_model, ctx=lc
                )
                _emit({
                    "metric": f"decode_tokens_per_s_{preset}-kvint8_b1_ctx{lc}",
                    "value": round(tps, 2),
                    "unit": "tokens/s",
                })
        except Exception as e:
            _emit({"metric": f"decode_{preset}-kvint8", "error": str(e)})
        finally:
            os.environ.pop("BENCH_KV", None)


def _run_child(preset: str, timeout_s: int = 2700) -> list:
    """Run one preset in a subprocess; echo its metric lines to stderr as
    soon as it exits; NEVER raise (a dead preset costs only itself)."""
    lines = []
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", preset],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            lines.append(d)
            print(json.dumps(d), file=sys.stderr, flush=True)
        if out.returncode != 0:
            errlines = [l for l in out.stderr.splitlines() if l.strip()]
            tail = "\n".join(errlines[-6:])
            print(
                json.dumps({"metric": f"preset_{preset}",
                            "error": f"rc={out.returncode}", "tail": tail}),
                file=sys.stderr, flush=True,
            )
    except Exception as e:  # timeout etc. — keep going
        print(
            json.dumps({"metric": f"preset_{preset}", "error": str(e)}),
            file=sys.stderr, flush=True,
        )
    return lines


def _serve_section(repo: str) -> None:
    """ShareGPT-style mixed prefill/decode serving (BASELINE config 3):
    steady-state continuous batching with prefix-cache reuse, each run in
    a subprocess (own engine + TPU client)."""

    def serve_once(preset, n_req, extra):
        # 8B's first serve pass cold-compiles the whole bucket ladder over
        # the remote-compile tunnel (measured: >2400s uncached); completed
        # compiles persist in the atomic on-disk cache, so a generous
        # timeout lets one slow first run amortize all later ones.
        timeout_s = int(os.environ.get("BENCH_SERVE_TIMEOUT", 4200))
        for attempt in (1, 2):
            try:
                out = subprocess.run(
                    [
                        sys.executable, "benchmarks/serve_bench.py",
                        "--preset", preset, "--num-requests", str(n_req),
                        "--mean-prompt", "128", "--mean-output", "64",
                        "--json-only", *extra,
                    ],
                    capture_output=True, text=True, timeout=timeout_s,
                    cwd=repo,
                    # Dump thread stacks + exit shortly before the
                    # timeout: tunnel stalls park every thread on a
                    # futex and would otherwise die silently.
                    env={**os.environ,
                         "SERVE_BENCH_WATCHDOG": str(timeout_s - 300)},
                )
                break
            except subprocess.TimeoutExpired:
                # Cold bucket-ladder compiles can outlast the budget;
                # every finished compile persisted to the atomic disk
                # cache, so a retry resumes from warm and usually
                # completes (8B first-run behavior over the tunnel).
                if attempt == 2:
                    raise
        return json.loads(out.stdout.strip().splitlines()[-1])

    def serve_run(preset, n_req, extra=(), tag=""):
        """Repeat each serve config ≥3× and report the MEDIAN-throughput
        run plus min/max spread (VERDICT r4 weak #4: single-shot serve
        numbers over the tunnel swung up to 72% run-to-run; one run
        cannot adjudicate a 20% A/B effect)."""
        reps = int(os.environ.get("BENCH_SERVE_REPS", 3))
        runs = []
        for i in range(reps):
            try:
                runs.append(serve_once(preset, n_req, extra))
            except Exception as e:  # auxiliary — never fail the round
                print(
                    json.dumps({"metric": f"serve_mixed_{preset}{tag}",
                                "rep": i, "error": str(e)}),
                    file=sys.stderr, flush=True,
                )
        if not runs:
            return None
        runs.sort(key=lambda r: r["output_tokens_per_s"])
        med = runs[len(runs) // 2]
        vals = [r["output_tokens_per_s"] for r in runs]
        line = {
            "metric": f"serve_mixed_output_tokens_per_s_{preset}{tag}",
            "value": med["output_tokens_per_s"],
            "unit": "tokens/s",
            "n_runs": len(runs),
            "spread": round((vals[-1] - vals[0]) / max(vals[len(vals) // 2], 1e-9), 3),
            "runs": vals,
            "p50_ttft_s": med["p50_ttft_s"],
            "p95_ttft_s": med["p95_ttft_s"],
            "p50_itl_s": med["p50_itl_s"],
            "mid_serve_compiles": med["mid_serve_compiles"],
            "engine_steps": med.get("engine_steps"),
        }
        if "multi_step_fraction" in med:
            line["multi_step_fraction"] = med["multi_step_fraction"]
        print(json.dumps(line), file=sys.stderr, flush=True)
        return med

    serve_run("tinyllama-1.1b", 48)
    # Multi-step decode (num_decode_steps=4): N micro-steps per
    # dispatch — one host round trip / batch prep per 4 tokens.
    serve_run(
        "tinyllama-1.1b", 48,
        extra=("--num-decode-steps", "4"), tag="_ms4",
    )
    # Prompt-lookup (n-gram) speculation on the prefix-shared serve mix
    # (VERDICT r4 stretch #9: draft-free speculation, never serve-benched).
    serve_run(
        "tinyllama-1.1b", 48,
        extra=("--num-speculative-tokens", "4"), tag="_ngram",
    )
    # BASELINE config 3: 8B-INT4 + prefix cache + chunked prefill,
    # plus the multi-step and async-pipelined-scheduler A/Bs. The batch
    # envelope is capped (tokens 256 / seqs 32) — a legitimate serving
    # config that halves the bucket-ladder surface: each distinct 8B
    # bucket costs ~75s of remote compile on a cold cache.
    cap = ("--max-tokens-per-batch", "256", "--max-seqs-per-batch", "32")
    n8b = int(os.environ.get("BENCH_SERVE_NREQ_8B", 64))
    serve_run("llama31-8b-int4", n8b, extra=cap)
    serve_run(
        "llama31-8b-int4", n8b,
        extra=cap + ("--num-decode-steps", "4"), tag="_ms4",
    )
    serve_run(
        "llama31-8b-int4", n8b,
        extra=cap + ("--disable-async-scheduling",), tag="_sync",
    )
    # BASELINE config 4 honesty: trained target + weaker trained draft
    # => real acceptance rate (benchmarks/spec_bench.py --trained).
    def spec_json(extra):
        out = subprocess.run(
            [sys.executable, "benchmarks/spec_bench.py", *extra],
            capture_output=True, text=True, timeout=3600, cwd=repo,
        )
        line = out.stdout.strip().splitlines()[-1]
        print(line, file=sys.stderr, flush=True)
        return json.loads(line)

    trained = gem = None
    try:
        trained = spec_json(["--trained"])
    except Exception as e:
        print(json.dumps({"metric": "spec_decode_trained", "error": str(e)}),
              file=sys.stderr, flush=True)
    # BASELINE config 4 at its REAL shape (VERDICT r4 #3): Gemma2-9B-INT8
    # target + 2B draft, zero weights => the full-acceptance machinery
    # BOUND; × the trained-fixture acceptance rate => an honest projected
    # speedup at a realistic draft:target cost ratio.
    try:
        gem = spec_json([])  # default --target gemma2-9b-int8
    except Exception as e:
        print(json.dumps(
            {"metric": "spec_decode_gemma2-9b-int8", "error": str(e)}),
            file=sys.stderr, flush=True)
    if gem and gem.get("value") and trained and trained.get("acceptance_rate"):
        k = 4
        alpha = trained["acceptance_rate"]
        # E[accepted tokens/round] at per-token acceptance alpha
        # (leading-match + bonus): (1 - a^(k+1)) / (1 - a).
        exp_acc = (1 - alpha ** (k + 1)) / (1 - alpha)
        # Prefer the device-side pair (no tunnel RTT) when available.
        bound_tps = gem.get("device_bound_tokens_per_s") or gem["value"]
        proj = bound_tps * exp_acc / (k + 1)
        plain = (gem.get("device_plain_tokens_per_s")
                 or gem.get("plain_tokens_per_s") or 1e-9)
        print(json.dumps({
            "metric": "spec_decode_projected_tokens_per_s_gemma2-9b-int8",
            "value": round(proj, 1),
            "unit": "tokens/s",
            "bound_tokens_per_s": gem["value"],
            "plain_tokens_per_s": gem.get("plain_tokens_per_s"),
            "speedup_bound": gem.get("speedup_at_full_acceptance"),
            "speedup_projected": round(proj / plain, 2),
            "acceptance_rate_trained_fixture": alpha,
            "note": "bound measured at the real 9B-int8/2B shape on TPU; "
                    "projection scales it by the trained-fixture "
                    "acceptance (egress-blocked: no real checkpoints)",
        }), file=sys.stderr, flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child_main(sys.argv[2])
        return

    import jax

    _honor_platform_env()
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    presets = (
        ["tinyllama-1.1b", "llama31-8b-int4", "deepseek-v2-lite"]
        if on_tpu
        else ["tiny"]
    )
    if os.environ.get("BENCH_PRESETS"):
        presets = os.environ["BENCH_PRESETS"].split(",")

    headline = None
    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        for preset in presets:
            for d in _run_child(preset):
                m = d.get("metric", "")
                is_b1 = (m.startswith("decode_tokens_per_s")
                         and m.endswith("_b1") and "value" in d)
                if is_b1 and (headline is None
                              or preset == "llama31-8b-int4"):
                    headline = d
                    # Early flush: if the driver kills this process during
                    # the (long) serve section, the last stdout line is
                    # still a parseable headline. Printed again in finally;
                    # the final line wins.
                    print(json.dumps(headline), flush=True)
        if on_tpu and os.environ.get("BENCH_SERVE", "1") != "0":
            _serve_section(repo)
    finally:
        # The headline must survive anything above dying mid-flight.
        print(json.dumps(
            headline
            if headline is not None
            else {"metric": "decode_tokens_per_s", "error": "no preset ran"}
        ), flush=True)
    if headline is None:
        sys.exit(1)


if __name__ == "__main__":
    main()
