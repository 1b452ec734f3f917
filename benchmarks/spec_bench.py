"""Speculative decoding benchmark (BASELINE config 4: Gemma2-9B INT8
verify + small draft).

Runs the fused speculative round (speculative/spec_executor.py — k draft
steps + target verify + rejection sampling in ONE jitted program) against
plain decode on the same target, via the public LLM API on synthetic
config-only checkpoints (zero weights, SCALELLM_FAKE_LOAD=zero).

With zero weights every draft token is accepted (draft argmax == target
argmax), so the speculative number is the FULL-ACCEPTANCE upper bound of
the machinery; real-model speedup = this bound scaled by the actual
acceptance rate. Plain decode timing is exact either way.

  python benchmarks/spec_bench.py [--k 4] [--steps 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(model_dir, draft_dir, k, steps, num_blocks=256, prompt=None):
    from scalellm_tpu import LLM, SamplingParams
    from scalellm_tpu.utils.metrics import COUNTERS

    llm = LLM(
        model_dir,
        draft_model=draft_dir,
        num_speculative_tokens=k,
        block_size=16,
        num_blocks=num_blocks,
        enable_cuda_graph=False,
    ) if draft_dir else LLM(
        model_dir, block_size=16, num_blocks=num_blocks, enable_cuda_graph=False
    )
    sp = SamplingParams(max_tokens=steps, temperature=0.0, ignore_eos=True)
    prompt = prompt or "the quick brown fox jumps over the lazy dog and keeps running"
    llm.generate([prompt], sp)  # warm / compile
    a0 = COUNTERS.get("num_accepted_tokens_total") or 0
    d0 = COUNTERS.get("num_draft_tokens_total") or 0
    t0 = time.monotonic()
    out = llm.generate([prompt + " again"], sp)[0]
    dt = time.monotonic() - t0
    n = out.usage.num_generated_tokens if out.usage else steps
    acc = (COUNTERS.get("num_accepted_tokens_total") or 0) - a0
    drf = (COUNTERS.get("num_draft_tokens_total") or 0) - d0
    llm.close()  # actually free device buffers (9B + draft share one chip)
    del llm
    rate = acc / drf if drf else None
    return n / dt, rate


def run_device_bound(tdir, ddir, k, rounds, num_blocks):
    """Full-acceptance machinery bound with the host loop OUT of the
    measurement: dispatch fused spec rounds back-to-back without fetching
    per-round results (full-acceptance bookkeeping precomputed on host).
    On the dev tunnel the LLM-API path is ~60 ms/step of pure RTT, which
    buries the device cost this bound is supposed to measure; production
    serving has ~none of that latency."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scalellm_tpu import LLM
    from scalellm_tpu.engine.params import SamplingInputs
    from scalellm_tpu.speculative.spec_executor import SpecInputs

    llm = LLM(tdir, draft_model=ddir, num_speculative_tokens=k,
              block_size=16, num_blocks=num_blocks, enable_cuda_graph=False)
    se = llm._handler.engine.spec_executor
    S, page = 1, 16
    maxp = num_blocks - 2
    bt = np.zeros((S, maxp), np.int32)
    bt[0] = np.arange(1, maxp + 1)
    si = SamplingInputs(
        temperatures=np.zeros(S, np.float32),
        top_ks=np.zeros(S, np.int32),
        top_ps=np.ones(S, np.float32),
        frequency_penalties=np.zeros(S, np.float32),
        presence_penalties=np.zeros(S, np.float32),
        repetition_penalties=np.ones(S, np.float32),
        unique_token_ids=np.zeros((S, 1), np.int32),
        unique_token_counts=np.zeros((S, 1), np.int32),
        bias_token_ids=np.zeros((S, 1), np.int32),
        bias_values=np.zeros((S, 1), np.float32),
        allowed_mask=np.full((S, 1), 0xFFFFFFFF, np.uint32),
        seeds=np.zeros(S, np.uint32),
    )

    def mk_inp(p0):
        return SpecInputs(
            first_tokens=np.zeros(S, np.int32),
            positions0=np.full(S, p0, np.int32),
            slot_ids=(page + p0 + np.arange(k + 1, dtype=np.int32))[None, :],
            block_tables=bt,
            seq_mask=np.ones(S, np.float32),
            num_seqs=np.array([1], np.int32),
            do_sample=np.zeros(S, bool),
            seeds=np.zeros(S, np.uint32),
        )

    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    si_dev = dev(si)
    fn = se._spec_fn
    t_kv, d_kv = se.target.kv_cache, se.draft.kv_cache
    acc, _, t_kv, d_kv = fn(se.target.params, se.draft.params, t_kv, d_kv,
                            dev(mk_inp(0)), si_dev)  # warm/compile
    np.asarray(acc)
    p0 = k + 1
    t0 = time.perf_counter()
    for _ in range(rounds):
        acc, _, t_kv, d_kv = fn(se.target.params, se.draft.params,
                                t_kv, d_kv, dev(mk_inp(p0)), si_dev)
        p0 += k + 1
    np.asarray(acc)
    dt = time.perf_counter() - t0
    se.target.kv_cache, se.draft.kv_cache = t_kv, d_kv
    llm.close()
    return rounds * (k + 1) / dt, dt / rounds


def run_plain_device_bound(tdir, steps, num_blocks):
    """Device-side plain-decode bound for the SAME target (fair
    denominator for the spec device bound: dispatches back-to-back, no
    per-step fetches)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scalellm_tpu import LLM
    from scalellm_tpu.engine.params import ModelInputs, SamplingInputs

    llm = LLM(tdir, block_size=16, num_blocks=num_blocks,
              enable_cuda_graph=False)
    ex = llm._handler.engine.executor
    step = ex._build_step_fn(decode_only=True)
    S, page = 1, 16
    maxp = num_blocks - 2
    bt = np.zeros((S, maxp), np.int32)
    bt[0] = np.arange(1, maxp + 1)
    si = SamplingInputs(
        temperatures=np.zeros(S, np.float32),
        top_ks=np.zeros(S, np.int32),
        top_ps=np.ones(S, np.float32),
        frequency_penalties=np.zeros(S, np.float32),
        presence_penalties=np.zeros(S, np.float32),
        repetition_penalties=np.ones(S, np.float32),
        unique_token_ids=np.zeros((S, 1), np.int32),
        unique_token_counts=np.zeros((S, 1), np.int32),
        bias_token_ids=np.zeros((S, 1), np.int32),
        bias_values=np.zeros((S, 1), np.float32),
        allowed_mask=np.full((S, 1), 0xFFFFFFFF, np.uint32),
        seeds=np.zeros(S, np.uint32),
    )

    def mk_mi(pos):
        return ModelInputs(
            token_ids=np.zeros(S, np.int32),
            positions=np.full(S, pos, np.int32),
            token_seg=np.arange(S, dtype=np.int32),
            new_kv_slot_ids=np.full(S, page + pos, np.int32),
            block_tables=bt,
            kv_lens=np.full(S, pos + 1, np.int32),
            cu_q_lens=np.arange(S + 1, dtype=np.int32),
            num_seqs=np.array([S], np.int32),
            selected_idxes=np.arange(S, dtype=np.int32),
            seq_mask=np.ones(S, np.float32),
        )

    dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    si_dev = dev(si)
    kv = ex.kv_cache
    outs, kv = step(ex.params, kv, dev(mk_mi(0)), si_dev)
    np.asarray(outs.next_tokens)
    t0 = time.perf_counter()
    for i in range(steps):
        outs, kv = step(ex.params, kv, dev(mk_mi(i + 1)), si_dev)
    np.asarray(outs.next_tokens)
    dt = time.perf_counter() - t0
    ex.kv_cache = kv
    llm.close()
    return steps / dt


def main_trained(args):
    """HONEST speculative number: target AND draft are char-llamas TRAINED
    on the same corpus (draft = 1 layer / 64 dim, weaker), so the draft
    approximates but does not match the target — the measured acceptance
    rate and speedup are real, not a full-acceptance upper bound."""
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import tests.fixtures as fixtures

    tdir = fixtures.trained_tiny_llama_cached()
    ddir = os.path.join(tempfile.gettempdir(), "scalellm_trained_draft_v1")
    fixtures.make_trained_tiny_llama(
        ddir, steps=250, hidden_size=64, num_hidden_layers=1
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests", "data", "corpus.txt")) as f:
        prompt = f.read()[:256]

    plain, _ = run(tdir, None, 0, args.steps, prompt=prompt)
    spec, rate = run(tdir, ddir, args.k, args.steps, prompt=prompt)
    print(json.dumps({
        "metric": f"spec_decode_tokens_per_s_trained-char-llama_k{args.k}",
        "value": round(spec, 1),
        "unit": "tokens/s",
        "plain_tokens_per_s": round(plain, 1),
        "speedup": round(spec / plain, 2),
        "acceptance_rate": round(rate, 4) if rate is not None else None,
        "note": "trained target (2L/128d) + weaker trained draft (1L/64d) "
                "on the same corpus: acceptance < 1 and the speedup is "
                "real (BASELINE config 4 honesty criterion)",
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--steps", type=int, default=96)
    p.add_argument("--target", type=str, default="gemma2-9b-int8")
    # int8 draft: the bf16 2B draft (5.2 GB) + int8 9B target (10.1 GB)
    # overflow one 16 GB v5e; int8 drafts are standard practice anyway.
    p.add_argument("--draft", type=str, default="gemma2-2b-int8")
    p.add_argument("--num-blocks", type=int, default=48,
                   help="KV pool blocks (spec bench runs ONE sequence; "
                        "gemma2-9b KV is 344 KB/token so a small pool "
                        "keeps the 9B+2B pair inside HBM)")
    p.add_argument("--trained", action="store_true",
                   help="trained char-llama target+draft: REAL acceptance")
    p.add_argument("--phase",
                   choices=["plain", "spec", "bound", "plain-bound"],
                   default=None,
                   help=argparse.SUPPRESS)  # internal: subprocess phases
    args = p.parse_args()

    if args.trained:
        main_trained(args)
        return

    from benchmarks.presets import make_preset_dir

    os.environ["SCALELLM_FAKE_LOAD"] = "zero"
    tdir = make_preset_dir(args.target)
    ddir = make_preset_dir(args.draft)

    if args.phase == "bound":
        tps, round_s = run_device_bound(
            tdir, ddir, args.k, rounds=24, num_blocks=args.num_blocks
        )
        print(json.dumps({"tokens_per_s": round(tps, 2),
                          "round_s": round(round_s, 4)}))
        return
    if args.phase == "plain-bound":
        tps = run_plain_device_bound(tdir, steps=48,
                                     num_blocks=args.num_blocks)
        print(json.dumps({"tokens_per_s": round(tps, 2)}))
        return
    if args.phase in ("plain", "spec"):
        # Child phase: one engine per PROCESS — the 9B target + draft pair
        # barely fits one 16 GB chip, and a same-process sequential run
        # OOMs (the first engine's buffers outlive close() via jit-cache /
        # cycle references). Process exit is the only guaranteed free;
        # the on-disk compile cache keeps the second phase warm.
        if args.phase == "plain":
            tps, _ = run(tdir, None, 0, args.steps,
                         num_blocks=args.num_blocks)
        else:
            tps, _ = run(tdir, ddir, args.k, args.steps,
                         num_blocks=args.num_blocks)
        print(json.dumps({"tokens_per_s": round(tps, 2)}))
        return

    import subprocess

    def phase(name):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name,
             "--target", args.target, "--draft", args.draft,
             "--k", str(args.k), "--steps", str(args.steps),
             "--num-blocks", str(args.num_blocks)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines()
                if l.strip().startswith("{")]
        if not line:
            raise RuntimeError(
                f"{name} phase failed: {out.stderr.strip().splitlines()[-3:]}"
            )
        return json.loads(line[-1])["tokens_per_s"]

    plain = phase("plain")
    spec = phase("spec")
    bound = plain_bound = None
    try:
        bound = phase("bound")
        plain_bound = phase("plain-bound")
    except Exception as e:
        print(f"bound phase failed: {e}", file=sys.stderr)
    result = {
        "metric": f"spec_decode_tokens_per_s_{args.target}_k{args.k}",
        "value": round(spec, 1),
        "unit": "tokens/s",
        "plain_tokens_per_s": round(plain, 1),
        "speedup_at_full_acceptance": round(spec / plain, 2),
        "note": "zero-weight synthetic: speculative number is the "
                "full-acceptance upper bound; plain decode is exact. "
                "plain/spec via the LLM API include the dev-tunnel's "
                "~60ms/step host RTT; the device_bound pair times the "
                "same fused round / plain step back-to-back without "
                "per-round fetches (what production serving sees).",
    }
    if bound is not None:
        result["device_bound_tokens_per_s"] = round(bound, 1)
    if plain_bound:
        result["device_plain_tokens_per_s"] = round(plain_bound, 1)
        result["device_speedup_at_full_acceptance"] = round(
            bound / plain_bound, 2
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
