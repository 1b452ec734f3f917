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
    p.add_argument("--phase", choices=["plain", "spec"], default=None,
                   help=argparse.SUPPRESS)  # internal: subprocess phases
    args = p.parse_args()

    if args.trained:
        main_trained(args)
        return

    from benchmarks.presets import make_preset_dir

    os.environ["SCALELLM_FAKE_LOAD"] = "zero"
    tdir = make_preset_dir(args.target)
    ddir = make_preset_dir(args.draft)

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
    print(json.dumps({
        "metric": f"spec_decode_tokens_per_s_{args.target}_k{args.k}",
        "value": round(spec, 1),
        "unit": "tokens/s",
        "plain_tokens_per_s": round(plain, 1),
        "speedup_at_full_acceptance": round(spec / plain, 2),
        "note": "zero-weight synthetic: speculative number is the "
                "full-acceptance upper bound; plain decode is exact",
    }))


if __name__ == "__main__":
    main()
