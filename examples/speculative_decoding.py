"""Speculative decoding (reference parity: examples/speculative_decoding.py).

Draft-model speculation: a small draft proposes k tokens per round, the
target verifies them in ONE fused TPU dispatch (draft scan + target verify
+ rejection sampling in a single jitted program — speculative/
spec_executor.py). Without a draft model, pass num_speculative_tokens
alone for prompt-lookup (n-gram) speculation.
"""

import sys

from scalellm_tpu import LLM, SamplingParams


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    draft = sys.argv[2] if len(sys.argv) > 2 else "meta-llama/Llama-3.2-1B"
    llm = LLM(
        target,
        draft_model=draft,
        num_speculative_tokens=4,
    )
    sp = SamplingParams(max_tokens=128, temperature=0.0)
    out = llm.generate(["The fundamental theorem of calculus states"], sp)[0]
    print(out.outputs[0].text)


if __name__ == "__main__":
    main()
