"""Offline batch inference (parity with the reference's examples)."""

from scalellm_tpu import LLM, SamplingParams


def main():
    import sys

    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    llm = LLM(model)
    prompts = [
        "The capital of France is",
        "def quicksort(arr):",
    ]
    outs = llm.generate(prompts, SamplingParams(max_tokens=64, temperature=0.0))
    for out in outs:
        print(f"--- {out.prompt!r}")
        print(out.outputs[0].text)


if __name__ == "__main__":
    main()
