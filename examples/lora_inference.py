"""Multi-LoRA inference (reference's adapter support, TPU-batched): load
several adapters at startup and pick one per request — adapters ride the
same batch, selected per sequence by an in-graph one-hot over the slot
dim (lora/)."""

import sys

from scalellm_tpu import LLM, SamplingParams


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    adapters = {
        "sql": sys.argv[2] if len(sys.argv) > 2 else "./adapters/sql",
        "chat": sys.argv[3] if len(sys.argv) > 3 else "./adapters/chat",
    }
    llm = LLM(base, lora_modules=adapters)
    sp = SamplingParams(max_tokens=64, temperature=0.0)

    outs = llm.generate(
        [
            "SELECT the top 5 customers by revenue:",
            "Hi! How are you today?",
            "Explain joins in one sentence.",  # base model (no adapter)
        ],
        sp,
        lora=["sql", "chat", None],
    )
    for out in outs:
        print(f"--- {out.prompt!r}\n{out.outputs[0].text}")


if __name__ == "__main__":
    main()
