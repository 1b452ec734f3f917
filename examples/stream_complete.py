"""Synchronous streaming completion (reference parity:
examples/stream_complete.py) — deltas print as they decode."""

import sys

from scalellm_tpu import AsyncLLMEngine, SamplingParams


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-8B"
    engine = AsyncLLMEngine(model)
    engine.start()
    try:
        stream = engine.schedule(
            "The history of the TPU began",
            SamplingParams(max_tokens=128, temperature=0.7, top_p=0.9),
            stream=True,
        )
        for out in stream:
            for seq in out.outputs:
                print(seq.text, end="", flush=True)
        print()
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
