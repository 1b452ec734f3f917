"""CPU offline inference (reference parity: examples/cpu_offline_inference.py).

Runs the full engine on the CPU backend — same code path as TPU (the
Pallas kernels fall back to their jnp references), useful for development
machines without a TPU attached."""

import sys


def main():
    import jax

    # Force the CPU backend even when a TPU plugin is registered.
    jax.config.update("jax_platforms", "cpu")

    from scalellm_tpu import LLM, SamplingParams

    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.2-1B"
    llm = LLM(model)
    outs = llm.generate(
        ["The capital of Japan is"],
        SamplingParams(max_tokens=32, temperature=0.0),
    )
    print(outs[0].outputs[0].text)


if __name__ == "__main__":
    main()
