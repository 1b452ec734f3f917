"""Tensor-parallel serving over a TPU device mesh (TPU-native; the
reference's multi-GPU analog). Shards every projection column/row-wise
over the `tp` mesh axis via shard_map; XLA inserts the psum/all_gather
collectives over ICI.

On a single-host slice this uses all local chips. Try it without TPU
hardware on a virtual 8-device CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_sharding.py <model_path>
"""

import os
import sys

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from scalellm_tpu import LLM, SamplingParams

    model = sys.argv[1] if len(sys.argv) > 1 else "meta-llama/Llama-3.1-70B"
    devices = jax.devices()
    tp = len(devices)
    mesh = Mesh(np.array(devices).reshape(1, tp), ("dp", "tp"))
    print(f"tensor-parallel over {tp} {devices[0].platform} devices")

    llm = LLM(model, tp_size=tp, mesh=mesh)
    out = llm.generate(
        ["Sharding large models over a TPU pod works by"],
        SamplingParams(max_tokens=64, temperature=0.0),
    )[0]
    print(out.outputs[0].text)


if __name__ == "__main__":
    main()
