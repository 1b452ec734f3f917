"""Subprocess entry for the 2-process multihost test (test_multihost.py).

Each process is one "host" of a pod: 2 local CPU devices, 4 global.
Host 0 drives a short greedy generation through DistributedLLMEngine
(broadcasting step inputs); host 1 runs the follower loop. Host 0 writes
its tokens to <workdir>/tokens.json; both exit 0 on success.
"""

import json
import os
import sys


def main():
    workdir, pid, nprocs, port = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.device_count() == 2 * nprocs

    import numpy as np

    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.engine.distributed import DistributedLLMEngine
    from scalellm_tpu.engine.llm_engine import EngineOptions
    from scalellm_tpu.parallel import multihost
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    opts = EngineOptions(
        model_path=os.path.join(workdir, "model"),
        block_size=4,
        num_blocks=32,
        warmup=True,  # both hosts warm the same buckets in lockstep
        tp_size=4,
    )
    engine = DistributedLLMEngine(opts, mesh=multihost.make_pod_mesh(tp=4))

    if not multihost.is_driver():
        engine.run_follower()
        return

    class _B:
        def __init__(self, i):
            self.id, self.size = i, 4

        def dec_ref(self):
            pass

    seq = Sequence(0, [3, 17, 42, 9, 101], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    seq.blocks = [_B(1), _B(2), _B(3), _B(4)]
    toks = []
    b = Batch()
    b.add(seq, 5)
    engine.execute_model(b)
    toks.append(seq.token_ids[-1])
    for _ in range(3):
        b = Batch()
        b.add(seq, 1)
        engine.execute_model(b)
        toks.append(seq.token_ids[-1])
    engine.shutdown_followers()
    with open(os.path.join(workdir, "tokens.json"), "w") as f:
        json.dump(toks, f)


if __name__ == "__main__":
    main()
