"""Real 2-process multi-host driver test (VERDICT r1 #8).

Spawns two OS processes federated by jax.distributed (gloo over localhost,
2 CPU devices each = a 4-device global mesh). Host 0 runs the
DistributedLLMEngine driver loop — header + payload broadcast per step —
and host 1 runs run_follower(); both enter the same sharded jit in
lockstep. The driver's greedy tokens must match a single-process engine.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

import tests.fixtures as fixtures


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_driver_follower(tmp_path):
    model_dir = str(tmp_path / "model")
    fixtures.make_tiny_llama(model_dir, tokenizer=True)

    # single-process reference tokens
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.engine.llm_engine import EngineOptions, LLMEngine
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    engine = LLMEngine(EngineOptions(
        model_path=model_dir, block_size=4, num_blocks=32, warmup=False,
    ))

    class _B:
        def __init__(self, i):
            self.id, self.size = i, 4

        def dec_ref(self):
            pass

    seq = Sequence(0, [3, 17, 42, 9, 101], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    seq.blocks = [_B(1), _B(2), _B(3), _B(4)]
    expected = []
    b = Batch()
    b.add(seq, 5)
    engine.execute_model(b)
    expected.append(seq.token_ids[-1])
    for _ in range(3):
        b = Batch()
        b.add(seq, 1)
        engine.execute_model(b)
        expected.append(seq.token_ids[-1])
    del engine

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(tmp_path), str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    with open(tmp_path / "tokens.json") as f:
        got = json.load(f)
    assert got == expected
