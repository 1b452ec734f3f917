"""Distributed driver plumbing (single-process: broadcasts are pass-through;
the multi-host path is exercised by the driver's dryrun + pod deployments)."""

import numpy as np


def test_broadcast_passthrough_single_process():
    from scalellm_tpu.parallel import multihost

    mi = {"a": np.arange(4), "b": np.ones((2, 2))}
    (out,) = multihost.broadcast_step_inputs(mi)
    assert out is mi


def test_pod_mesh_single_host():
    import jax

    from scalellm_tpu.parallel import multihost

    mesh = multihost.make_pod_mesh(tp=len(jax.devices()))
    assert mesh.shape["tp"] == len(jax.devices())
    assert multihost.collective_smoke_test(mesh)
    assert multihost.is_driver()


def test_distributed_engine_single_process(tmp_path):
    """DistributedLLMEngine degrades to LLMEngine on one process."""
    import tests.fixtures as fixtures
    from scalellm_tpu.engine.distributed import DistributedLLMEngine
    from scalellm_tpu.engine.llm_engine import EngineOptions

    d = str(tmp_path / "m")
    fixtures.make_tiny_llama(d, tokenizer=True)
    eng = DistributedLLMEngine(
        EngineOptions(model_path=d, num_blocks=64, block_size=4, warmup=False)
    )
    from scalellm_tpu.engine.batch import Batch
    from scalellm_tpu.request.sequence import Sequence
    from scalellm_tpu.request.stopping import StoppingCriteria
    from scalellm_tpu.sampling.params import SamplingParams

    seq = Sequence(0, [1, 2, 3], SamplingParams(temperature=0.0),
                   StoppingCriteria())
    assert eng.block_manager.allocate_blocks_for(seq, 4)
    b = Batch()
    b.add(seq, 3)
    eng.execute_model(b)
    assert seq.num_tokens == 4  # one token sampled


def test_check_step_header_desync():
    """Follower step-counter verification (engine/distributed.py header[8])."""
    import pytest

    from scalellm_tpu.engine import distributed as D

    h = np.zeros(D._HEADER_LEN, np.int32)
    h[0], h[8] = 1, 7
    D.check_step_header(h, 7)  # in sync: no raise
    with pytest.raises(RuntimeError, match="desync"):
        D.check_step_header(h, 6)


def _mk_header(step, flag=1, T=4, S=2):
    from scalellm_tpu.engine import distributed as D

    h = np.zeros(D._HEADER_LEN, np.int32)
    h[0], h[1], h[2], h[3], h[4], h[5], h[7] = flag, T, S, 1, 1, 1, 1
    h[8] = step
    return h


def _run_follower_scripted(monkeypatch, headers):
    """Drive DistributedLLMEngine.run_follower with a scripted broadcast
    sequence (no processes); returns the number of executed steps."""
    import types

    from scalellm_tpu.engine import distributed as D
    from scalellm_tpu.parallel import multihost

    script = list(headers)
    monkeypatch.setattr(multihost, "is_driver", lambda: False)
    monkeypatch.setattr(
        multihost, "broadcast_with_timeout", lambda z, timeout=None: script.pop(0)
    )
    # payload broadcast: followers receive their placeholders unchanged
    monkeypatch.setattr(
        multihost, "broadcast_step_inputs", lambda *p: p if len(p) != 1 else (p[0],)
    )
    executed = []
    dummy = types.SimpleNamespace(
        _multi=True,
        executor=types.SimpleNamespace(
            execute=lambda mi, si, decode_only=False: executed.append(1)
        ),
    )
    D.DistributedLLMEngine.run_follower(dummy)
    return len(executed)


def test_run_follower_heartbeat_and_stop(monkeypatch):
    """Heartbeats keep the loop alive without advancing the step counter."""
    from scalellm_tpu.engine import distributed as D

    n = _run_follower_scripted(
        monkeypatch,
        [
            _mk_header(1),
            _mk_header(0, flag=D._HEARTBEAT),  # idle keep-alive: skipped
            _mk_header(2),
            _mk_header(0, flag=D._STOP),
        ],
    )
    assert n == 2


def test_run_follower_desync_aborts(monkeypatch):
    """A skipped broadcast (driver ahead of follower) fails loudly before
    entering a mismatched collective."""
    import pytest

    with pytest.raises(RuntimeError, match="desync"):
        _run_follower_scripted(
            monkeypatch,
            [_mk_header(1), _mk_header(5)],  # follower expects 2, driver says 5
        )


def test_broadcast_with_timeout_single_process():
    from scalellm_tpu.parallel import multihost

    x = np.arange(3)
    out = multihost.broadcast_with_timeout(x, timeout=5.0)
    assert out is x


def test_follower_watchdog_on_wedged_driver(tmp_path):
    """2-process integration: the driver stays ALIVE but stops broadcasting
    (wedged scheduler). The coordination service cannot detect this (it
    only fail-fasts on process death — verified: a dead driver aborts the
    follower via the runtime's fatal handler); the follower's own watchdog
    must fire and exit loudly instead of waiting forever."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "w.py"
    worker.write_text(
        """
import os, sys, time
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[4])
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(f"127.0.0.1:{sys.argv[3]}", num_processes=2,
                           process_id=pid)
from scalellm_tpu.parallel import multihost
if pid == 0:
    multihost.broadcast_step_inputs(np.arange(9, dtype=np.int32))
    time.sleep(60)  # wedged: alive, never broadcasts again
    os._exit(0)
multihost.broadcast_with_timeout(np.zeros(9, np.int32), timeout=60.0)
try:
    multihost.broadcast_with_timeout(np.zeros(9, np.int32), timeout=8.0)
except RuntimeError as e:
    print("WATCHDOG-FIRED:", e)
    os._exit(7)
os._exit(1)  # should not receive anything
"""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), repo],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    out1 = procs[1].communicate(timeout=120)[0].decode()
    assert procs[1].returncode == 7, f"watchdog did not fire:\n{out1[-2000:]}"
    assert "WATCHDOG-FIRED" in out1
    procs[0].kill()
    procs[0].communicate(timeout=30)
