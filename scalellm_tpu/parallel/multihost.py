"""Multi-host coordination for the distributed engine.

The reference never crosses a host (SURVEY.md §2.7: NCCL single-process,
single-node). On TPU pods the model spans hosts: every host must execute the
same jitted program on the same step inputs, with XLA laying collectives on
ICI within a slice and DCN across hosts. The host-0 scheduler makes the
batching decisions; this module broadcasts the resulting step inputs so all
hosts enter the jit in lockstep (the "distributed driver" BASELINE.json
requires).

Usage:
    init_distributed()                      # jax.distributed.initialize()
    mesh = make_pod_mesh(tp=8)              # all devices across hosts
    if is_driver(): mi, si = scheduler...   # host 0 builds the batch
    mi, si = broadcast_step_inputs(mi, si)  # everyone gets host-0's inputs
    outs = executor.execute(mi, si)         # same program on every host
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection (the analog of the
    reference's ProcessGroup::create_process_groups,
    process_group.cpp:98-133 — but per-host processes over DCN instead of
    per-GPU threads over NCCL)."""
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # single-host / already-initialized runtimes
        logger.info("jax.distributed.initialize skipped: %s", e)


def is_driver() -> bool:
    """True on the scheduler-owning host (the reference's rank-0 'driver'
    concept, worker.h:18, generalized to hosts)."""
    import jax

    return jax.process_index() == 0


def make_pod_mesh(tp: int = 0, dp: int = 1):
    """Mesh over ALL devices of all hosts: (dp, tp) axes; tp=0 → all devices
    in one tp group."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()  # global, all hosts
    n = len(devices)
    if tp <= 0:
        tp = n // dp
    assert dp * tp == n, f"dp*tp ({dp}*{tp}) != devices ({n})"
    from jax.experimental import mesh_utils

    try:
        arr = mesh_utils.create_device_mesh((dp, tp))
    except Exception:
        arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def broadcast_step_inputs(*pytrees: Any) -> Tuple[Any, ...]:
    """Broadcast host-0's step inputs (ModelInputs/SamplingInputs pytrees of
    numpy arrays) to every host. No-op on a single process.

    Per-step latency matters (this sits on the decode critical path): one
    fused broadcast over all leaves via multihost_utils, which rides the
    fast collective fabric rather than the coordination service.
    """
    import jax

    if jax.process_count() == 1:
        return pytrees if len(pytrees) != 1 else (pytrees[0],)
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(pytrees)
    return out


def broadcast_with_timeout(pytree: Any, timeout: Optional[float] = None) -> Any:
    """broadcast_step_inputs for ONE pytree, bounded by `timeout` seconds.

    The underlying collective blocks forever if the sending host died (a
    dead driver leaves followers wedged inside broadcast_one_to_all with
    no error). The collective runs on a daemon thread; if it misses the
    deadline this raises RuntimeError in the caller so the follower host
    can exit loudly. The abandoned thread may stay blocked in the runtime
    — acceptable, because the only recovery from a lost driver is process
    exit and re-init (matching the reference's fail-fast philosophy for
    collective errors, llm_engine.cpp:98-107)."""
    if timeout is None:
        return broadcast_step_inputs(pytree)[0]
    import queue
    import threading

    q: "queue.Queue[tuple[bool, Any]]" = queue.Queue()

    def _run():
        try:
            q.put((True, broadcast_step_inputs(pytree)[0]))
        except Exception as e:  # collective/runtime errors count as failure
            q.put((False, e))

    t = threading.Thread(target=_run, daemon=True, name="mh-bcast")
    t.start()
    try:
        ok, val = q.get(timeout=timeout)
    except queue.Empty:
        raise RuntimeError(
            f"multihost broadcast timed out after {timeout:.1f}s — the "
            "driver host is unreachable (dead or wedged); exiting"
        ) from None
    if not ok:
        raise RuntimeError(f"multihost broadcast failed: {val}") from val
    return val


def collective_smoke_test(mesh) -> bool:
    """Tiny psum across the whole mesh at startup — the analog of the
    reference's NCCL smoke test with timeout (llm_engine.cpp:98-107)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        n = mesh.devices.size
        x = jnp.ones((n,), jnp.int32)
        sharding = NamedSharding(mesh, P(("dp", "tp")))
        y = jax.device_put(x, sharding)
        total = int(jnp.sum(y))
        ok = total == n
        if not ok:
            logger.error("collective smoke test failed: got %d want %d", total, n)
        return ok
    except Exception:
        logger.exception("collective smoke test raised")
        return False
