"""Device mesh construction over ICI/DCN.

Replaces the reference's ProcessGroup/NCCL setup
(reference: src/model_parallel/process_group.cpp:98-133). jax.sharding.Mesh
handles communicator setup; XLA lays collectives on ICI within a slice and
DCN across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def make_mesh(tp: int = 1, dp: int = 1, devices: Optional[Sequence] = None):
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = tp * dp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, tp), devices=list(devices)[:n])
    except Exception:
        arr = np.array(list(devices)[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def collective_smoke_test(mesh) -> bool:
    """Tiny psum at startup to validate the fabric — the TPU analog of the
    reference's NCCL smoke test (reference: llm_engine.cpp:98-107)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size
    x = jnp.arange(n, dtype=jnp.int32)
    sharding = NamedSharding(mesh, P(("dp", "tp")))
    x = jax.device_put(x, sharding)
    total = int(jnp.sum(x))
    return total == n * (n - 1) // 2
