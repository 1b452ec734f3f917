"""Tensor-parallel scaling efficiency sweep (BASELINE.md >=85% target).

Sweeps tp over the available devices (real TPU pod slice, or the virtual
CPU mesh via JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_
count=8), times decode steps through the SAME sharded executor production
uses, and reports per-tp throughput plus scaling efficiency

    eff(tp) = t(tp=1) / (tp * t(tp))

For weight-bound decode, ideal tp scaling divides the per-chip weight
stream by tp (each chip streams 1/tp of the weights; the psum rides ICI).
On the 1-real-chip dev tunnel this script validates the harness on the
virtual mesh; pointed at a pod slice it produces the BASELINE numbers.

Usage:
  python benchmarks/scaling_bench.py [--preset llama31-8b-int4]
      [--tp 1,2,4,8] [--steps 16] [--batch 1] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_tp(preset: str, tp: int, batch: int, steps: int, reps: int = 3):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    import bench
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.models.common import DecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig

    devices = jax.devices()
    assert len(devices) >= tp, f"need {tp} devices, have {len(devices)}"
    mesh = Mesh(np.array(devices[:tp]).reshape(1, tp), ("dp", "tp"))

    base = bench.build_model(preset)
    model = DecoderModel(
        base.args,
        ParallelConfig(tp_axis="tp", tp_size=tp, sp=False),
    )
    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import scales_np_dtype

    def zero_leaf(path, shape):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("qweight", "zeros"):
            return jnp.zeros(shape, jnp.int8)
        if name == "scales":
            return jnp.zeros(shape, jnp.dtype(scales_np_dtype()))
        dt = jnp.bfloat16 if model.args.dtype == "bfloat16" else jnp.float32
        return jnp.zeros(shape, dt)

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        model.param_shapes(), is_leaf=lambda x: isinstance(x, tuple)
    )
    params = jax.tree_util.tree_unflatten(
        treedef, [zero_leaf(p, sh) for p, sh in paths_leaves]
    )
    executor = Executor(model, params, mesh=mesh)
    executor.init_kv_cache(num_blocks=batch * 12 + 4, block_size=16)

    # Per-device weight bytes: decode is weight-stream-bound, so ideal tp
    # scaling means each chip streams 1/tp of the bytes. This is exact and
    # contention-free even on the virtual CPU mesh (where wall-clock is
    # noise: the 8 "devices" share the host's cores).
    dev0 = devices[0]
    shard_bytes = 0
    for leaf in jax.tree_util.tree_leaves(executor.params):
        for s in getattr(leaf, "addressable_shards", []):
            if s.device == dev0:
                shard_bytes += s.data.nbytes

    import __graft_entry__ as ge

    mi, si = ge._example_inputs(
        T=batch, S=batch, MAXP=8, page_size=16
    )
    # decode-shaped: one token per sequence
    import dataclasses

    mi = dataclasses.replace(
        mi,
        cu_q_lens=jnp.arange(batch + 1, dtype=jnp.int32),
        kv_lens=jnp.full((batch,), 17, jnp.int32),
        new_kv_slot_ids=jnp.arange(batch, dtype=jnp.int32) + 16,
        selected_idxes=jnp.arange(batch, dtype=jnp.int32),
    )
    outs = executor.execute(mi, si)  # compile + warm
    np.asarray(outs.next_tokens)
    t0 = time.perf_counter()
    for _ in range(reps * steps):
        outs = executor.execute(mi, si)
    np.asarray(outs.next_tokens)
    dt = (time.perf_counter() - t0) / (reps * steps)
    return dt, shard_bytes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="llama31-8b-int4")
    p.add_argument("--tp", default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--json-only", action="store_true")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # sitecustomize force-registers the axon plugin programmatically;
        # the env var alone does not select CPU (CLAUDE.md).
        jax.config.update("jax_platforms", "cpu")
    n = len(jax.devices())
    tps = (
        [int(x) for x in args.tp.split(",") if x]
        or [t for t in (1, 2, 4, 8, 16) if t <= n]
    )
    results = {}
    bytes_per_dev = {}
    for tp in tps:
        dt, sb = time_tp(args.preset, tp, args.batch, args.steps)
        results[tp] = dt
        bytes_per_dev[tp] = sb
        if not args.json_only:
            print(f"tp={tp}: {dt*1e3:.2f} ms/step, "
                  f"{sb/1e9:.3f} GB weights/device", file=sys.stderr)
    t1 = results.get(1)
    b1 = bytes_per_dev.get(1)
    out = {
        "metric": f"tp_scaling_{args.preset}_b{args.batch}",
        "ms_per_step": {str(k): round(v * 1e3, 3) for k, v in results.items()},
        "efficiency": {
            str(k): round(t1 / (k * v), 4) for k, v in results.items()
        } if t1 else {},
        # Weight-stream scaling: per-device bytes must track 1/tp — the
        # deterministic part of tp efficiency (exact even on the virtual
        # CPU mesh, where wall-clock efficiency is core-contention noise).
        "weight_bytes_per_device": {
            str(k): v for k, v in bytes_per_dev.items()
        },
        "weight_stream_efficiency": {
            str(k): round(b1 / (k * v), 4) for k, v in bytes_per_dev.items()
            if v
        } if b1 else {},
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
