"""Compiled-graph collective audit for the TP-sharded decode step
(VERDICT r4 #5: upgrade the scaling proxy from per-device byte shapes to
the program's ACTUAL collectives).

Walks the jaxpr of the production Executor step (the same program
`Executor.execute` dispatches) on the virtual 8-device CPU mesh and
counts every collective primitive with its per-step byte volume — scan
bodies multiply by their trip count, so a psum inside the layer scan
counts n_layers times. This catches the sharding bugs the old
bytes-per-device check could not: a full-logit all_gather, a psum placed
per layer where one would do, accidental activation replication.

From the collective table it derives an ANALYTIC efficiency curve:

    t(tp) = weight_bytes_per_device(tp) / HBM_BW + wire_bytes(tp) / ICI_BW
    eff(tp) = t(1) / (tp * t(tp))

using v5e numbers (HBM 819 GB/s; ICI ~90 GB/s/chip effective for a 1D
ring over two 45 GB/s links — the scaling-book ring model, flagged as an
assumption). Wire bytes use standard ring-collective formulas. Still
"pending real ICI" — but the collectives themselves are the compiled
program's, not a hand model.

Usage (virtual mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/collective_audit.py [--preset llama31-8b-int4] \
      [--tp 2,4,8] [--batch 1] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_BW = 819e9  # v5e spec
ICI_BW = 90e9  # 2 × 45 GB/s links usable by a 1D ring (assumption)

COLLECTIVES = {
    "psum": "all_reduce",
    "all_gather": "all_gather",
    "psum_scatter": "reduce_scatter",
    "reduce_scatter": "reduce_scatter",
    "ppermute": "ppermute",
    "all_to_all": "all_to_all",
}


def _var_bytes(v) -> int:
    import numpy as np

    aval = v.aval
    if not hasattr(aval, "shape"):
        return 0
    return int(np.prod(aval.shape, dtype=np.int64)) * aval.dtype.itemsize


def _wire_bytes(kind: str, in_b: int, out_b: int, n: int) -> float:
    """Ring-model bytes crossing each chip's ICI links per execution."""
    if n <= 1:
        return 0.0
    if kind == "all_reduce":
        return 2 * out_b * (n - 1) / n
    if kind == "all_gather":
        return out_b * (n - 1) / n
    if kind == "reduce_scatter":
        return in_b * (n - 1) / n
    if kind == "ppermute":
        return out_b
    if kind == "all_to_all":
        return max(in_b, out_b) * (n - 1) / n
    return 0.0


def walk_jaxpr(jaxpr, n: int, mult: float = 1.0, table=None, notes=None):
    """Accumulate {kind: [count, bytes, wire_bytes]} over a jaxpr,
    recursing into nested call/scan/cond/while/shard_map jaxprs with the
    proper execution multiplier."""
    table = table if table is not None else defaultdict(lambda: [0, 0.0, 0.0])
    notes = notes if notes is not None else []
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVES:
            kind = COLLECTIVES[name]
            in_b = sum(_var_bytes(v) for v in eqn.invars if hasattr(v, "aval"))
            out_b = sum(_var_bytes(v) for v in eqn.outvars)
            table[kind][0] += mult
            table[kind][1] += mult * out_b
            table[kind][2] += mult * _wire_bytes(kind, in_b, out_b, n)
            if out_b * max(n, 1) > 32e6:
                notes.append(
                    f"large {kind}: {out_b/1e6:.1f} MB/shard x{mult:g} "
                    f"({[tuple(v.aval.shape) for v in eqn.outvars]})"
                )
            continue
        child_mult = mult
        params = eqn.params
        if name == "scan":
            child_mult = mult * params.get("length", 1)
        elif name == "while":
            notes.append("while-loop body counted once (unknown trip count)")
        for key in ("jaxpr", "call_jaxpr", "body_jaxpr", "cond_jaxpr"):
            sub = params.get(key)
            if sub is None:
                continue
            inner = getattr(sub, "jaxpr", sub)
            walk_jaxpr(inner, n, child_mult, table, notes)
        for br in params.get("branches", ()) or ():
            inner = getattr(br, "jaxpr", br)
            walk_jaxpr(inner, n, child_mult, table, notes)
    return table, notes


def audit_tp(preset: str, tp: int, batch: int):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import __graft_entry__ as ge
    import bench
    from benchmarks.scaling_bench import time_tp  # noqa: F401 (shared setup)
    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.models.common import DecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig

    devices = jax.devices()
    assert len(devices) >= tp
    mesh = Mesh(np.array(devices[:tp]).reshape(1, tp), ("dp", "tp"))
    base = bench.build_model(preset)
    model = DecoderModel(
        base.args, ParallelConfig(tp_axis="tp", tp_size=tp, sp=False)
    )
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

    mi, si = ge._example_inputs(T=batch, S=batch, MAXP=8, page_size=16)
    mi = dataclasses.replace(
        mi,
        cu_q_lens=jnp.arange(batch + 1, dtype=jnp.int32),
        kv_lens=jnp.full((batch,), 17, jnp.int32),
        new_kv_slot_ids=jnp.arange(batch, dtype=jnp.int32) + 16,
        selected_idxes=jnp.arange(batch, dtype=jnp.int32),
    )
    step = executor._build_step_fn(decode_only=True)
    jaxpr = jax.make_jaxpr(step)(
        executor.params, executor.kv_cache, mi, si
    )
    table, notes = walk_jaxpr(jaxpr.jaxpr, tp)

    dev0 = devices[0]
    shard_bytes = 0
    for leaf in jax.tree_util.tree_leaves(executor.params):
        for s in getattr(leaf, "addressable_shards", []):
            if s.device == dev0:
                shard_bytes += s.data.nbytes
    return table, notes, shard_bytes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="llama31-8b-int4")
    p.add_argument("--tp", default="1,2,4,8")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--json-only", action="store_true")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    per_tp = {}
    wbytes = {}
    for tp in [int(x) for x in args.tp.split(",") if x]:
        table, notes, sb = audit_tp(args.preset, tp, args.batch)
        per_tp[tp] = {
            "collectives": {
                k: {
                    "count_per_step": round(v[0], 1),
                    "bytes_per_step": int(v[1]),
                    "wire_bytes_per_step": int(v[2]),
                }
                for k, v in sorted(table.items())
            },
            "total_wire_bytes_per_step": int(sum(v[2] for v in table.values())),
            "notes": sorted(set(notes)),
        }
        wbytes[tp] = sb
        if not args.json_only:
            print(f"tp={tp}: wire={per_tp[tp]['total_wire_bytes_per_step']/1e6:.2f} "
                  f"MB/step, weights/dev={sb/1e9:.3f} GB", file=sys.stderr)

    # Analytic efficiency: weight stream + ICI wire per step.
    t = {
        tp: wbytes[tp] / HBM_BW
        + per_tp[tp]["total_wire_bytes_per_step"] / ICI_BW
        for tp in per_tp
    }
    t1 = t.get(1) or (max(wbytes.values()) * max(per_tp) / HBM_BW if wbytes else None)
    out = {
        "metric": f"collective_audit_{args.preset}_b{args.batch}",
        "per_tp": {str(k): v for k, v in per_tp.items()},
        "weight_bytes_per_device": {str(k): v for k, v in wbytes.items()},
        "predicted_ms_per_step": {
            str(k): round(v * 1e3, 4) for k, v in t.items()
        },
        "predicted_efficiency": {
            str(k): round(t1 / (k * v), 4) for k, v in t.items()
        } if t1 else {},
        "assumptions": {
            "hbm_bw_bytes_per_s": HBM_BW,
            "ici_bw_bytes_per_s": ICI_BW,
            "model": "ring collectives; decode weight-stream-bound; "
                     "pending real ICI hardware",
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
