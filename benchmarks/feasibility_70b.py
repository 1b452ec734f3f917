"""Llama-3.1-70B INT4 multi-host feasibility (BASELINE config 5).

Two artifacts, no 70B checkpoint needed:

1. memory_math(): per-chip weight + KV + activation accounting for the
   real 70B config under a tp=16 sharding (2 v5e-8 hosts), derived from
   the model's OWN param_shapes()/param_partition_specs() — the same
   shapes and specs the executor shards with, not a hand copy. Asserts
   the deployment fits the 16 GB/chip HBM budget with the serving
   headroom BASELINE.md assumes, and reports the KV capacity (tokens)
   the remaining HBM buys.

2. --dryrun: a REAL 2-process jax.distributed run (8 virtual CPU devices
   per process = a 16-device global mesh): one sharded decode step of a
   structure-identical 70B slice (full hidden/intermediate/vocab/head
   dims, n_layers trimmed for CPU time — the sharding, collectives and
   kernels per layer are exactly the 80-layer program's). Validates the
   tp=16 program compiles and executes across a host boundary.

Reference never crosses a host (SURVEY.md §2.7) — this is the build's
differentiator, validated as far as it can be without pod hardware.

Usage:
  python benchmarks/feasibility_70b.py           # memory math (instant)
  python benchmarks/feasibility_70b.py --dryrun  # + 2-process step
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PER_CHIP = 16 * 1024**3  # v5e
UTILIZATION = 0.9  # serving headroom (same default as EngineOptions)


def args_70b(n_layers: int = 80):
    from scalellm_tpu.config import ModelArgs, QuantArgs

    return ModelArgs(
        model_type="llama",
        dtype="bfloat16",
        hidden_size=8192,
        intermediate_size=28672,
        n_layers=n_layers,
        n_heads=64,
        n_kv_heads=8,
        vocab_size=128256,
        max_position_embeddings=8192,
        rope_theta=500000.0,
        quant_args=QuantArgs(
            quant_method="gptq", bits=4, group_size=128, is_sym=True,
        ),
    )


def _leaf_bytes(shape, name: str, dtype_size: int) -> int:
    import numpy as np

    itemsize = (
        1 if name in ("qweight", "zeros")
        else 2 if name == "scales"  # internal-quantizer bf16 scales
        else dtype_size
    )
    return int(np.prod(shape)) * itemsize


def _sharded_bytes(shapes, specs, tp: int, dtype_size: int) -> int:
    """Per-DEVICE bytes of a (possibly nested) shapes tree, dividing each
    leaf by tp when its PartitionSpec shards any dim over the tp axis."""
    total = 0
    for k, v in shapes.items():
        spec = specs.get(k) if isinstance(specs, dict) else None
        if isinstance(v, dict):
            total += _sharded_bytes(v, spec or {}, tp, dtype_size)
        else:
            s = spec
            sharded = s is not None and any(ax is not None for ax in s)
            total += _leaf_bytes(v, k, dtype_size) // (tp if sharded else 1)
    return total


def memory_math(tp: int = 16, page_size: int = 16) -> dict:
    from scalellm_tpu.models.common import DecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig

    model = DecoderModel(
        args_70b(), ParallelConfig(tp_axis="tp", tp_size=tp)
    )
    shapes = model.param_shapes()
    specs = model.param_partition_specs()
    w_per_chip = _sharded_bytes(shapes, specs, tp, dtype_size=2)

    # KV: global shape divided by tp (the stored-head dim is tp-sharded;
    # kv_cache_shape already accounts for per-shard head replication when
    # n_kv_heads < tp).
    import numpy as np

    kv_row = np.prod(model.kv_cache_shape(1, page_size)) * 2 // page_size
    kv_row_per_chip = int(kv_row) // tp  # bytes per cached token, per chip

    budget = int(HBM_PER_CHIP * UTILIZATION)
    # activation transient: [T, D] ladders + one [T, V/tp] logits block
    act = 64 * 8192 * 4 + 64 * (128256 // tp) * 4
    kv_budget = budget - w_per_chip - act
    kv_tokens = kv_budget // kv_row_per_chip
    out = {
        "config": "llama-3.1-70b int4 g128, tp=16 (2 x v5e-8 hosts)",
        "weights_gb_per_chip": round(w_per_chip / 1024**3, 3),
        "kv_bytes_per_token_per_chip": kv_row_per_chip,
        "activation_reserve_mb": round(act / 1024**2, 1),
        "hbm_budget_gb_per_chip": round(budget / 1024**3, 3),
        "kv_capacity_tokens": int(kv_tokens),
        "kv_capacity_8k_contexts": int(kv_tokens // 8192),
        "fits": bool(kv_tokens > 0),
    }
    assert out["fits"], f"70B int4 does not fit tp={tp}: {out}"
    # Sanity: must hold at least a handful of full 8k contexts to serve.
    assert out["kv_capacity_8k_contexts"] >= 4, out
    return out


# ---------------------------------------------------------------- dryrun


def _dryrun_worker(pid: int, nprocs: int, port: int, n_layers: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    import numpy as np
    from jax.sharding import Mesh

    from scalellm_tpu.engine.executor import Executor
    from scalellm_tpu.models.common import DecoderModel
    from scalellm_tpu.parallel.config import ParallelConfig

    n_dev = jax.device_count()
    assert n_dev == 8 * nprocs, n_dev
    mesh = Mesh(np.array(jax.devices()).reshape(1, n_dev), ("dp", "tp"))

    a = args_70b(n_layers=n_layers)
    a.dtype = "float32"  # CPU
    model = DecoderModel(a, ParallelConfig(tp_axis="tp", tp_size=n_dev))

    # Zero params in the exact tiled/stacked quant layout (instant init —
    # the feasibility target is compile+execute, not numerics).
    import jax.numpy as jnp

    def zero_leaf(path, shape):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("qweight", "zeros"):
            return jnp.zeros(shape, jnp.int8)
        if name == "scales":
            return jnp.zeros(shape, jnp.float32)
        return jnp.zeros(shape, jnp.float32)

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        model.param_shapes(), is_leaf=lambda x: isinstance(x, tuple)
    )
    params = jax.tree_util.tree_unflatten(
        treedef, [zero_leaf(p, sh) for p, sh in paths_leaves]
    )
    executor = Executor(model, params, mesh=mesh)
    executor.init_kv_cache(num_blocks=32, block_size=16)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    mi, si = ge._example_inputs(T=16, S=4, MAXP=4, page_size=16)
    outs = executor.execute(mi, si)
    tokens = np.asarray(outs.next_tokens)
    assert tokens.shape == (4,), tokens.shape
    if pid == 0:
        print(f"70B-slice dryrun ok across {nprocs} hosts x 8 devices: "
              f"tokens={tokens.tolist()}")


def run_dryrun(n_layers: int = 2, nprocs: int = 2) -> None:
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), str(nprocs), str(port), str(n_layers)],
            env=env,
        )
        for pid in range(nprocs)
    ]
    for p in procs:
        assert p.wait(timeout=1200) == 0, f"worker {p.args} failed"


def main():
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _dryrun_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                       int(sys.argv[i + 3]), int(sys.argv[i + 4]))
        return
    print(json.dumps(memory_math()))
    if "--dryrun" in sys.argv:
        run_dryrun()


if __name__ == "__main__":
    main()
