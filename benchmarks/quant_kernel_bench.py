"""Microbenchmark: achieved HBM bandwidth of quant_matmul at decode shapes.

Times a device-side lax.scan chaining kernel calls (output slice feeds the
next input) so each iteration must re-stream the weight; reports per-shape
achieved GB/s vs the v5e ~819GB/s roofline. Differencing two scan lengths
removes dispatch/fetch overhead.

Usage: python benchmarks/quant_kernel_bench.py [M]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_shape(name, M, K, N, bits, iters=64, block_n=None, block_k=None):
    import jax
    import jax.numpy as jnp

    from scalellm_tpu.ops.quant_matmul import quant_matmul, tile_quant_layout

    G = 128
    pack = 2 if bits == 4 else 1
    # Default scales dtype = f32, matching what the loader produces for
    # external GPTQ/AWQ checkpoints (the headline bench config); set
    # QKB_SCALES=bfloat16 to measure the internal-quantizer config.
    sc_dtype = np.dtype(os.environ.get("QKB_SCALES", "float32"))
    qw = np.zeros((K // pack, N), np.int8)
    sc = np.zeros((K // G, N), sc_dtype)
    zp = np.zeros((K // G, N), np.int8)
    kw = {}
    if block_n:
        kw["block_n"] = block_n
    if block_k:
        kw["block_k"] = block_k
    variant = os.environ.get("QKB_VARIANT", "")
    if variant:
        kw["variant"] = variant
    symmetric = bool(int(os.environ.get("QKB_SYM", "1")))
    if int(os.environ.get("QKB_TILED", "1")):
        W = int(os.environ.get("QUANT_TILE_N", "2048"))
        qw, sc, zp = (
            jnp.asarray(tile_quant_layout(a, W)) for a in (qw, sc, zp)
        )
    else:
        qw, sc, zp = jnp.asarray(qw), jnp.asarray(sc), jnp.asarray(zp)

    def loop(n_iters):
        def body(x, _):
            y = quant_matmul(
                x, qw, sc, None if symmetric else zp,
                bits=bits, symmetric=symmetric, **kw
            )[:, :N]
            # feed a K-sized slice back (keeps the chain serial)
            reps = (K + N - 1) // N
            xn = jnp.tile(y, (1, reps))[:, :K].astype(jnp.bfloat16)
            return xn + 1.0, ()

        def run(x0):
            x, _ = jax.lax.scan(body, x0, None, length=n_iters)
            return x

        return jax.jit(run)

    x0 = jnp.zeros((M, K), jnp.bfloat16)
    f_long = loop(iters)
    f_short = loop(iters // 2)
    np.asarray(f_long(x0))  # compile+warm
    np.asarray(f_short(x0))

    def t(f):
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(x0)
        np.asarray(r)
        return (time.perf_counter() - t0) / 3

    dt = t(f_long) - t(f_short)
    per_iter = dt / (iters // 2)
    # Count only the operands the kernel actually streams: zeros are not
    # passed when symmetric, and scale bytes follow the real dtype.
    wbytes = qw.size + sc.size * sc.dtype.itemsize
    if not symmetric:
        wbytes += zp.size
    gbs = wbytes / per_iter / 1e9
    print(
        f"{name:14s} M={M:2d} K={K:5d} N={N:6d} bits={bits} "
        f"{per_iter*1e6:8.1f} us/call  {gbs:6.1f} GB/s  ({gbs/819*100:4.1f}% roofline)"
    )
    return per_iter, gbs


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    shapes = [
        ("qkv", M, 4096, 6144, 4),
        ("o", M, 4096, 4096, 4),
        ("gate_up", M, 4096, 28672, 4),
        ("down", M, 14336, 4096, 4),
        ("lm_head", M, 4096, 128256, 8),
    ]
    total = 0.0
    for args in shapes:
        per_iter, _ = bench_shape(*args)
        total += per_iter * (32 if args[0] != "lm_head" else 1)
    print(f"sum over 32 layers + lm_head: {total*1e3:.2f} ms -> {1/total:.1f} tok/s ceiling")


if __name__ == "__main__":
    main()
