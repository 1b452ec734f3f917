"""Sweep quant_matmul configs for the lm_head shape [1,4096]x[4096,~128k].

Weights are allocated directly on device (jnp.zeros in the tiled layout) —
shipping 262MB over the axon tunnel per config is slower than the bench.
Usage: python benchmarks/lm_head_sweep.py [variant:W:BK[:sc] ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

D, V, G = 4096, 128256, 128
STEPS = 32


def bench(variant, tile_n, block_k, sc_dtype="bf16", bits=4, stacked=False):
    from scalellm_tpu.ops.quant_matmul import quant_matmul

    Vp = ((V + tile_n - 1) // tile_n) * tile_n
    n_n = Vp // tile_n
    rows = D // 2 if bits == 4 else D
    qw_t = jnp.zeros((n_n, rows, tile_n), jnp.int8)
    sdt = jnp.bfloat16 if sc_dtype == "bf16" else jnp.float32
    sc_t = jnp.ones((n_n, D // G, tile_n), sdt)
    if stacked:
        qw_t, sc_t = qw_t[None], sc_t[None]
    x = jnp.ones((1, D), jnp.bfloat16)

    @jax.jit
    def loop(x):
        def step(h, _):
            kw = dict(layer=jnp.zeros((), jnp.int32)) if stacked else {}
            out = quant_matmul(
                h, qw_t, sc_t, None, bits=bits, symmetric=True,
                variant=variant, block_k=block_k, **kw,
            )
            return h + out[:, :1].astype(jnp.bfloat16) * 0, out[0, 0]

        _, outs = jax.lax.scan(step, x, jnp.arange(STEPS))
        return outs

    try:
        out = loop(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = loop(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (3 * STEPS)
        wbytes = qw_t.size + sc_t.size * sc_t.dtype.itemsize
        tag = "S" if stacked else " "
        print(f"{variant:8s}{tag} b{bits} W={tile_n:5d} BK={block_k:5d} "
              f"sc={sc_dtype}: {dt*1e6:7.0f} us  {wbytes/dt/1e9:5.0f} GB/s",
              flush=True)
    except Exception as e:
        print(f"{variant:8s}{'S' if stacked else ' '} b{bits} W={tile_n:5d} "
              f"BK={block_k:5d} sc={sc_dtype}: FAIL {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    # spec: variant:W:BK[:sc[:bits[:stacked]]]
    for spec in sys.argv[1:]:
        p = spec.split(":")
        bench(p[0], int(p[1]), int(p[2]),
              p[3] if len(p) > 3 else "bf16",
              int(p[4]) if len(p) > 4 else 4,
              len(p) > 5 and p[5] == "1")
