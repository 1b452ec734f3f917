"""Sweep quant_matmul configs for the lm_head shape [1,4096]x[4096,~128k]."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from scalellm_tpu.ops.quant_matmul import quant_matmul, tile_quant_layout

D, V, G = 4096, 128256, 128
STEPS = 32


def bench(variant, tile_n, block_k, sc_dtype):
    Vp = ((V + tile_n - 1) // tile_n) * tile_n
    qw_t = jnp.asarray(tile_quant_layout(np.zeros((D // 2, Vp), np.int8), tile_n))
    sc = np.ones((D // G, Vp), np.float32)
    if sc_dtype == "bf16":
        sc = sc.astype(jnp.bfloat16)
    sc_t = jnp.asarray(tile_quant_layout(sc, tile_n))
    x = jnp.ones((1, D), jnp.bfloat16)

    @jax.jit
    def loop(x):
        def step(h, _):
            out = quant_matmul(
                h, qw_t, sc_t, None, bits=4, symmetric=True,
                variant=variant, block_k=block_k,
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
        print(f"{variant:8s} W={tile_n:5d} BK={block_k:5d} sc={sc_dtype}: "
              f"{dt*1e6:7.0f} us  {wbytes/dt/1e9:5.0f} GB/s", flush=True)
    except Exception as e:
        print(f"{variant:8s} W={tile_n:5d} BK={block_k:5d} sc={sc_dtype}: "
              f"FAIL {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    import itertools
    for variant, tile_n, block_k in itertools.product(
        ("w4a8", "dequant", "group"), (1024, 2048, 4096), (2048, 4096)
    ):
        bench(variant, tile_n, block_k, "bf16")
    bench("w4a8", 2048, 1024, "f32")
    bench("w4a8", 4096, 1024, "f32")
    bench("gemv", 2048, 2048, "bf16")
