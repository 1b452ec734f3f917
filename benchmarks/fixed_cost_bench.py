"""Decompose the b=1 decode step's FIXED cost (everything outside the
32 decoder layers): int4 lm_head matmul, argmax sampling, embed lookup.

Device-side lax.scan loops (eager ops over the axon tunnel are ~1ms each,
see CLAUDE.md); results fetched via np.asarray.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from scalellm_tpu.ops.quant_matmul import quant_matmul, tile_quant_layout

D, V, G = 4096, 128256, 128
STEPS = 64


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (3 * STEPS)


def main():
    key = jax.random.PRNGKey(0)
    # int4 lm_head in the tiled layout the loader produces.
    Vp = ((V + 2047) // 2048) * 2048
    qw_t = jnp.asarray(tile_quant_layout(np.zeros((D // 2, Vp), np.int8)))
    sc_t = jnp.asarray(
        tile_quant_layout(np.ones((D // G, Vp), np.float32).astype(jnp.bfloat16))
    )
    x = jax.random.normal(key, (1, D), jnp.bfloat16)

    @jax.jit
    def lm_head_loop(x):
        def step(h, _):
            logits = quant_matmul(h, qw_t, sc_t, None, bits=4, symmetric=True)
            # feed back so scan can't elide iterations
            h2 = h + logits[:, :1].astype(jnp.bfloat16) * 0
            return h2, logits[0, 0]

        _, outs = jax.lax.scan(step, x, jnp.arange(STEPS))
        return outs

    @jax.jit
    def lm_head_argmax_loop(x):
        def step(h, _):
            logits = quant_matmul(h, qw_t, sc_t, None, bits=4, symmetric=True)
            logits = logits.astype(jnp.float32)[:, :V]
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            h2 = h + tok[0].astype(jnp.bfloat16) * 0
            return h2, tok

        _, outs = jax.lax.scan(step, x, jnp.arange(STEPS))
        return outs

    logits = jnp.zeros((1, V), jnp.float32)

    @jax.jit
    def argmax_loop(lg):
        def step(c, _):
            tok = jnp.argmax(lg + c, axis=-1).astype(jnp.float32)
            return c + tok[0] * 0, tok

        _, outs = jax.lax.scan(step, jnp.zeros(()), jnp.arange(STEPS))
        return outs

    emb = jnp.zeros((V, D), jnp.bfloat16)

    @jax.jit
    def embed_loop(t0):
        def step(t, _):
            h = emb[t]
            t2 = (t + h[0].astype(jnp.int32) * 0) % V
            return t2, h[0]

        _, outs = jax.lax.scan(step, t0, jnp.arange(STEPS))
        return outs

    # Streamed-DMA variant: same weights as a 1-layer stack.
    qw_s = qw_t[None]
    sc_s = sc_t[None]

    @jax.jit
    def lm_head_stream_loop(x):
        def step(h, _):
            logits = quant_matmul(
                h, qw_s, sc_s, None, bits=4, symmetric=True,
                layer=jnp.zeros((), jnp.int32),
            )
            h2 = h + logits[:, :1].astype(jnp.bfloat16) * 0
            return h2, logits[0, 0]

        _, outs = jax.lax.scan(step, x, jnp.arange(STEPS))
        return outs

    @jax.jit
    def empty_loop(x):
        def step(h, _):
            return h + 0, h[0, 0]

        _, outs = jax.lax.scan(step, x, jnp.arange(STEPS))
        return outs

    t_empty = timeit(empty_loop, x)
    print(f"empty scan step: {t_empty*1e6:.0f} us")
    t_lms = timeit(lm_head_stream_loop, x)
    wbytes = qw_t.size + sc_t.size * 2
    print(f"lm_head STREAMED: {t_lms*1e6:.0f} us ({wbytes/t_lms/1e9:.0f} GB/s)")
    t_lm = timeit(lm_head_loop, x)
    t_lm_am = timeit(lm_head_argmax_loop, x)
    t_am = timeit(argmax_loop, logits)
    t_emb = timeit(embed_loop, jnp.zeros((1,), jnp.int32)[0])
    wbytes = qw_t.size + sc_t.size * 2
    print(f"lm_head int4 [1,{D}]x[{D},{Vp}]: {t_lm*1e6:.0f} us "
          f"({wbytes/t_lm/1e9:.0f} GB/s)")
    print(f"lm_head+argmax: {t_lm_am*1e6:.0f} us")
    print(f"argmax [1,{V}] f32: {t_am*1e6:.0f} us")
    print(f"embed row lookup: {t_emb*1e6:.0f} us")


if __name__ == "__main__":
    main()
