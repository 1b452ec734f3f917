"""All_to_all expert-parallel MoE dispatcher (layers/moe.moe_mlp_a2a) on the
8-device CPU mesh: tokens data-sharded over a dedicated expert axis, experts
sharded over the same axis, must reproduce the single-device dense MoE
(reference: src/layers/moe/alltoall_token_dispatcher.h:12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scalellm_tpu.layers.moe import moe_mlp, moe_mlp_a2a


def _make_weights(rng, D, F, E):
    router = rng.normal(size=(D, E)).astype(np.float32)
    gate = rng.normal(size=(E, D, F)).astype(np.float32) * 0.2
    up = rng.normal(size=(E, D, F)).astype(np.float32) * 0.2
    down = rng.normal(size=(E, F, D)).astype(np.float32) * 0.2
    return router, gate, up, down


def _run_a2a(x, router, gate, up, down, top_k, ep, **kw):
    mesh = Mesh(np.array(jax.devices()[:ep]), ("ep",))
    fn = jax.jit(
        jax.shard_map(
            lambda xx, r, g, u, d: moe_mlp_a2a(
                xx, r, g, u, d, top_k=top_k, ep_axis="ep", **kw
            ),
            mesh=mesh,
            in_specs=(P("ep"), P(), P("ep"), P("ep"), P("ep")),
            out_specs=P("ep"),
        )
    )
    with mesh:
        return np.asarray(fn(x, router, gate, up, down))


@pytest.mark.parametrize("top_k,norm", [(2, False), (1, False), (2, True)])
def test_a2a_matches_dense(top_k, norm):
    rng = np.random.default_rng(0)
    D, F, E, T, ep = 16, 32, 8, 24, 8
    router, gate, up, down = _make_weights(rng, D, F, E)
    x = rng.normal(size=(T, D)).astype(np.float32)

    ref = np.asarray(
        moe_mlp(
            jnp.asarray(x), jnp.asarray(router), jnp.asarray(gate),
            jnp.asarray(up), jnp.asarray(down), top_k=top_k,
            norm_topk_prob=norm,
        )
    )
    out = _run_a2a(x, router, gate, up, down, top_k, ep, norm_topk_prob=norm)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_a2a_skewed_routing():
    """All tokens route to the experts of one shard — exercises the
    worst-case receive capacity (no drops allowed)."""
    rng = np.random.default_rng(1)
    D, F, E, T, ep = 16, 32, 8, 32, 8
    router, gate, up, down = _make_weights(rng, D, F, E)
    # Bias the router so experts 2 and 3 (both on shard owning them when
    # E_local=1: shards 2 and 3) win every top-2.
    router[:, 2] += 50.0
    router[:, 3] += 40.0
    x = rng.normal(size=(T, D)).astype(np.float32)

    ref = np.asarray(
        moe_mlp(
            jnp.asarray(x), jnp.asarray(router), jnp.asarray(gate),
            jnp.asarray(up), jnp.asarray(down), top_k=2,
        )
    )
    out = _run_a2a(x, router, gate, up, down, 2, ep)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_a2a_multi_expert_per_shard():
    """E_local > 1 (ep=4, E=8): the shard-chunk + within-chunk expert sort
    and the local remap must still group rows correctly."""
    rng = np.random.default_rng(2)
    D, F, E, T, ep = 16, 32, 8, 16, 4
    router, gate, up, down = _make_weights(rng, D, F, E)
    x = rng.normal(size=(T, D)).astype(np.float32)

    ref = np.asarray(
        moe_mlp(
            jnp.asarray(x), jnp.asarray(router), jnp.asarray(gate),
            jnp.asarray(up), jnp.asarray(down), top_k=2,
        )
    )
    out = _run_a2a(x, router, gate, up, down, 2, ep)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
