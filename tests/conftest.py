"""Test configuration: force an 8-device CPU JAX platform so mesh/sharding
tests run without TPU hardware (SURVEY.md §4.4).

Note: this environment's sitecustomize registers the `axon` TPU-tunnel PJRT
plugin and forces jax_platforms=axon programmatically, so the env var alone
is not enough — we must override the jax config before any backend init.
Running tests eagerly over the TPU tunnel is pathologically slow (each op is
a network round-trip), so CPU here is a correctness requirement, not a nicety.
"""

import os

# No persistent compilation cache under pytest: every test compiles tiny
# CPU programs in-process (cross-process persistence buys nothing), and
# XLA:CPU's executable DESERIALIZATION segfaults on cache hits for some
# large fused programs (observed deterministically on the speculative
# executor ~100 tests into the suite; jax-level bug — the entry bytes are
# whole and valid). Production keeps the cache (utils/compile_cache.py,
# with atomic entry writes).
os.environ["SCALELLM_COMPILE_CACHE"] = "0"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The suite compiles hundreds of XLA:CPU programs (every engine instance
    re-jits its buckets); past ~100 tests the accumulated LLVM JIT state
    made further compiles abort/segfault inside backend_compile_and_load
    (observed deterministically at test_speculative with unrelated diffs).
    Dropping the pjit caches (+ a gc pass to release executables held by
    discarded engines) keeps the JIT footprint bounded; tiny-model
    recompiles cost ms."""
    yield
    gc.collect()
    jax.clear_caches()
    gc.collect()
