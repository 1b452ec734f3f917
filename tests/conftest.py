"""Test configuration: force an 8-device CPU JAX platform so mesh/sharding
tests run without TPU hardware (SURVEY.md §4.4).

Note: this environment's sitecustomize registers the `axon` TPU-tunnel PJRT
plugin and forces jax_platforms=axon programmatically, so the env var alone
is not enough — we must override the jax config before any backend init.
Running tests eagerly over the TPU tunnel is pathologically slow (each op is
a network round-trip), so CPU here is a correctness requirement, not a nicety.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
