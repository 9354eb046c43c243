"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY.md §4 we validate
kernels and sharding/collectives on XLA's host-platform virtual devices.

Note: this environment's site customisation registers a TPU PJRT plugin and
pins ``jax_platforms`` via ``jax.config`` at interpreter start, so setting the
``JAX_PLATFORMS`` env var is not enough — we must update the config after
import.  ``XLA_FLAGS`` still has to be in the environment before the CPU
backend initialises, which this import-time hook guarantees.
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
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
