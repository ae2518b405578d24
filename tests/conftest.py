"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on forced host-platform devices
(the XLA 'fake backend'), per SURVEY.md §4. The container's sitecustomize
pins JAX_PLATFORMS=axon (remote TPU tunnel), so we must override both the
env var and the live jax config before any backend is initialised.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, (
    "test suite requires the 8-device virtual CPU backend; got "
    f"{jax.devices()}"
)
