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

# Persistent compilation cache: the suite is compile-dominated (tiny tensor
# sizes, many distinct jitted programs), so re-runs hit the disk cache and
# skip XLA compilation entirely. Safe across processes; keyed on backend +
# device count, which the lines above pin.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert len(jax.devices()) == 8, (
    "test suite requires the 8-device virtual CPU backend; got "
    f"{jax.devices()}"
)
