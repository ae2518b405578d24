"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on forced host-platform devices
(the XLA 'fake backend'), per SURVEY.md §4. Must run before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
