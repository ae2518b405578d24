"""Driver entry-point contract: dryrun_multichip on the virtual CPU mesh."""

import sys


def test_dryrun_multichip_8():
    # n=8 is the driver's exact call; other mesh sizes (1/2/4) are covered
    # through the real pipeline entries by tests/test_pipeline_sharding.py
    # and the 2D-mesh TP primitives by tests/test_parallel.py — a second
    # in-process dry run at n=4 re-traced the full trainer for ~24 s of
    # suite time without new coverage.
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Reproduce the driver's calling pattern that was red in rounds 1-2.

    The driver initializes jax on a 1-device default backend FIRST (the
    single-chip axon tunnel), then sets JAX_PLATFORMS=cpu + the forced-8
    XLA flag in os.environ (too late — the backend is cached), then calls
    dryrun_multichip(8). Round 2's guard consulted jax.devices("cpu")
    (which honoured the late env vars) while the mesh used jax.devices()
    (the cached 1-device default) → "need 8 devices, backend exposes 1"
    (VERDICT r2 #1). This test runs that exact sequence in a subprocess —
    1-device default backend, late env mutation — and asserts success.
    """
    import os
    import subprocess

    code = """
import os, sys
sys.path.insert(0, "/root/repo")
# 1) jax initializes on a 1-device default backend (simulates the axon chip)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
assert len(jax.devices()) == 1, jax.devices()
# 2) driver applies the cpu/8-device env AFTER the backend is cached
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
# 3) the call that must now succeed via the subprocess path
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("DRIVER_ENV_OK")
"""
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "_MODITALKER_MC_CHILD")
    }
    # The axon sitecustomize hook claims the single-client TPU tunnel at
    # interpreter startup when PALLAS_AXON_POOL_IPS is set. The subprocess
    # must NOT touch the tunnel: the 1-device default backend is simulated
    # with XLA flags, and a real claim attempt deadlocks behind the parent
    # pytest process's own claim (single-client relay).
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_ENV_OK" in proc.stdout, proc.stdout
