"""Multi-HOST (multi-process) distributed execution — for real.

Prior rounds validated every sharded program on a forced 8-device CPU mesh
inside ONE process; the ``jax.distributed`` path (the DCN / multi-host leg
of SURVEY §2.6's comm-backend row, reference MToV/exps/diffusion.py:56-71)
had never executed. This test launches TWO actual OS processes, each with
two virtual CPU devices, rendezvous them through
``core.sharding.init_distributed`` (explicit coordinator — the CLI
``--coordinator`` path), builds the process-spanning 4-device mesh, runs
the real MToV second-stage train step over it for 3 steps, and asserts:

- both ranks see process_count=2, 4 global / 2 local devices;
- a ``multihost_utils.process_allgather`` returns [0, 1] on both ranks;
- the loss trajectory and post-step param fingerprint are IDENTICAL across
  ranks (optimizer state stayed in sync through the cross-process grad
  reduction);
- the trajectory matches a single-process 4-device run of the same step on
  the same batch (the multi-process mesh changes the wiring, not the math).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))
_STEPS = 3


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = dict(os.environ)
    # Must be set before interpreter start: sitecustomize imports jax and
    # would otherwise claim the single-client TPU tunnel / lock the
    # backend before jax.distributed.initialize runs.
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                        "--xla_backend_optimization_level=0")
    repo = os.path.dirname(_DIR)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch_workers(tmp, attempt: int):
    port = _free_port()
    env = _worker_env()
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"rank{pid}.attempt{attempt}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "multihost_worker.py"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(out), "--steps", str(_STEPS)],
            env=env, cwd=os.path.dirname(_DIR),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    ok = all(p.returncode == 0 for p in procs)
    return ok, logs, outs


@pytest.fixture(scope="module")
def worker_records(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    # One retry: the 2-process rendezvous + compile can exceed the worker
    # budget when the host is oversubscribed (observed with the full suite
    # + three background chip jobs sharing one vCPU); a genuine code
    # failure fails both attempts deterministically.
    try:
        ok, logs, outs = _launch_workers(tmp, 0)
    except subprocess.TimeoutExpired:
        ok, logs = False, ["attempt 0: worker timeout"]
    if not ok:
        ok, logs, outs = _launch_workers(tmp, 1)
    assert ok, "worker failed:\n" + "\n====\n".join(logs)
    return [json.loads(o.read_text()) for o in outs]


def test_two_process_mesh_topology(worker_records):
    for rec in worker_records:
        assert rec["process_count"] == 2
        assert rec["global_devices"] == 4
        assert rec["local_devices"] == 2


def test_multihost_allgather(worker_records):
    for rec in worker_records:
        assert rec["allgather"] == [0, 1]


def test_ranks_stay_in_sync(worker_records):
    r0, r1 = worker_records
    assert len(r0["losses"]) == _STEPS
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["param_sum"] == r1["param_sum"]


def test_matches_single_process_run(worker_records):
    """Same tiny config, same batch, same seed, single-process 4-device
    mesh (this pytest process has 8 virtual devices; use 4): the
    multi-process run must produce the same loss trajectory."""
    from moditalker_tpu.config import (MtovDiffusionConfig, MtovTrainConfig,
                                       MtovUNetConfig)
    from moditalker_tpu.core import sharding as shard_lib
    from moditalker_tpu.train.mtov import MtovDiffusionTrainer

    unet = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                          channel_mult=(1, 2), attention_resolutions=(1, 2),
                          num_heads=2, latent_res=4, latent_t=4)
    diff = MtovDiffusionConfig(timesteps=20, sampling_timesteps=4)
    train = MtovTrainConfig(batch_size=4, accum_iter=1, seed=7)
    trainer = MtovDiffusionTrainer(unet, diff, train,
                                   mesh=shard_lib.make_mesh(4),
                                   latent_len=48)
    rng = np.random.default_rng(0)
    batch = {
        "z": np.tanh(rng.normal(size=(4, 4, 48))).astype(np.float32),
        "cond": rng.normal(size=(4, 8, 48)).astype(np.float32),
        "image_cond": rng.normal(size=(4, 4, 48)).astype(np.float32),
    }
    ref = [float(trainer.step(batch)["loss"]) for _ in range(_STEPS)]
    np.testing.assert_allclose(worker_records[0]["losses"], ref,
                               rtol=2e-5, atol=1e-6)
