"""Worker process for the multi-host ``jax.distributed`` test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
--process-id N ...`` with JAX_PLATFORMS=cpu and
``--xla_force_host_platform_device_count=2``, so two processes × two
virtual devices form a process-SPANNING 4-device mesh — the offline stand-in
for a multi-host TPU pod slice (ICI within a process, DCN across). This is
the TPU-native analogue of the reference's per-rank NCCL workers
(MToV/exps/diffusion.py:56-71: mp.spawn → init_process_group → DDP); here
one ``jax.distributed.initialize`` call replaces the rendezvous and the
collectives are compiled into the train step.

Not a pytest module — plain script; results go to --out as JSON.
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    # init_distributed MUST run before any jax backend touch (it asserts
    # this itself); keep jax imports below it out of paranoia.
    from moditalker_tpu.core.sharding import init_distributed

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import jax
    from jax.experimental import multihost_utils

    from moditalker_tpu.config import (MtovDiffusionConfig, MtovTrainConfig,
                                       MtovUNetConfig)
    from moditalker_tpu.core import sharding as shard_lib
    from moditalker_tpu.train.mtov import MtovDiffusionTrainer

    record = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }

    # One multihost_utils collective over the process-spanning mesh: every
    # rank contributes its id, everyone sees the full list (the reference's
    # implicit all_gather surface, e.g. eval-embedding gathers).
    ag = multihost_utils.process_allgather(
        np.array([args.process_id], np.int32))
    record["allgather"] = np.asarray(ag).ravel().tolist()

    # The real second-stage train step (same tiny config as
    # tests/test_mtov_train.py) on the GLOBAL 4-device mesh. Params
    # replicated, batch sharded along "data" — two rows live on this
    # process's devices, two on the peer's. The AdamW/EMA state update and
    # the gradient reduction run as one SPMD program across both processes.
    unet = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                          channel_mult=(1, 2), attention_resolutions=(1, 2),
                          num_heads=2, latent_res=4, latent_t=4)
    diff = MtovDiffusionConfig(timesteps=20, sampling_timesteps=4)
    train = MtovTrainConfig(batch_size=4, accum_iter=1, seed=7)

    mesh = shard_lib.make_mesh()
    assert mesh.devices.size == 4, mesh
    trainer = MtovDiffusionTrainer(unet, diff, train, mesh=mesh,
                                   latent_len=48)

    rng = np.random.default_rng(0)
    batch = {
        "z": np.tanh(rng.normal(size=(4, 4, 48))).astype(np.float32),
        "cond": rng.normal(size=(4, 8, 48)).astype(np.float32),
        "image_cond": rng.normal(size=(4, 4, 48)).astype(np.float32),
    }
    losses = []
    for _ in range(args.steps):
        metrics = trainer.step(batch)
        losses.append(float(metrics["loss"]))  # replicated → addressable
    record["losses"] = losses

    # Param fingerprint after the steps: sum over a replicated pytree is
    # itself replicated, so both ranks must report the identical value —
    # divergence here means the optimizer state desynced across processes.
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    record["param_sum"] = float(
        jax.jit(lambda ls: sum(x.astype("float32").sum() for x in ls))(
            leaves))

    with open(args.out, "w") as f:
        json.dump(record, f)
    print("WORKER_OK", args.process_id)


if __name__ == "__main__":
    main()
