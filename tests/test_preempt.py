"""Graceful preemption: a signal mid-fit saves a final checkpoint at the
preempted step and drains async writes (core/preempt.py; SURVEY.md §5 —
the reference has no preemption story)."""

import os
import signal

import numpy as np

from moditalker_tpu.config import (MtovAEConfig, MtovLossConfig,
                                   MtovTrainConfig)
from moditalker_tpu.core.checkpoint import CheckpointManager
from moditalker_tpu.core.preempt import GracefulStop
from moditalker_tpu.train.mtov_first_stage import FirstStageTrainer

AE_TINY = MtovAEConfig(channels=32, resolution=32, timesteps=4, depth=1,
                       heads=2, dim_head=8, quant_depth=1, quant_heads=2,
                       quant_mlp_dim=16, down=3)
LOSS = MtovLossConfig(disc_start=10**8, disc_ndf=8, disc_layers=1)
TRAIN = MtovTrainConfig(batch_size=2, accum_iter=1)


def _mesh1():
    from moditalker_tpu.core import sharding as shard_lib

    return shard_lib.make_mesh(1)


def _batches(stop, preempt_at):
    rng = np.random.default_rng(0)
    i = 0
    while True:
        i += 1
        if i == preempt_at:
            # deliver a real signal mid-training (the latch handler runs
            # in the main thread between bytecodes)
            os.kill(os.getpid(), signal.SIGTERM)
        yield {"x": rng.uniform(-1, 1, (2, 4, 32, 32, 3)).astype(np.float32)}


def test_sigterm_saves_final_checkpoint(tmp_path):
    trainer = FirstStageTrainer(AE_TINY, LOSS, TRAIN, mesh=_mesh1())
    before = signal.getsignal(signal.SIGTERM)
    stop = GracefulStop().install(signals=(signal.SIGTERM,))
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state = trainer.fit(_batches(stop, preempt_at=3), max_steps=10**6,
                        ckpt_manager=ckpt, eval_every=10**6, stop=stop)
    # the loop must have stopped near the preempted step, not max_steps
    # (the background prefetcher runs the generator ahead of the consumer,
    # so the signal can land 1-2 steps before the consumer reaches item 3)
    it = int(state.step)
    assert 1 <= it <= 4, it
    assert ckpt.latest_step() == it
    restored = ckpt.restore(template=trainer.host_state_template()
                            if hasattr(trainer, "host_state_template")
                            else None)
    assert restored is not None
    assert int(np.asarray(restored["step"])) == it
    # first delivery restored whatever handler was installed before ours
    # (SIG_DFL standalone; pytest plugins may own it in a full-suite run)
    assert signal.getsignal(signal.SIGTERM) == before


def test_graceful_stop_request_programmatic(tmp_path):
    trainer = FirstStageTrainer(AE_TINY, LOSS, TRAIN, mesh=_mesh1())
    stop = GracefulStop()
    rng = np.random.default_rng(1)

    def batches():
        n = 0
        while True:
            n += 1
            if n == 2:
                stop.request()
            yield {"x": rng.uniform(-1, 1, (2, 4, 32, 32, 3)).astype(
                np.float32)}

    state = trainer.fit(batches(), max_steps=10**6, stop=stop)
    assert int(state.step) <= 3
