"""Checkpoint/resume semantics: a restored trainer continues bit-identically.

The reference resumes by loading state_dicts on rank 0 and relying on DDP
broadcast (SURVEY §5); here the whole {params, ema, opt_state, step} pytree
round-trips through orbax and training continues deterministically.
"""

import jax
import numpy as np

from moditalker_tpu.config import (AtomDiffusionConfig, AtomModelConfig,
                                   AtomTrainConfig)
from moditalker_tpu.core.checkpoint import CheckpointManager, host_tree
from moditalker_tpu.data.atom_dataset import synthetic_batch
from moditalker_tpu.train.atom import AtomTrainer, TrainState

SMALL = AtomModelConfig(horizon=8, latent_dim=32, ff_size=64,
                        num_layers=1, num_heads=2, dropout=0.0)
DIFF = AtomDiffusionConfig(n_timesteps=50, sampling_steps=2)
TRAIN = AtomTrainConfig(batch_size=8, learning_rate=1e-3, seed=7)


def _leaves_concat(tree):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)])


def test_save_restore_continue_identical(tmp_path):
    batch = synthetic_batch(batch_size=8, horizon=SMALL.horizon)

    t1 = AtomTrainer(SMALL, DIFF, TRAIN)
    for _ in range(3):
        t1.step(batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    saved = host_tree(t1.state._asdict())
    mgr.save(3, saved)

    # continue t1 two more steps
    m1 = [t1.step(batch) for _ in range(2)]

    # fresh trainer restores and continues with the same rng stream state:
    # feed it the same internal key t1 had at step 3
    t2 = AtomTrainer(SMALL, DIFF, TRAIN)
    restored = mgr.restore(3, template=saved)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = TrainState(**{k: restored[k] for k in
                          ("params", "ema_params", "opt_state", "step")})
    t2.state = jax.device_put(state, NamedSharding(t2.mesh, P()))
    # replay t1's key evolution: 3 splits from the initial key
    key = jax.random.PRNGKey(TRAIN.seed + 1)
    for _ in range(3):
        key, _ = jax.random.split(key)
    t2._key = key
    m2 = [t2.step(batch) for _ in range(2)]

    assert int(t2.state.step) == int(t1.state.step) == 5
    for a, b in zip(m1, m2):
        assert float(a["loss"]) == float(b["loss"])
    np.testing.assert_array_equal(
        _leaves_concat(t1.state.params), _leaves_concat(t2.state.params))
    np.testing.assert_array_equal(
        _leaves_concat(t1.state.ema_params),
        _leaves_concat(t2.state.ema_params))
    mgr.close()
