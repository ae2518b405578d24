"""AToM train step: loss decreases, EMA moves, state is donated/sharded."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from moditalker_tpu.config import (AtomDiffusionConfig, AtomModelConfig,
                                   AtomTrainConfig)
from moditalker_tpu.data.atom_dataset import (AtomSequenceDataset,
                                              batch_by_size, synthetic_batch,
                                              training_arrays)
from moditalker_tpu.data.indexed import IndexedReader, IndexedWriter
from moditalker_tpu.train.atom import AtomTrainer

SMALL = AtomModelConfig(horizon=8, latent_dim=32, ff_size=64,
                        num_layers=1, num_heads=2, dropout=0.0)
DIFF = AtomDiffusionConfig(n_timesteps=50, sampling_steps=4)
TRAIN = AtomTrainConfig(batch_size=8, learning_rate=1e-3)


def test_train_step_runs_and_loss_drops():
    trainer = AtomTrainer(SMALL, DIFF, TRAIN)
    batch = synthetic_batch(batch_size=8, horizon=SMALL.horizon)
    losses = []
    for _ in range(12):
        m = trainer.step(batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_state_sharded_over_mesh():
    trainer = AtomTrainer(SMALL, DIFF, TRAIN)
    batch = synthetic_batch(batch_size=8, horizon=SMALL.horizon)
    dev = trainer.prepare_batch(batch)
    # batch sharded over 8 devices, params replicated
    assert len(dev["residual"].sharding.device_set) == 8
    assert int(trainer.state.step) == 0
    trainer.step(batch)
    assert int(trainer.state.step) == 1


def test_training_arrays_residual():
    batch = synthetic_batch(batch_size=2, horizon=8)
    residual, face, cond = training_arrays(batch, 8)
    np.testing.assert_allclose(residual[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(
        face[:, 3], batch["idexp_lm3d"][:, 0], atol=1e-6)
    assert cond.shape[1] == 16


def test_batch_by_size_buckets():
    sizes = [10, 10, 50, 50, 50, 100]
    batches = batch_by_size(list(range(6)), sizes, batch_size=4,
                            max_tokens=120)
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(6))
    for b in batches:
        longest = max(sizes[i] for i in b)
        assert longest * len(b) <= 120 or len(b) == 1


def test_indexed_roundtrip(tmp_path):
    path = str(tmp_path / "train")
    w = IndexedWriter(path, index_size=4096)
    items = [{"a": np.arange(5) + i, "item_id": f"id{i}"} for i in range(7)]
    for i, item in enumerate(items):
        w.add_item(item, id=f"id{i}")
    w.finalize()
    r = IndexedReader(path)
    assert len(r) == 7
    np.testing.assert_array_equal(r[3]["a"], items[3]["a"])
    np.testing.assert_array_equal(r["id5"]["a"], items[5]["a"])


def test_indexed_reference_compat(tmp_path):
    """Our writer's files load with the reference reader and vice versa."""
    import pytest

    from . import ref_oracle

    if not ref_oracle.has_reference():
        pytest.skip("no reference")
    ref_idx = ref_oracle.import_atom_module("data_util.indexed_datasets")

    # ours -> reference reader
    path = str(tmp_path / "ours")
    w = IndexedWriter(path, index_size=4096)
    w.add_item({"x": np.ones(3)})
    w.finalize()
    ds = ref_idx.IndexedDataset(path)
    np.testing.assert_array_equal(ds[0]["x"], np.ones(3))

    # reference builder -> our reader
    path2 = str(tmp_path / "theirs")
    b = ref_idx.IndexedDatasetBuilder(path2, default_idx_size=4096)
    b.add_item({"y": np.full(4, 7.0)})
    b.finalize()
    r = IndexedReader(path2)
    np.testing.assert_array_equal(r[0]["y"], np.full(4, 7.0))
