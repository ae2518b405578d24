"""AToM training: jitted SPMD train step + loop.

Replaces the reference harness (``AToM/AToM.py:32-236``: HF Accelerate DDP,
host-side EMA walks, Adan step in torch) with one jitted step that fuses
loss, Adan update and EMA onto the device, sharded over the ``data`` mesh
axis. Gradient reduction is XLA-inserted (no DDP wrapper).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AtomDiffusionConfig, AtomModelConfig, AtomTrainConfig
from ..core import sharding as shard_lib
from ..core.adan import adan
from ..core.ema import ema_update
from ..data.atom_dataset import training_arrays
from ..models.atom.diffusion import AtomDiffusion


class TrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def create_state(diff: AtomDiffusion, tx: optax.GradientTransformation,
                 key, model_cfg: AtomModelConfig) -> TrainState:
    b, t = 2, model_cfg.horizon
    x = jnp.zeros((b, t, model_cfg.repr_dim))
    face = jnp.zeros((b, t, model_cfg.repr_dim))
    cond = jnp.zeros((b, t * 2, model_cfg.cond_feature_dim))
    ts = jnp.zeros((b,), jnp.int32)
    params = jax.jit(diff.model.init)(key, x, face, cond, ts)
    return TrainState(
        params=params,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        step=jnp.zeros([], jnp.int32),
    )


def make_train_step(diff: AtomDiffusion, tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999, donate: bool = True):
    def train_step(state: TrainState, batch: dict, key) -> tuple[TrainState, dict]:
        def loss_fn(params):
            total, (recon, vel) = diff.p_losses(
                params, key, batch["residual"], batch["face"], batch["cond"],
                deterministic=False)
            return total, (recon, vel)

        (loss, (recon, vel)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, ema_decay)
        new_state = TrainState(params, ema_params, opt_state, state.step + 1)
        metrics = {"loss": loss, "recon": recon, "velocity": vel}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class AtomTrainer:
    """End-to-end trainer wiring mesh, state, data and checkpoints."""

    def __init__(
        self,
        model_cfg: AtomModelConfig = AtomModelConfig(),
        diff_cfg: AtomDiffusionConfig = AtomDiffusionConfig(),
        train_cfg: AtomTrainConfig = AtomTrainConfig(),
        mesh: Mesh | None = None,
        dtype=jnp.float32,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.diff = AtomDiffusion.create(model_cfg, diff_cfg, dtype=dtype)
        self.tx = adan(
            learning_rate=train_cfg.learning_rate,
            weight_decay=train_cfg.weight_decay,
        )
        self.mesh = mesh if mesh is not None else shard_lib.make_mesh()
        key = jax.random.PRNGKey(train_cfg.seed)
        self.state = create_state(self.diff, self.tx, key, model_cfg)
        # replicate state across the mesh
        rep = NamedSharding(self.mesh, P())
        self.state = jax.device_put(self.state, rep)
        self.train_step = make_train_step(
            self.diff, self.tx, train_cfg.ema_decay)
        self._key = jax.random.PRNGKey(train_cfg.seed + 1)

    def prepare_batch(self, batch: dict) -> dict:
        residual, face, cond = training_arrays(batch, self.model_cfg.horizon)
        dev = {
            "residual": residual.astype(np.float32),
            "face": face.astype(np.float32),
            "cond": cond.astype(np.float32),
        }
        return shard_lib.shard_batch(dev, self.mesh)

    def step(self, batch: dict) -> dict:
        self._key, sub = jax.random.split(self._key)
        dev_batch = self.prepare_batch(batch)
        self.state, metrics = self.train_step(self.state, dev_batch, sub)
        return metrics

    def fit(self, dataset, epochs: int | None = None, log_every: int = 100,
            ckpt_manager=None, ckpt_every: int = 2000, logger=None,
            stop=None, max_steps: int | None = None):
        """``stop``: optional ``core.preempt.GracefulStop`` — polled each
        step; on preemption the loop saves a final checkpoint and drains
        pending writes before returning. ``max_steps`` bounds total steps
        across epochs (None = epochs bound only)."""
        epochs = epochs if epochs is not None else self.train_cfg.epochs
        it = 0
        last_saved = None
        done = False
        for epoch in range(1, epochs + 1):
            if done or (stop is not None and stop.requested):
                break
            host_batches = (
                dict(zip(("residual", "face", "cond"),
                         training_arrays(b, self.model_cfg.horizon)))
                for b in dataset.iter_epoch(self.train_cfg.batch_size,
                                            seed=epoch))
            # background host prep (decode/collate) + double-buffered H2D
            for dev_batch in shard_lib.device_prefetch(
                    shard_lib.background_iter(host_batches), self.mesh):
                self._key, sub = jax.random.split(self._key)
                self.state, metrics = self.train_step(self.state, dev_batch,
                                                      sub)
                it += 1
                if logger is not None and it % log_every == 0:
                    logger.log_scalars(
                        it, {k: float(v) for k, v in metrics.items()})
                if ckpt_manager is not None and it % ckpt_every == 0:
                    ckpt_manager.save(it, self.state._asdict())
                    last_saved = it
                if ((stop is not None and stop.requested)
                        or (max_steps is not None and it >= max_steps)):
                    done = True
                    break
        if ckpt_manager is not None:
            if stop is not None and stop.requested and it != last_saved:
                ckpt_manager.save(it, self.state._asdict())
            ckpt_manager.wait()  # async saves: durability barrier at exit
        return self.state
