"""MToV first-stage (autoencoder + GAN) training.

Re-implements ``MToV/tools/trainer.py:first_stage_train`` (:134-265) and
``first_stage_x_l_train`` (:268-...) as two jitted SPMD steps (generator /
discriminator) with optax.MultiSteps gradient accumulation (accum_iter 3,
ref :149). The host loop alternates G/D phases every accumulation cycle once
``disc_start`` is reached (ref :226-230), exactly like the reference.

Differences from the reference, by design:
  * no AMP GradScaler — bf16 on TPU needs no loss scaling;
  * discriminator grad clipping is per-discriminator global-norm 1.0 like the
    reference (ref :219-220);
  * BatchNorm always uses batch statistics (the reference never leaves train
    mode for the discriminators), so running averages are not tracked.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MtovAEConfig, MtovLossConfig, MtovTrainConfig
from ..core import sharding as shard_lib
from ..models.mtov.autoencoder import ViTAutoencoder
from ..models.mtov.losses import (LPIPS, PatchDiscriminator2D,
                                  PatchDiscriminator3D, adopt_weight,
                                  hinge_d_loss, select_random_frame)


class FirstStageState(NamedTuple):
    ae_params: Any
    disc2d: Any
    disc3d: Any
    lpips_params: Any          # frozen
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


def _clip_by_global_norm(tree, max_norm: float):
    g_norm = optax.global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
    return jax.tree_util.tree_map(lambda t: t * scale, tree)


class FirstStageTrainer:
    def __init__(
        self,
        ae_cfg: MtovAEConfig = MtovAEConfig(),
        loss_cfg: MtovLossConfig = MtovLossConfig(),
        train_cfg: MtovTrainConfig = MtovTrainConfig(),
        mesh: Mesh | None = None,
        lpips_params: Any = None,
        freeze_decoder: bool = False,
        dtype=jnp.float32,
    ):
        self.ae_cfg = ae_cfg
        self.loss_cfg = loss_cfg
        self.train_cfg = train_cfg
        self.freeze_decoder = freeze_decoder
        self.mesh = mesh if mesh is not None else shard_lib.make_mesh()
        self.ae = ViTAutoencoder(ae_cfg, dtype=dtype)
        self.lpips = LPIPS(dtype=dtype)
        self.disc2d = PatchDiscriminator2D(
            ndf=loss_cfg.disc_ndf, n_layers=loss_cfg.disc_layers, dtype=dtype)
        self.disc3d = PatchDiscriminator3D(
            ndf=loss_cfg.disc_ndf, n_layers=loss_cfg.disc_layers, dtype=dtype)

        key = jax.random.PRNGKey(train_cfg.seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        t, r = ae_cfg.timesteps, ae_cfg.resolution
        x = jnp.zeros((1, t, r, r, 3))
        frame = jnp.zeros((1, r, r, 3))
        ae_params = jax.jit(self.ae.init)(k1, x)
        d2 = jax.jit(self.disc2d.init)(k2, frame)
        d3 = jax.jit(self.disc3d.init)(k3, x)
        if lpips_params is None:
            lpips_params = jax.jit(self.lpips.init)(k4, frame, frame)
        self.lpips_params = lpips_params

        accum = train_cfg.accum_iter
        base_g = optax.adamw(train_cfg.lr, b1=train_cfg.ae_betas[0],
                             b2=train_cfg.ae_betas[1])
        if freeze_decoder:
            # first_stage_x_l_train freezes the decoder/to_pixel branch
            def label_fn(params):
                def mark(path, _):
                    names = {p.key for p in path if hasattr(p, "key")}
                    frozen = names.intersection({"decoder", "to_pixel"})
                    return "freeze" if frozen else "train"
                return jax.tree_util.tree_map_with_path(mark, params)
            base_g = optax.multi_transform(
                {"train": base_g, "freeze": optax.set_to_zero()}, label_fn)
        self.g_tx = optax.MultiSteps(base_g, every_k_schedule=accum)
        self.d_tx = optax.MultiSteps(
            optax.adamw(train_cfg.lr, b1=train_cfg.ae_betas[0],
                        b2=train_cfg.ae_betas[1]),
            every_k_schedule=accum)

        state = FirstStageState(
            ae_params=ae_params,
            disc2d=d2,
            disc3d=d3,
            lpips_params=lpips_params,
            g_opt=self.g_tx.init(ae_params),
            d_opt=self.d_tx.init({"d2": d2, "d3": d3}),
            step=jnp.zeros([], jnp.int32),
        )
        self.state = jax.device_put(state, NamedSharding(self.mesh, P()))
        self._g_step = jax.jit(self._make_g_step(), donate_argnums=(0,))
        self._d_step = jax.jit(self._make_d_step(), donate_argnums=(0,))
        self._key = jax.random.PRNGKey(train_cfg.seed + 1)
        self._it = 0
        self._disc_phase = False

    # ------------------------------------------------------------ G step
    def _make_g_step(self):
        lcfg = self.loss_cfg

        def g_step(state: FirstStageState, video, key):
            b = video.shape[0]
            frame_idx = jax.random.randint(
                key, (b,), 0, self.ae_cfg.timesteps)

            def loss_fn(ae_params):
                recon, _ = self.ae.apply(ae_params, video)
                rec_loss = lcfg.pixelloss_weight * jnp.abs(
                    video - recon).mean()
                in_2d = select_random_frame(video, frame_idx)
                re_2d = select_random_frame(recon, frame_idx)
                p_loss = lcfg.perceptual_weight * self.lpips.apply(
                    state.lpips_params, in_2d, re_2d).mean()

                # reference gates the loss terms on the RAW iteration
                # (trainer.py:186-190 passes global_step=it to adopt_weight)
                # while the phase flip below divides by accum — an
                # inconsistency the reference trained with; reproduce it
                disc_factor = adopt_weight(state.step, lcfg.disc_start)
                (lf2, pf2), _ = self.disc2d.apply(
                    state.disc2d, re_2d, train=True, mutable=["batch_stats"])
                (lf3, pf3), _ = self.disc3d.apply(
                    state.disc3d, recon, train=True, mutable=["batch_stats"])
                (lr2, pr2), _ = self.disc2d.apply(
                    state.disc2d, in_2d, train=True, mutable=["batch_stats"])
                (lr3, pr3), _ = self.disc3d.apply(
                    state.disc3d, video, train=True, mutable=["batch_stats"])
                g_loss = -disc_factor * lcfg.disc_weight * (
                    jnp.mean(lf2) + jnp.mean(lf3))
                feat = 0.0
                for fke, fre in zip(pf2[:-1], pr2[:-1]):
                    feat += jnp.abs(fke - jax.lax.stop_gradient(fre)).mean()
                for fke, fre in zip(pf3[:-1], pr3[:-1]):
                    feat += jnp.abs(fke - jax.lax.stop_gradient(fre)).mean()
                feat_loss = disc_factor * lcfg.gan_feat_weight * feat
                total = rec_loss + p_loss + g_loss + feat_loss
                return total, {"rec": rec_loss, "perceptual": p_loss,
                               "g": g_loss, "feat": feat_loss}

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.ae_params)
            updates, g_opt = self.g_tx.update(grads, state.g_opt,
                                              state.ae_params)
            ae_params = optax.apply_updates(state.ae_params, updates)
            new = state._replace(ae_params=ae_params, g_opt=g_opt,
                                 step=state.step + 1)
            return new, {"ae_loss": loss, **aux}

        return g_step

    # ------------------------------------------------------------ D step
    def _make_d_step(self):
        lcfg = self.loss_cfg

        def d_step(state: FirstStageState, video, key):
            b = video.shape[0]
            frame_idx = jax.random.randint(
                key, (b,), 0, self.ae_cfg.timesteps)
            recon, _ = self.ae.apply(state.ae_params, video)
            recon = jax.lax.stop_gradient(recon)
            in_2d = select_random_frame(video, frame_idx)
            re_2d = select_random_frame(recon, frame_idx)

            def loss_fn(disc_params):
                (lr2, _), _ = self.disc2d.apply(
                    disc_params["d2"], in_2d, train=True,
                    mutable=["batch_stats"])
                (lf2, _), _ = self.disc2d.apply(
                    disc_params["d2"], re_2d, train=True,
                    mutable=["batch_stats"])
                (lr3, _), _ = self.disc3d.apply(
                    disc_params["d3"], video, train=True,
                    mutable=["batch_stats"])
                (lf3, _), _ = self.disc3d.apply(
                    disc_params["d3"], recon, train=True,
                    mutable=["batch_stats"])
                disc_factor = adopt_weight(state.step, lcfg.disc_start)
                return disc_factor * lcfg.disc_weight * (
                    hinge_d_loss(lr2, lf2) + hinge_d_loss(lr3, lf3))

            disc_params = {"d2": state.disc2d, "d3": state.disc3d}
            loss, grads = jax.value_and_grad(loss_fn)(disc_params)
            # per-discriminator global-norm clip (ref trainer.py:219-220)
            grads = {"d2": _clip_by_global_norm(grads["d2"], 1.0),
                     "d3": _clip_by_global_norm(grads["d3"], 1.0)}
            updates, d_opt = self.d_tx.update(grads, state.d_opt, disc_params)
            newp = optax.apply_updates(disc_params, updates)
            new = state._replace(disc2d=newp["d2"], disc3d=newp["d3"],
                                 d_opt=d_opt, step=state.step + 1)
            return new, {"d_loss": loss}

        return d_step

    # ------------------------------------------------------------ loop API
    def step(self, video) -> dict:
        """One iteration with the reference's G/D phase alternation."""
        accum = self.train_cfg.accum_iter
        self._key, sub = jax.random.split(self._key)
        dev = shard_lib.shard_batch({"v": jnp.asarray(video)}, self.mesh)["v"]
        if not self._disc_phase:
            self.state, metrics = self._g_step(self.state, dev, sub)
        else:
            self.state, metrics = self._d_step(self.state, dev, sub)
        it = self._it
        # phase flip: it//accum vs disc_start (trainer.py:226-230) — NOT the
        # same unit as adopt_weight above; reference semantics kept verbatim
        if it % accum == accum - 1 and it // accum >= self.loss_cfg.disc_start:
            self._disc_phase = not self._disc_phase
        self._it += 1
        return metrics

    def fit(self, batches, max_steps: int, logger=None, ckpt_manager=None,
            eval_every: int = 2000, eval_fn=None, log_every: int = 50,
            stop=None):
        """Training loop with the reference's probe/checkpoint cadence
        (trainer.py:232-257: PSNR/rFVD probes + full state save every
        2000 iters). ``batches`` yields dicts with 'x' (or 'x_l').
        ``stop``: optional ``core.preempt.GracefulStop`` — polled each step;
        on preemption a final checkpoint is saved and drained."""
        last_saved = None
        it = self._it
        from ..core import sharding as shard_lib

        # background host prep: JPEG decode/rasterize batch k+1 during step k
        for batch in shard_lib.background_iter(batches):
            video = batch["x_l" if self.freeze_decoder else "x"]
            metrics = self.step(video)
            it = self._it
            if logger is not None and it % log_every == 0:
                logger.log_scalars(it, {k: float(v)
                                        for k, v in metrics.items()})
            if it % eval_every == 0 and it > 0:
                if eval_fn is not None and logger is not None:
                    logger.log_scalars(it, eval_fn(self))
                if ckpt_manager is not None:
                    from ..core.checkpoint import host_tree

                    ckpt_manager.save(it, host_tree(self.state._asdict()))
                    last_saved = it
            if it >= max_steps or (stop is not None and stop.requested):
                break
        if ckpt_manager is not None:
            if stop is not None and stop.requested and it != last_saved:
                from ..core.checkpoint import host_tree

                ckpt_manager.save(it, host_tree(self.state._asdict()))
            ckpt_manager.wait()  # async saves: durability barrier at exit
        return self.state
