"""AToM Gaussian diffusion: x0-parameterized training loss and DDIM sampling.

Re-implements ``AToM/model/diffusion.py:40-550`` on the shared diffusion core:
cosine schedule, x0 prediction, 7.5·recon + 1.5·velocity loss (both
p2-weighted; gamma=0 in the shipped config so the weight is identity), DDIM-50
sampling with classifier-free guidance, and the long-form chunked sampling
with the temporal-overlap constraint ``x[1:, :half] = x[:-1, half:]``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AtomDiffusionConfig, AtomModelConfig
from ...core import diffusion as dcore
from ...core import schedules
from .decoder import MotionDecoder


@dataclasses.dataclass(frozen=True)
class AtomDiffusion:
    """Bundles the schedule, model definition and loss/sampling fns."""

    model: MotionDecoder
    sched: schedules.DiffusionSchedule
    cfg: AtomDiffusionConfig

    @classmethod
    def create(
        cls,
        model_cfg: AtomModelConfig = AtomModelConfig(),
        diff_cfg: AtomDiffusionConfig = AtomDiffusionConfig(),
        dtype=jnp.float32,
    ) -> "AtomDiffusion":
        sched = schedules.make_schedule(
            diff_cfg.schedule,
            diff_cfg.n_timesteps,
            p2_loss_weight_gamma=0.5 if diff_cfg.use_p2 else 0.0,
            parameterization="x0" if not diff_cfg.predict_epsilon else "eps",
        )
        return cls(model=MotionDecoder(model_cfg, dtype=dtype), sched=sched,
                   cfg=diff_cfg)

    # ------------------------------------------------------------ training
    def p_losses(self, params, key, x_start, face, cond, *, deterministic=False):
        """(total_loss, (recon, velocity)) — ref diffusion.py:412-440.

        ``x_start`` [B,T,204] is the landmark residual, ``face`` the identity
        keypoint broadcast over T, ``cond`` [B,2T,1024] HuBERT features.
        """
        cfg = self.cfg
        b = x_start.shape[0]
        k_t, k_noise, k_drop, k_dropout = jax.random.split(key, 4)
        t = jax.random.randint(k_t, (b,), 0, self.sched.num_timesteps)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy = dcore.q_sample(self.sched, x_start, t, noise)
        keep_mask = jax.random.uniform(k_drop, (b,)) >= cfg.cond_drop_prob

        rngs = {} if deterministic else {"dropout": k_dropout}
        model_out = self.model.apply(
            params, x_noisy, face, cond, t, keep_mask=keep_mask,
            deterministic=deterministic, rngs=rngs)

        target = noise if self.cfg.predict_epsilon else x_start

        def weighted_mse(pred, tgt):
            l = (pred - tgt) ** 2
            l = l.reshape(b, -1).mean(axis=-1)
            return (l * self.sched.p2_loss_weight[t]).mean()

        recon = weighted_mse(model_out, target)
        v_loss = weighted_mse(
            model_out[:, 1:] - model_out[:, :-1], target[:, 1:] - target[:, :-1]
        )
        total = cfg.recon_loss_weight * recon + cfg.velocity_loss_weight * v_loss
        return total, (recon, v_loss)

    # ------------------------------------------------------------ sampling
    def _guided_model_fn(self, params, face, cond, weight):
        """model_fn(x, t) doing CFG in one doubled-batch pass."""
        def fn(x, t, w=None):
            b = x.shape[0]
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            face2 = jnp.concatenate([face, face], axis=0)
            cond2 = jnp.concatenate([cond, cond], axis=0)
            keep = jnp.concatenate(
                [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0)
            out = self.model.apply(
                params, x2, face2, cond2, t2, keep_mask=keep,
                deterministic=True)
            unc, c = out[:b], out[b:]
            eff_w = weight if w is None else w
            return unc + (c - unc) * eff_w
        return fn

    def ddim_sample(self, params, key, shape, face, cond,
                    guidance_weight: float | None = None):
        """DDIM-50 with CFG (ref diffusion.py:212-250)."""
        w = self.cfg.guidance_weight if guidance_weight is None else guidance_weight
        return dcore.ddim_sample(
            self.sched,
            self._guided_model_fn(params, face, cond, w),
            shape,
            key,
            self.cfg.sampling_steps,
            eta=self.cfg.ddim_eta,
            parameterization="x0" if not self.cfg.predict_epsilon else "eps",
            clip_denoised=self.cfg.clip_denoised,
        )

    def long_ddim_sample(self, params, key, shape, face, cond):
        """Batched multi-chunk sampling with overlap constraint and
        guidance-weight ramp (ref diffusion.py:253-301)."""
        if shape[0] == 1:
            return self.ddim_sample(params, key, shape, face, cond)
        half = shape[1] // 2
        steps = self.cfg.sampling_steps
        weights = np.clip(
            np.linspace(0, self.cfg.guidance_weight * 2, steps),
            None, self.cfg.guidance_weight)

        def constraint(x, t):
            return x.at[1:, :half].set(x[:-1, half:])

        return dcore.ddim_sample(
            self.sched,
            self._guided_model_fn(params, face, cond, self.cfg.guidance_weight),
            shape,
            key,
            steps,
            eta=self.cfg.ddim_eta,
            parameterization="x0" if not self.cfg.predict_epsilon else "eps",
            clip_denoised=self.cfg.clip_denoised,
            post_step_fn=constraint,
            guidance_weights=weights,
        )

    def render_sample(self, params, key, shape, face, cond):
        """Thin sampling wrapper kept for reference API parity
        (diffusion.py:462-550 — visualization there is commented out)."""
        return self.ddim_sample(params, key, shape, face, cond)

    # ---------------------------------------------------- ancestral loops
    def _param_kind(self):
        return "x0" if not self.cfg.predict_epsilon else "eps"

    def p_sample_loop(self, params, key, shape, face, cond,
                      start_point: int | None = None, x_init=None,
                      post_step_fn=None):
        """Full ancestral sampling (ref diffusion.py:177-209)."""
        return dcore.p_sample_loop(
            self.sched,
            self._guided_model_fn(params, face, cond,
                                  self.cfg.guidance_weight),
            shape, key,
            parameterization=self._param_kind(),
            clip_denoised=self.cfg.clip_denoised,
            start_point=start_point, x_init=x_init,
            post_step_fn=post_step_fn)

    def inpaint_loop(self, params, key, shape, face, cond, mask, value,
                     start_point: int | None = None):
        """Masked inpainting: after every ancestral step, clamp the masked
        region to q_sample(value, t-1) (ref diffusion.py:303-340).
        ``mask``/``value``: [B, horizon, repr] (mask 1 = keep value)."""
        key, k_q = jax.random.split(key)

        def constraint(x, t):
            # fresh noise every ancestral step (ref diffusion.py:303-340 draws
            # torch.randn per step) — fold the (traced) timestep into the key
            n = jax.random.normal(jax.random.fold_in(k_q, t), x.shape, x.dtype)
            t_vec = jnp.maximum(
                jnp.full((x.shape[0],), t - 1, dtype=jnp.int32), 0)
            value_t = dcore.q_sample(self.sched, value, t_vec, n)
            return value_t * mask + (1.0 - mask) * x

        return self.p_sample_loop(params, key, shape, face, cond,
                                  start_point=start_point,
                                  post_step_fn=constraint)

    def long_inpaint_loop(self, params, key, shape, face, cond,
                          start_point: int | None = None):
        """Batched chunked ancestral sampling with the overlap constraint
        (ref diffusion.py:343-390)."""
        if shape[0] == 1:
            return self.p_sample_loop(params, key, shape, face, cond,
                                      start_point=start_point)
        half = shape[1] // 2

        def constraint(x, t):
            return x.at[1:, :half].set(x[:-1, half:])

        return self.p_sample_loop(params, key, shape, face, cond,
                                  start_point=start_point,
                                  post_step_fn=constraint)

    def noise_to_t(self, key, x, timestep: int):
        """q_sample x to a fixed timestep (ref diffusion.py:457-460)."""
        if timestep <= 0:
            return x
        t = jnp.full((x.shape[0],), timestep, dtype=jnp.int32)
        noise = jax.random.normal(key, x.shape, x.dtype)
        return dcore.q_sample(self.sched, x, t, noise)

    def partial_denoise(self, params, key, x, face, cond, timestep: int):
        """Renoise to t then ancestral-denoise (ref diffusion.py:453-455)."""
        k1, k2 = jax.random.split(key)
        x_noisy = self.noise_to_t(k1, x, timestep)
        return self.p_sample_loop(params, k2, x.shape, face, cond,
                                  start_point=timestep, x_init=x_noisy)
