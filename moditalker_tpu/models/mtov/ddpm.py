"""MToV latent DDPM: training loss + DDIM sampling over triplane latents.

Re-implements ``MToV/losses/ddpm.py:119-561`` on the shared diffusion core.
Linear β 0.0015→0.0195, T=1000, eps-parameterization, per-(C,L)-mean MSE
(ddpm.py:527), DDIM-100 eta 1 sampling and the partial-renoise
``ddim_sample_noised_start`` fast-AR path (ratio 0.25 → 25 steps/window).
The reference's classifier-free ``w`` plumbing is kept (its null path is
commented out upstream, ddpm.py:342-344 — we run the plain conditional model
when w == 0 and a doubled-batch CFG when w > 0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...config import MtovDiffusionConfig, MtovUNetConfig
from ...core import diffusion as dcore
from ...core import schedules
from .unet import TriplaneUNet


@dataclasses.dataclass(frozen=True)
class MtovDDPM:
    model: TriplaneUNet
    sched: schedules.DiffusionSchedule
    cfg: MtovDiffusionConfig

    @classmethod
    def create(
        cls,
        unet_cfg: MtovUNetConfig = MtovUNetConfig(),
        diff_cfg: MtovDiffusionConfig = MtovDiffusionConfig(),
        dtype=jnp.float32,
    ) -> "MtovDDPM":
        sched = schedules.make_schedule(
            diff_cfg.beta_schedule,
            diff_cfg.timesteps,
            linear_start=diff_cfg.linear_start,
            linear_end=diff_cfg.linear_end,
            cosine_s=diff_cfg.cosine_s,
            v_posterior=diff_cfg.v_posterior,
            parameterization=diff_cfg.parameterization,
        )
        return cls(model=TriplaneUNet(unet_cfg, dtype=dtype), sched=sched,
                   cfg=diff_cfg)

    # ------------------------------------------------------------ training
    def p_losses(self, params, key, x_start, cond, image_cond, *,
                 deterministic=True):
        """loss, dict — ref ddpm.py:508-541. x_start [B,4,2048] latents."""
        b = x_start.shape[0]
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.sched.num_timesteps)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_noisy = dcore.q_sample(self.sched, x_start, t, noise)
        model_out = self.model.apply(params, x_noisy, cond, image_cond, t,
                                     deterministic=deterministic)
        target = noise if self.cfg.parameterization == "eps" else x_start
        if self.cfg.loss_type == "l1":
            per = jnp.abs(model_out - target).mean(axis=(1, 2))
        else:
            per = ((model_out - target) ** 2).mean(axis=(1, 2))
        loss_simple = per.mean() * self.cfg.l_simple_weight
        loss_vlb = (self.sched.lvlb_weights[t] * per).mean()
        loss = loss_simple + self.cfg.original_elbo_weight * loss_vlb
        return loss, {"loss_simple": loss_simple, "loss_vlb": loss_vlb}

    # ------------------------------------------------------------ sampling
    def _model_fn(self, params, cond, image_cond):
        w = self.cfg.w

        def fn(x, t):
            if w == 0.0:
                return self.model.apply(params, x, cond, image_cond, t,
                                        deterministic=True)
            b = x.shape[0]
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
            ic2 = jnp.concatenate([image_cond, image_cond], axis=0)
            out = self.model.apply(params, x2, cond2, ic2, t2,
                                   deterministic=True)
            c, unc = out[:b], out[b:]
            return (1 + w) * c - w * unc

        return fn

    def ddim_sample(self, params, key, shape, cond, image_cond):
        return dcore.ddim_sample(
            self.sched,
            self._model_fn(params, cond, image_cond),
            shape,
            key,
            self.cfg.sampling_timesteps,
            eta=self.cfg.ddim_eta,
            parameterization=self.cfg.parameterization,
            clip_denoised=self.cfg.clip_denoised,
        )

    def ddim_sample_noised_start(self, params, key, x_start, cond, image_cond,
                                 ratio: float):
        """Fast AR windows: renoise a reference latent to t = T·ratio and
        denoise the schedule tail (ref ddpm.py:407-454)."""
        return dcore.ddim_sample_noised_start(
            self.sched,
            self._model_fn(params, cond, image_cond),
            x_start,
            key,
            self.cfg.sampling_timesteps,
            ratio,
            eta=self.cfg.ddim_eta,
            parameterization=self.cfg.parameterization,
            clip_denoised=self.cfg.clip_denoised,
        )

    def p_sample_loop(self, params, key, shape, cond, image_cond):
        """Full ancestral sampling — the reference's non-DDIM branch
        (ddpm.py:319-336, used when sampling_timesteps == timesteps)."""
        return dcore.p_sample_loop(
            self.sched,
            self._model_fn(params, cond, image_cond),
            shape, key,
            parameterization=self.cfg.parameterization,
            clip_denoised=self.cfg.clip_denoised)

    def sample(self, params, key, batch_size, cond, image_cond,
               noised_start=None, ratio=None, latent_len: int = 2048,
               channels: int = 4):
        """Dispatcher with the reference's ``sample`` semantics
        (ddpm.py:456-484): DDIM when sampling_timesteps < timesteps, else
        ancestral; optional partial-renoise fast start."""
        shape = (batch_size, channels, latent_len)
        if self.cfg.sampling_timesteps >= self.cfg.timesteps:
            return self.p_sample_loop(params, key, shape, cond, image_cond)
        if noised_start is not None:
            return self.ddim_sample_noised_start(
                params, key, noised_start, cond, image_cond, ratio)
        return self.ddim_sample(params, key, shape, cond, image_cond)
