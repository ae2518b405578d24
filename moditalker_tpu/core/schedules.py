"""Diffusion noise schedules and precomputed constant tables.

Shared by both model families (the reference computes these twice:
``MToV/losses/ddpm.py:79-263`` and ``AToM/model/utils.py:67-99`` +
``AToM/model/diffusion.py:64-111``). All tables are computed in float64 numpy
(matching the reference's ``torch.float64`` schedule construction) and stored
as float32 device arrays.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def linear_beta_schedule(
    n_timesteps: int, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    """``betas = linspace(sqrt(start), sqrt(end), T) ** 2`` (ref ddpm.py:81)."""
    return (
        np.linspace(linear_start**0.5, linear_end**0.5, n_timesteps, dtype=np.float64)
        ** 2
    )


def cosine_beta_schedule(n_timesteps: int, cosine_s: float = 8e-3) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (ref AToM/model/utils.py:78-86)."""
    timesteps = np.arange(n_timesteps + 1, dtype=np.float64) / n_timesteps + cosine_s
    alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
    alphas = alphas / alphas[0]
    betas = 1 - alphas[1:] / alphas[:-1]
    return np.clip(betas, 0, 0.999)


def sqrt_linear_beta_schedule(
    n_timesteps: int, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    return np.linspace(linear_start, linear_end, n_timesteps, dtype=np.float64)


def sqrt_beta_schedule(
    n_timesteps: int, linear_start: float = 1e-4, linear_end: float = 2e-2
) -> np.ndarray:
    return (
        np.linspace(linear_start, linear_end, n_timesteps, dtype=np.float64) ** 0.5
    )


_SCHEDULES = {
    "linear": linear_beta_schedule,
    "cosine": cosine_beta_schedule,
    "sqrt_linear": sqrt_linear_beta_schedule,
    "sqrt": sqrt_beta_schedule,
}


def make_beta_schedule(
    schedule: str,
    n_timesteps: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    if schedule == "cosine":
        return cosine_beta_schedule(n_timesteps, cosine_s)
    if schedule not in _SCHEDULES:
        raise ValueError(f"schedule '{schedule}' unknown")
    return _SCHEDULES[schedule](n_timesteps, linear_start, linear_end)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All per-timestep constant tables, as float32 jnp arrays of shape [T].

    A plain frozen dataclass of arrays: safe to close over inside ``jit``
    (constants get baked into the compiled program) and cheap to build once
    at setup.
    """

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray
    lvlb_weights: jnp.ndarray


def make_schedule(
    schedule: str = "linear",
    n_timesteps: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    given_betas: np.ndarray | None = None,
    v_posterior: float = 0.0,
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
    parameterization: str = "eps",
) -> DiffusionSchedule:
    """Build the full constant table set.

    Mirrors ``DDPM.register_schedule`` (MToV/losses/ddpm.py:195-264) and the
    AToM ``GaussianDiffusion.__init__`` buffers (AToM/model/diffusion.py:64-111).
    """
    if given_betas is not None:
        betas = np.asarray(given_betas, dtype=np.float64)
    else:
        betas = make_beta_schedule(
            schedule, n_timesteps, linear_start, linear_end, cosine_s
        )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    n_timesteps = int(betas.shape[0])

    posterior_variance = (
        (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        + v_posterior * betas
    )

    if parameterization == "eps":
        with np.errstate(divide="ignore"):
            # posterior_variance[0] == 0 → inf at t=0, overwritten below
            # (same as the reference, ddpm.py:256-262)
            lvlb_weights = betas**2 / (
                2 * posterior_variance * alphas * (1 - alphas_cumprod)
            )
    elif parameterization == "x0":
        # reference formula kept verbatim incl. its (2.0 * 1 - a) quirk
        # (ddpm.py:258) — unused on active paths (original_elbo_weight = 0)
        lvlb_weights = 0.5 * np.sqrt(alphas_cumprod) / (2.0 * 1 - alphas_cumprod)
    else:
        raise NotImplementedError(parameterization)
    lvlb_weights = np.asarray(lvlb_weights)
    lvlb_weights[0] = lvlb_weights[1]

    p2_loss_weight = (
        p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod)
    ) ** -p2_loss_weight_gamma

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        num_timesteps=n_timesteps,
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        p2_loss_weight=f32(p2_loss_weight),
        lvlb_weights=f32(lvlb_weights),
    )


def ddim_time_pairs(n_timesteps: int, sampling_steps: int) -> tuple[np.ndarray, np.ndarray]:
    """DDIM (t, t_next) pairs, descending.

    Matches ``torch.linspace(-1, T-1, steps+1).int()`` reversed and zipped
    (ddpm.py:372-376). Returns int32 arrays ``times`` (current t) and
    ``times_next`` (may contain -1 for the final x0 step).
    """
    times = np.linspace(-1, n_timesteps - 1, sampling_steps + 1)
    times = times.astype(np.int32)  # truncation toward zero, same as torch .int()
    times = times[::-1]
    return times[:-1].copy(), times[1:].copy()
