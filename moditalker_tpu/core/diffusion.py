"""Shared Gaussian-diffusion math: q/p transforms and scan-based DDIM samplers.

This is the single diffusion core used by both AToM (x0-parameterized,
``AToM/model/diffusion.py``) and MToV (eps-parameterized,
``MToV/losses/ddpm.py``). On TPU the denoising loop is a ``lax.scan`` over a
static table of (t, t_next) pairs — one compiled program regardless of step
count, no host round trips per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule, ddim_time_pairs

# A model function for sampling: (x, t_int32[B]) -> model_output (same shape
# as x). Conditioning is closed over by the caller.
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch timestep constants and reshape to broadcast.

    ``table``: [T], ``t``: int [B] → [B, 1, ..., 1] with `ndim` total dims.
    (ref ``extract_into_tensor``, ddpm.py:100-103)
    """
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Diffuse x0 to x_t (ref ddpm.py:486-491)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def predict_start_from_noise(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * noise
    )


def predict_noise_from_start(
    sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray
) -> jnp.ndarray:
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def q_posterior(
    sched: DiffusionSchedule, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
):
    """Posterior q(x_{t-1} | x_t, x_0) mean/variance (ref ddpm.py:289-296)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def model_predictions(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    parameterization: str = "eps",
    clip_x_start: bool = True,
):
    """(pred_noise, x_start) from a model output under either parameterization.

    eps path: ddpm.py:346-352; x0 path (AToM): AToM/model/diffusion.py:131-140.
    """
    out = model_fn(x, t)
    if parameterization == "eps":
        pred_noise = out
        x_start = predict_start_from_noise(sched, x, t, pred_noise)
        if clip_x_start:
            x_start = jnp.clip(x_start, -1.0, 1.0)
    elif parameterization == "x0":
        x_start = out
        if clip_x_start:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        pred_noise = predict_noise_from_start(sched, x, t, x_start)
    else:
        raise NotImplementedError(parameterization)
    return pred_noise, x_start


def _ddim_step(
    sched: DiffusionSchedule,
    x: jnp.ndarray,
    pred_noise: jnp.ndarray,
    x_start: jnp.ndarray,
    time: jnp.ndarray,
    time_next: jnp.ndarray,
    eta: float,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One DDIM update (ddpm.py:386-398). `time_next < 0` → return x_start."""
    alpha = sched.alphas_cumprod[time]
    # guard the -1 gather; the branch below discards the bogus value
    alpha_next = sched.alphas_cumprod[jnp.maximum(time_next, 0)]
    sigma = eta * jnp.sqrt(
        (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
    )
    c = jnp.sqrt(1 - alpha_next - sigma**2)
    x_new = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
    return jnp.where(time_next < 0, x_start, x_new)


def ddim_sample(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    key: jax.Array,
    sampling_steps: int,
    eta: float = 1.0,
    parameterization: str = "eps",
    clip_denoised: bool = True,
    x_init: jnp.ndarray | None = None,
    start_pair_index: int = 0,
    post_step_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    guidance_weights: np.ndarray | None = None,
    unroll: int = 1,
) -> jnp.ndarray:
    """DDIM sampling as a single ``lax.scan``.

    Covers the reference's three DDIM variants with one code path:
      * plain (ddpm.py:362-404 / AToM diffusion.py:212-250): defaults,
      * partial-renoise start (ddpm.py:407-454): pass ``x_init`` (already
        noised) and ``start_pair_index = int(len(pairs) * (1 - ratio))``,
      * AToM long sampling with overlap constraint + guidance ramp
        (AToM diffusion.py:253-301): pass ``post_step_fn`` and
        ``guidance_weights``.

    ``model_fn(x, t)`` may optionally accept a third positional argument
    (per-step guidance weight) when ``guidance_weights`` is given.
    """
    batch = shape[0]
    times, times_next = ddim_time_pairs(sched.num_timesteps, sampling_steps)
    # static start index → slice the tables at trace time (fewest steps in
    # the program, scan-able, unrollable); traced start index → keep full
    # tables and run a lax.fori_loop whose lower bound is the traced index,
    # so ONE compiled program serves every ratio (the partial-renoise AR
    # sampler would otherwise recompile the whole extract+scan+decode
    # program per distinct ratio) while executing ONLY the tail steps —
    # a dynamic trip count is real control flow on TPU, unlike the
    # cond-per-step alternative, which measured 10× slower than even the
    # full scan through the device tunnel.
    static_start = isinstance(start_pair_index, int)
    if static_start:
        times = times[start_pair_index:]
        times_next = times_next[start_pair_index:]

    if x_init is None:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = x_init

    n_steps = len(times)
    step_keys = jax.random.split(key, n_steps)
    times = jnp.asarray(times, dtype=jnp.int32)
    times_next = jnp.asarray(times_next, dtype=jnp.int32)
    w = (jnp.asarray(guidance_weights, dtype=jnp.float32)
         if guidance_weights is not None else None)

    def step_math(x, step):
        t_vec = jnp.full((batch,), step["time"], dtype=jnp.int32)
        if guidance_weights is not None:
            out = model_fn(x, t_vec, step["w"])
        else:
            out = model_fn(x, t_vec)
        if parameterization == "eps":
            pred_noise = out
            x_start = predict_start_from_noise(sched, x, t_vec, pred_noise)
            if clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
        else:
            x_start = jnp.clip(out, -1.0, 1.0) if clip_denoised else out
            pred_noise = predict_noise_from_start(sched, x, t_vec, x_start)
        noise = jax.random.normal(step["key"], x.shape, dtype=x.dtype)
        x_new = _ddim_step(
            sched, x, pred_noise, x_start, step["time"], step["time_next"], eta, noise
        )
        if post_step_fn is not None:
            # reference applies the constraint only while time > 0
            # (AToM diffusion.py:299-300)
            x_new = jnp.where(step["time"] > 0, post_step_fn(x_new, step["time"]), x_new)
        return x_new

    if static_start:
        xs = {"time": times, "time_next": times_next, "key": step_keys}
        if w is not None:
            xs["w"] = w[start_pair_index:]
        x, _ = jax.lax.scan(
            lambda x, step: (step_math(x, step), None), x, xs, unroll=unroll)
        return x

    def fori_body(i, x):
        step = {"time": times[i], "time_next": times_next[i],
                "key": step_keys[i]}
        if w is not None:
            step["w"] = w[i]
        return step_math(x, step)

    return jax.lax.fori_loop(start_pair_index, n_steps, fori_body, x)


def ddim_sample_noised_start(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    key: jax.Array,
    sampling_steps: int,
    ratio: float,
    eta: float = 1.0,
    parameterization: str = "eps",
    clip_denoised: bool = True,
    fixed_noise_key: jax.Array | None = None,
) -> jnp.ndarray:
    """Partial-renoise DDIM: q_sample a known latent to t = T*ratio, denoise
    the tail of the schedule (ref ddpm.py:407-454, used for fast AR video).

    ``fixed_noise_key`` pins the renoising draw to a caller-held key — the
    determinism pin the reference implements with ``torch.manual_seed(1004)``
    (ddpm.py:424-427, ``fixed_noise=True``).

    ``ratio`` may be a python float (static: the scan covers only the tail
    steps) or a traced jnp scalar (dynamic: one compiled program serves all
    ratios; head steps are lax.cond-skipped)."""
    key, k_noise = jax.random.split(key)
    if fixed_noise_key is not None:
        k_noise = fixed_noise_key
    if isinstance(ratio, (int, float)):
        t0 = int(sched.num_timesteps * ratio)
        start_idx: int | jnp.ndarray = int(sampling_steps * (1 - ratio))
    else:
        r = jnp.asarray(ratio, jnp.float32)
        t0 = jnp.floor(sched.num_timesteps * r).astype(jnp.int32)
        start_idx = jnp.floor(sampling_steps * (1.0 - r)).astype(jnp.int32)
    t_vec = jnp.full((x_start.shape[0],), t0, dtype=jnp.int32)
    noise = jax.random.normal(k_noise, x_start.shape, dtype=x_start.dtype)
    x_noisy = q_sample(sched, x_start, t_vec, noise)
    return ddim_sample(
        sched,
        model_fn,
        x_start.shape,
        key,
        sampling_steps,
        eta=eta,
        parameterization=parameterization,
        clip_denoised=clip_denoised,
        x_init=x_noisy,
        start_pair_index=start_idx,
    )


def p_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    shape: tuple[int, ...],
    key: jax.Array,
    parameterization: str = "eps",
    clip_denoised: bool = True,
    start_point: int | None = None,
    x_init: jnp.ndarray | None = None,
    post_step_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Ancestral sampling loop (ref ddpm.py:310-336) as a ``lax.scan``."""
    batch = shape[0]
    start_point = sched.num_timesteps if start_point is None else start_point
    if x_init is None:
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = x_init
    step_keys = jax.random.split(key, start_point)
    ts = jnp.arange(start_point - 1, -1, -1, dtype=jnp.int32)

    def body(x, step):
        t, k = step
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)
        out = model_fn(x, t_vec)
        if parameterization == "eps":
            x_recon = predict_start_from_noise(sched, x, t_vec, out)
        else:
            x_recon = out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean, _, log_var = q_posterior(sched, x_recon, x, t_vec)
        noise = jax.random.normal(k, x.shape, dtype=x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x_new = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        if post_step_fn is not None:
            x_new = jnp.where(t > 0, post_step_fn(x_new, t), x_new)
        return x_new, None

    x, _ = jax.lax.scan(body, x, (ts, step_keys))
    return x
