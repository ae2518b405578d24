"""Golden-value tests for diffusion schedules vs the torch reference."""

import numpy as np
import pytest

from moditalker_tpu.core import schedules

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


def test_linear_schedule_formula():
    betas = schedules.linear_beta_schedule(1000, 0.0015, 0.0195)
    assert betas.shape == (1000,)
    assert abs(betas[0] - 0.0015) < 1e-12
    assert abs(betas[-1] - 0.0195) < 1e-12
    assert np.all(np.diff(betas) > 0)


def test_cosine_schedule_bounds():
    betas = schedules.cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert betas.max() <= 0.999
    assert betas.min() > 0


@needs_ref
def test_linear_matches_reference():
    ref = ref_oracle.import_atom_module("model.utils")
    expected = ref.make_beta_schedule("linear", 1000, 0.0015, 0.0195)
    got = schedules.make_beta_schedule("linear", 1000, 0.0015, 0.0195)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)


@needs_ref
def test_cosine_matches_reference():
    ref = ref_oracle.import_atom_module("model.utils")
    expected = ref.make_beta_schedule("cosine", 1000)
    got = schedules.make_beta_schedule("cosine", 1000)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-12)


@needs_ref
def test_full_table_set_matches_mtov_ddpm():
    """All registered buffers of the reference DDPM match our tables."""
    torch = pytest.importorskip("torch")
    ddpm_mod = ref_oracle.import_mtov_module("losses.ddpm")

    class _Null(torch.nn.Module):
        def forward(self, *a, **k):
            return a[0]

    ref = ddpm_mod.DDPM(
        _Null(), timesteps=1000, linear_start=0.0015, linear_end=0.0195
    )
    sched = schedules.make_schedule(
        "linear", 1000, linear_start=0.0015, linear_end=0.0195,
        parameterization="eps",
    )
    pairs = [
        ("betas", sched.betas),
        ("alphas_cumprod", sched.alphas_cumprod),
        ("alphas_cumprod_prev", sched.alphas_cumprod_prev),
        ("sqrt_alphas_cumprod", sched.sqrt_alphas_cumprod),
        ("sqrt_one_minus_alphas_cumprod", sched.sqrt_one_minus_alphas_cumprod),
        ("sqrt_recip_alphas_cumprod", sched.sqrt_recip_alphas_cumprod),
        ("sqrt_recipm1_alphas_cumprod", sched.sqrt_recipm1_alphas_cumprod),
        ("posterior_variance", sched.posterior_variance),
        ("posterior_log_variance_clipped", sched.posterior_log_variance_clipped),
        ("posterior_mean_coef1", sched.posterior_mean_coef1),
        ("posterior_mean_coef2", sched.posterior_mean_coef2),
        ("lvlb_weights", sched.lvlb_weights),
    ]
    for name, mine in pairs:
        expected = getattr(ref, name).numpy()
        # lvlb_weights: reference chains float32 tensor ops; ours is float64
        # then cast — a few 5e-6 rel diffs (and it is unused on active paths:
        # original_elbo_weight = 0)
        rtol = 1e-5 if name == "lvlb_weights" else 1e-6
        np.testing.assert_allclose(
            np.asarray(mine), expected, rtol=rtol, atol=1e-7, err_msg=name
        )


def test_ddim_time_pairs_100():
    times, times_next = schedules.ddim_time_pairs(1000, 100)
    assert len(times) == 100
    assert times[0] == 999 and times_next[-1] == -1
    # uniform spacing of 10 like torch.linspace(-1, 999, 101).int()
    assert times[1] == 989
    assert times_next[0] == 989


@needs_ref
def test_ddim_time_pairs_match_torch():
    torch = pytest.importorskip("torch")
    for steps in (100, 50, 25, 7):
        t = torch.linspace(-1, 999, steps=steps + 1).int().tolist()
        t = list(reversed(t))
        exp_pairs = list(zip(t[:-1], t[1:]))
        times, times_next = schedules.ddim_time_pairs(1000, steps)
        got = list(zip(times.tolist(), times_next.tolist()))
        assert got == exp_pairs, steps
