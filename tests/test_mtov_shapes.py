"""MToV model shape/latent-layout smoke tests on a small config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moditalker_tpu.config import (MtovAEConfig, MtovDiffusionConfig,
                                   MtovUNetConfig)
from moditalker_tpu.models.mtov import MtovDDPM, TriplaneUNet, ViTAutoencoder

AE_SMALL = MtovAEConfig(channels=64, resolution=32, timesteps=4, depth=1,
                        heads=2, dim_head=16, quant_depth=1, quant_heads=2,
                        quant_mlp_dim=32, down=3)
# latent_res = 32/8 = 4; latent_len = 16 + 2*4*4 = 48
UNET_SMALL = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                            channel_mult=(1, 2), attention_resolutions=(1, 2),
                            num_heads=2, latent_res=4, latent_t=4)
DIFF_SMALL = MtovDiffusionConfig(timesteps=20, sampling_timesteps=4)

L_SMALL = UNET_SMALL.latent_res**2 + 2 * UNET_SMALL.latent_t * \
    UNET_SMALL.latent_res


@pytest.fixture(scope="module")
def ae_params():
    """One AE_SMALL init shared by the module (flax params are
    batch-size independent, so every test can apply them)."""
    ae = ViTAutoencoder(AE_SMALL)
    x = jnp.zeros((1, AE_SMALL.timesteps, AE_SMALL.resolution,
                   AE_SMALL.resolution, 3))
    return jax.jit(ae.init)(jax.random.PRNGKey(1), x)


@pytest.fixture(scope="module")
def unet_params():
    """One UNET_SMALL init (seed 3) shared by the module."""
    unet = TriplaneUNet(UNET_SMALL)
    return jax.jit(unet.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 4, L_SMALL)),
        jnp.zeros((1, 8, L_SMALL)), jnp.zeros((1, 4, L_SMALL)),
        jnp.zeros((1,), jnp.int32))


def test_ae_roundtrip_shapes(ae_params):
    cfg = AE_SMALL
    ae = ViTAutoencoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (2, cfg.timesteps, cfg.resolution, cfg.resolution, 3))
    params = ae_params
    recon, _ = ae.apply(params, x)
    assert recon.shape == x.shape
    assert float(jnp.abs(recon).max()) <= 1.0


def test_ae_extract_decode_layout(ae_params):
    cfg = AE_SMALL
    ae = ViTAutoencoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, cfg.timesteps, cfg.resolution, cfg.resolution, 3))
    params = ae_params
    z = ae.apply(params, x, method=ae.extract)
    assert z.shape == (1, cfg.embed_dim, cfg.latent_len)
    assert float(jnp.abs(z).max()) <= 1.0  # tanh'd
    dec = ae.apply(params, z, method=ae.decode_from_sample)
    assert dec.shape == x.shape

    # extract→decode_from_sample must equal encode→decode (same planes)
    recon, _ = ae.apply(params, x)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(recon),
                               rtol=1e-4, atol=1e-4)


def test_unet_shapes_and_finite(unet_params):
    cfg = UNET_SMALL
    unet = TriplaneUNet(cfg)
    L = L_SMALL
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, L))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, L))
    ic = jax.random.normal(jax.random.PRNGKey(2), (2, 4, L))
    t = jnp.array([0, 10], jnp.int32)
    params = unet_params
    out = unet.apply(params, x, cond, ic, t)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_zero_init_head_gives_zero_output_delta(unet_params):
    """With zero-init final conv + zero-init proj_out layers, a fresh UNet's
    output is exactly zero (residual branches dead) — matches reference
    zero_module init policy."""
    cfg = UNET_SMALL
    unet = TriplaneUNet(cfg)
    L = L_SMALL
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, L))
    cond = jnp.zeros((1, 8, L))
    ic = jnp.zeros((1, 4, L))
    t = jnp.zeros((1,), jnp.int32)
    params = unet_params
    out = unet.apply(params, x, cond, ic, t)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_ddpm_loss_and_sample(unet_params):
    ddpm = MtovDDPM.create(UNET_SMALL, DIFF_SMALL)
    L = L_SMALL
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 4, L)))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 8, L))
    ic = jax.random.normal(jax.random.PRNGKey(2), (2, 4, L))
    params = unet_params
    loss, aux = ddpm.p_losses(params, jax.random.PRNGKey(4), x, cond, ic)
    assert np.isfinite(float(loss))

    out = ddpm.ddim_sample(params, jax.random.PRNGKey(5), x.shape, cond, ic)
    assert out.shape == x.shape
    out2 = ddpm.ddim_sample_noised_start(
        params, jax.random.PRNGKey(6), x, cond, ic, ratio=0.5)
    assert out2.shape == x.shape
