"""MToV training steps: first-stage GAN trainer and latent-diffusion trainer."""

import numpy as np
import jax.numpy as jnp

from moditalker_tpu.config import (MtovAEConfig, MtovDiffusionConfig,
                                   MtovLossConfig, MtovTrainConfig,
                                   MtovUNetConfig)
from moditalker_tpu.train.mtov import MtovDiffusionTrainer
from moditalker_tpu.train.mtov_first_stage import FirstStageTrainer

AE_TINY = MtovAEConfig(channels=32, resolution=32, timesteps=4, depth=1,
                       heads=2, dim_head=8, quant_depth=1, quant_heads=2,
                       quant_mlp_dim=16, down=3)
UNET_TINY = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                           channel_mult=(1, 2), attention_resolutions=(1, 2),
                           num_heads=2, latent_res=4, latent_t=4)
DIFF_TINY = MtovDiffusionConfig(timesteps=20, sampling_timesteps=4)
# batch 2, not 8: every first-stage G step runs LPIPS-VGG16 over b·t frames
# forward+backward — at test sizes that VGG dominates the whole file's
# runtime on the 1-vCPU test backend (4× with batch 8)
TRAIN = MtovTrainConfig(batch_size=2, accum_iter=2)
# Conv3D on the CPU test backend is pathologically slow in XLA; shrink the
# discriminators for tests (architecture unchanged: still 2D+3D PatchGAN)
LOSS_G_ONLY = MtovLossConfig(disc_start=10**8, disc_ndf=8, disc_layers=1)
LOSS_GAN = MtovLossConfig(disc_start=0, disc_ndf=8, disc_layers=1)


def _video(b=2):
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, size=(b, 4, 32, 32, 3)).astype(np.float32)


def _mesh1():
    # first-stage tests run on a 1-device mesh: the 8-way virtual partition
    # only adds scheduling overhead on the 1-vCPU backend, and the sharded
    # paths are covered by test_sharding / test_graft_entry
    from moditalker_tpu.core import sharding as shard_lib

    return shard_lib.make_mesh(1)


def test_first_stage_g_only_loss_drops():
    # disc_start huge → pure reconstruction phase like base.yaml (1e8)
    trainer = FirstStageTrainer(AE_TINY, LOSS_G_ONLY, TRAIN, mesh=_mesh1())
    v = _video()
    # 5 steps, not more: each G step executes LPIPS-VGG16 fwd+bwd (~2 s on
    # the 1-vCPU backend); 2 optimizer updates (accum 2) suffice for descent
    losses = [float(trainer.step(v)["ae_loss"]) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_first_stage_gan_phase_alternation():
    # disc_start=0 → G/D alternate every accum cycle (base_gan.yaml: -1)
    trainer = FirstStageTrainer(AE_TINY, LOSS_GAN, TRAIN, mesh=_mesh1())
    v = _video()
    kinds = []
    for _ in range(6):
        m = trainer.step(v)
        kinds.append("d" if "d_loss" in m else "g")
        assert np.isfinite(float(list(m.values())[0]))
    # accum 2: two g steps, then two d steps, then back to g — 6 steps show
    # the full cycle plus the wrap-around
    assert kinds == ["g", "g", "d", "d", "g", "g"]


def test_first_stage_freeze_decoder():
    trainer = FirstStageTrainer(AE_TINY, LOSS_G_ONLY, TRAIN,
                                freeze_decoder=True, mesh=_mesh1())
    import jax
    # snapshot to host before stepping — the train step donates the state
    before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(),
        trainer.state.ae_params["params"]["decoder"])
    v = _video()
    for _ in range(TRAIN.accum_iter):
        trainer.step(v)
    after = trainer.state.ae_params["params"]["decoder"]
    leaves_b = jnp.concatenate([x.ravel() for x in
                                jnp_tree_leaves(before)])
    leaves_a = jnp.concatenate([x.ravel() for x in
                                jnp_tree_leaves(after)])
    np.testing.assert_allclose(np.asarray(leaves_a), np.asarray(leaves_b))
    # encoder must have moved
    enc_b = jnp.concatenate([x.ravel() for x in jnp_tree_leaves(
        trainer.state.ae_params["params"]["encoder"])])
    assert enc_b.shape[0] > 0


def jnp_tree_leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


import pytest


@pytest.fixture(scope="module")
def diff_trainer():
    """One compiled diffusion trainer shared by the tests below (the train
    step program is the expensive part on the CPU test backend)."""
    return MtovDiffusionTrainer(UNET_TINY, DIFF_TINY, TRAIN, latent_len=48)


def test_diffusion_trainer_loss_drops(diff_trainer):
    trainer = diff_trainer
    rng = np.random.default_rng(0)
    batch = {
        "z": np.tanh(rng.normal(size=(8, 4, 48))).astype(np.float32),
        "cond": rng.normal(size=(8, 8, 48)).astype(np.float32),
        "image_cond": rng.normal(size=(8, 4, 48)).astype(np.float32),
    }
    losses = [float(trainer.step(batch)["loss"]) for _ in range(8)]
    assert np.isfinite(losses).all()
    # each step draws a fresh (t, noise) so per-step loss is noisy; just
    # require no divergence and that the optimizer actually moved params
    assert np.mean(losses[-3:]) < 2.0 * np.mean(losses[:3])
    assert int(trainer.state.step) >= 8


def test_latent_diffusion_loop_with_frozen_aes(diff_trainer):
    """Full second-stage path: frozen AEs extract latents, DDPM trains.
    AE_TINY.latent_len == 48 == the shared trainer's latent_len."""
    import jax
    from moditalker_tpu.models.mtov import ViTAutoencoder
    from moditalker_tpu.train.mtov import LatentDiffusionLoop

    assert AE_TINY.latent_len == 48
    ae = ViTAutoencoder(AE_TINY)
    v = jnp.zeros((1, 4, 32, 32, 3))
    ae_params = jax.jit(ae.init)(jax.random.PRNGKey(0), v)
    trainer = diff_trainer
    step0 = int(trainer.state.step)
    loop = LatentDiffusionLoop(trainer, ae, ae_params, ae_params)

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {k: rng.uniform(-1, 1, (8, 4, 32, 32, 3)).astype(np.float32)
                   for k in ("x", "x_l", "masked_x", "x_ref")}

    state = loop.fit(batches(), max_steps=3)
    assert int(state.step) == step0 + 3


def test_unet_longvid_config_tiny_remat():
    """base_longvid variant (wider channels) + remat compiles and runs."""
    import jax
    from moditalker_tpu.models.mtov import TriplaneUNet

    cfg = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                         channel_mult=(1, 2), attention_resolutions=(1, 2),
                         num_heads=2, latent_res=4, latent_t=4)
    L = cfg.latent_res**2 + 2 * cfg.latent_t * cfg.latent_res
    m = TriplaneUNet(cfg, remat=True)
    x = jnp.zeros((1, 4, L))
    p = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((1, 8, L)),
                        jnp.zeros((1, 4, L)), jnp.zeros((1,), jnp.int32))
    out = m.apply(p, x, jnp.zeros((1, 8, L)), jnp.zeros((1, 4, L)),
                  jnp.zeros((1,), jnp.int32))
    assert out.shape == x.shape
