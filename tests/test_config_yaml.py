"""YAML config layer: native files in configs/ + reference-format ingestion
(ref MToV/main.py:65-78 merges OmegaConf YAML onto argparse args)."""

import os

import pytest

from moditalker_tpu.config import (Config, config_from_dict,
                                   config_from_reference_dict, load_config)

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_native_base_gan_disc_start_resume():
    cfg = load_config(os.path.join(CONFIGS, "autoencoder", "base_gan.yaml"))
    assert cfg.mtov_loss.disc_start == -1
    assert cfg.mtov_train.resume is True
    assert cfg.mtov_ae.channels == 384


def test_native_all_shipped_files_load():
    for sub in ("autoencoder/base.yaml", "autoencoder/base_gan.yaml",
                "autoencoder/base_ldmk.yaml", "latent-diffusion/base.yaml",
                "latent-diffusion/base_longvid.yaml", "tiny.yaml"):
        cfg = load_config(os.path.join(CONFIGS, sub))
        assert isinstance(cfg, Config)


def test_native_longvid_widens_unet():
    cfg = load_config(
        os.path.join(CONFIGS, "latent-diffusion", "base_longvid.yaml"))
    assert cfg.mtov_unet.model_channels == 256
    assert cfg.mtov_unet.channel_mult == (1, 2, 4, 4)


def test_tiny_latent_consistency():
    cfg = load_config(os.path.join(CONFIGS, "tiny.yaml"))
    uc, ac = cfg.mtov_unet, cfg.mtov_ae
    assert uc.latent_res == ac.latent_res
    assert uc.latent_t == ac.timesteps
    assert ac.latent_len == uc.latent_res**2 + 2 * uc.latent_t * uc.latent_res


def test_reference_format_autoencoder():
    """The upstream base_gan.yaml structure loads unchanged
    (ref MToV/configs/autoencoder/base_gan.yaml)."""
    data = {"model": {
        "resume": True, "amp": True, "base_learning_rate": 1.0e-4,
        "params": {
            "embed_dim": 4,
            "lossconfig": {"params": {"disc_start": -1}},
            "ddconfig": {"double_z": False, "channels": 384,
                         "resolution": 256, "timesteps": 16, "skip": 1,
                         "in_channels": 3, "out_ch": 3, "num_res_blocks": 2,
                         "attn_resolutions": [], "splits": 1},
        }}}
    cfg = config_from_reference_dict(data)
    assert cfg.mtov_loss.disc_start == -1
    assert cfg.mtov_train.resume is True
    assert cfg.mtov_train.lr == pytest.approx(1e-4)
    assert cfg.mtov_ae.resolution == 256 and cfg.mtov_ae.embed_dim == 4


def test_reference_format_latent_diffusion():
    """Upstream latent-diffusion/base.yaml structure; loss_type 'l1' is
    deliberately NOT honoured — the reference never plumbs it into DDPM
    (ddpm.py:126 vs exps/diffusion.py:148-156)."""
    data = {"model": {
        "base_learning_rate": 1.0e-4, "cond_model": False,
        "params": {
            "linear_start": 0.0015, "linear_end": 0.0195,
            "timesteps": 1000, "loss_type": "l1", "w": 0.0,
            "scheduler_config": {"warm_up_steps": [10000]},
            "unet_config": {
                "image_size": 32, "in_channels": 4, "out_channels": 4,
                "model_channels": 256,
                "attention_resolutions": [4, 2, 1],
                "num_res_blocks": 2, "channel_mult": [1, 2, 4, 4],
                "num_heads": 8, "use_scale_shift_norm": True,
                "resblock_updown": True, "cond_model": True},
        }}}
    cfg = config_from_reference_dict(data)
    assert cfg.mtov_unet.model_channels == 256
    assert cfg.mtov_unet.attention_resolutions == (4, 2, 1)
    assert cfg.mtov_diffusion.linear_start == pytest.approx(0.0015)
    assert cfg.mtov_diffusion.loss_type == "l2"  # reference behavior
    assert cfg.mtov_train.warmup_steps == 10000


def test_unknown_field_raises():
    with pytest.raises(KeyError):
        config_from_dict({"mtov_unet": {"model_channelz": 64}})
    with pytest.raises(KeyError):
        config_from_dict({"not_a_section": {}})
