"""End-to-end integration: audio features → AToM landmarks → motion
alignment → MToV video, all on tiny configs with fresh weights.

This exercises every inter-stage data contract of the inference dataflow
(SURVEY.md §1: wav → hubert.npy → frontalized_npy → aligned_npy → frames).
"""

import numpy as np
import jax
import jax.numpy as jnp

from moditalker_tpu.config import (AtomDiffusionConfig, AtomModelConfig,
                                   MtovAEConfig, MtovDiffusionConfig,
                                   MtovUNetConfig)
from moditalker_tpu.data.mtov_dataset import (rasterize_landmarks,
                                              to_model_range)
from moditalker_tpu.pipelines.atom_infer import AtomInferencePipeline
from moditalker_tpu.pipelines.mtov_sample import MtovSamplePipeline
from moditalker_tpu.preprocess import audio as audio_pp
from moditalker_tpu.preprocess.bfm import Face3DHelper
from moditalker_tpu.preprocess.hubert import HubertConfig, HubertEncoder
from moditalker_tpu.preprocess.motion_align import MotionAligner


def test_full_pipeline_tiny(tmp_path):
    rng = np.random.default_rng(0)

    # ---- stage 0: audio → hubert features (tiny flax encoder)
    hub_cfg = HubertConfig(hidden_size=16, num_layers=1, num_heads=2,
                           intermediate_size=32, conv_dim=(4,) * 7,
                           conv_bias=False)
    hub = HubertEncoder(hub_cfg)
    wave = rng.normal(size=(16000,)).astype(np.float32)  # 1 s @ 16 kHz
    hub_params = jax.jit(hub.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))

    def model_fn(w):
        return np.asarray(hub.apply(hub_params, jnp.asarray(w)))[0]

    feats = audio_pp.extract_hubert_features(
        audio_pp.normalize_like_wav2vec2(wave), model_fn)
    assert feats.shape == (audio_pp.expected_num_frames(16000), 16)
    # widen to the AToM cond dim
    hubert_npy = np.tile(feats, (1, 64))[:, :1024].astype(np.float32)

    # ---- stage 1: AToM → frontalized landmarks
    horizon = 8
    atom_cfg = AtomModelConfig(horizon=horizon, latent_dim=32, ff_size=64,
                               num_layers=1, num_heads=2, dropout=0.0)
    atom_diff = AtomDiffusionConfig(n_timesteps=20, sampling_steps=2)
    from moditalker_tpu.models.atom import MotionDecoder
    m = MotionDecoder(atom_cfg)
    atom_params = jax.jit(m.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, horizon, 204)),
        jnp.zeros((1, horizon, 204)), jnp.zeros((1, horizon * 2, 1024)),
        jnp.zeros((1,), jnp.int32))
    helper = Face3DHelper.synthetic()
    atom = AtomInferencePipeline(atom_params, atom_cfg, atom_diff,
                                 face3d=helper)
    kp = rng.normal(scale=0.3, size=(68, 3)).astype(np.float32)
    lm3d = atom.generate_landmarks(jax.random.PRNGKey(2), kp, hubert_npy)
    assert lm3d.shape == (horizon, 68, 3)
    assert np.isfinite(lm3d).all()

    # ---- stage 2: motion alignment to a driving video's pose
    frames = rng.integers(0, 255, (horizon, 64, 64, 3)).astype(np.uint8)

    def landmark_fn(f):
        return rng.uniform(8, 56, (f.shape[0], 68, 2))

    def coeff_fn(f, lm5):
        c = np.zeros((f.shape[0], 257), np.float32)
        c[:, 224:227] = rng.normal(scale=0.1, size=(f.shape[0], 3))
        return c

    aligner = MotionAligner(landmark_fn, coeff_fn,
                            rng.normal(size=(5, 3)))
    aligned = aligner.align_sequence(lm3d, frames)
    assert aligned.shape == (horizon, 68, 2)

    # ---- stage 3: MToV — rasterize aligned landmarks, sample video
    ae_cfg = MtovAEConfig(channels=32, resolution=32, timesteps=4, depth=1,
                          heads=2, dim_head=8, quant_depth=1, quant_heads=2,
                          quant_mlp_dim=16, down=3)
    unet_cfg = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                              channel_mult=(1, 2),
                              attention_resolutions=(1, 2), num_heads=2,
                              latent_res=ae_cfg.latent_res,
                              latent_t=ae_cfg.timesteps)
    diff_cfg = MtovDiffusionConfig(timesteps=20, sampling_timesteps=2)

    from moditalker_tpu.models.mtov import MtovDDPM, ViTAutoencoder
    ae = ViTAutoencoder(ae_cfg)
    ddpm = MtovDDPM.create(unet_cfg, diff_cfg)
    v0 = jnp.zeros((1, 4, 32, 32, 3))
    ae_params = jax.jit(ae.init)(jax.random.PRNGKey(3), v0)
    L = ae_cfg.latent_len
    unet_params = jax.jit(ddpm.model.init)(
        jax.random.PRNGKey(4), jnp.zeros((1, 4, L)), jnp.zeros((1, 8, L)),
        jnp.zeros((1, 4, L)), jnp.zeros((1,), jnp.int32))
    pipe = MtovSamplePipeline(ae_params, ae_params, unet_params, ae_cfg,
                              unet_cfg, diff_cfg, dtype=jnp.float32)

    # build 2 windows of 4 frames from the aligned landmarks
    def window(lo):
        lm = np.clip(aligned[lo : lo + 4], 0, 63)
        ldmk_maps = rasterize_landmarks(lm.astype(int), size=32, src_wh=64)
        return {
            "x_l": to_model_range(ldmk_maps.astype(np.float32))[None],
            "masked_x": to_model_range(
                frames[lo : lo + 4, ::2, ::2].astype(np.float32))[None],
            "x_ref": to_model_range(
                np.stack([frames[0, ::2, ::2]] * 4).astype(np.float32))[None],
        }

    video = pipe.sample_long([window(0), window(4)], jax.random.PRNGKey(5))
    assert video.shape == (1, 8, 32, 32, 3)
    assert video.dtype == np.uint8
