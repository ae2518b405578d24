"""Infrastructure tests: orbax checkpointing, logging, CLI smoke, AR sampling
pipeline with the window dataset."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from moditalker_tpu.core.checkpoint import (CheckpointManager, host_tree,
                                            load_single, save_single)
from moditalker_tpu.core.logging import AverageMeter, MetricLogger


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(7, host_tree(state))
    assert mgr.latest_step() == 7
    restored = mgr.restore(template=host_tree(state))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    mgr.close()


def test_save_single_roundtrip(tmp_path):
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    p = str(tmp_path / "export")
    save_single(p, host_tree(tree))
    back = load_single(p, host_tree(tree))
    np.testing.assert_allclose(np.asarray(back["a"]), 1.0)


def test_metric_logger(tmp_path):
    logger = MetricLogger(str(tmp_path / "logs"), use_tensorboard=False)
    logger.log_text("hello")
    logger.log_scalars(10, {"loss": 0.5})
    logger.close()
    lines = open(os.path.join(str(tmp_path / "logs"),
                              "metrics.jsonl")).readlines()
    rec = json.loads(lines[0])
    assert rec["step"] == 10 and rec["loss"] == 0.5
    assert "hello" in open(
        os.path.join(str(tmp_path / "logs"), "log.txt")).read()


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.average == 2.0


def test_sequential_window_dataset(tmp_path):
    from PIL import Image

    from moditalker_tpu.data.mtov_dataset import SequentialWindowDataset

    frames_dir = tmp_path / "frames"
    aligned_dir = tmp_path / "aligned"
    frames_dir.mkdir()
    aligned_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
                frames_dir / f"{i:05d}.jpg")
        np.save(aligned_dir / f"{i:05d}.npy",
                rng.integers(5, 60, (68, 2)))
    ds = SequentialWindowDataset(str(frames_dir), str(aligned_dir),
                                 nframes=4, resolution=64)
    assert len(ds) == 2
    item = ds[1]
    for k in ("x_ref", "x", "x_l", "masked_x"):
        assert item[k].shape == (4, 64, 64, 3), k
    # landmark maps are rasterized at 256 then resized; white dots present
    assert item["x_l"].max() > 0

    windows = list(ds.windows())
    assert len(windows) == 2
    assert windows[0]["x"].shape == (1, 4, 64, 64, 3)
    assert windows[0]["x"].min() >= -1.0 and windows[0]["x"].max() <= 1.0


def test_ar_sampling_pipeline_tiny():
    """Full AR sampling across 2 windows with use_last_as_reference on a
    tiny model config."""
    from moditalker_tpu.config import (MtovAEConfig, MtovDiffusionConfig,
                                       MtovUNetConfig)
    from moditalker_tpu.models.mtov import MtovDDPM, ViTAutoencoder
    from moditalker_tpu.pipelines.mtov_sample import MtovSamplePipeline

    ae_cfg = MtovAEConfig(channels=32, resolution=32, timesteps=4, depth=1,
                          heads=2, dim_head=8, quant_depth=1, quant_heads=2,
                          quant_mlp_dim=16, down=3)
    unet_cfg = MtovUNetConfig(model_channels=32, num_res_blocks=1,
                              channel_mult=(1, 2),
                              attention_resolutions=(1, 2), num_heads=2,
                              latent_res=ae_cfg.latent_res,
                              latent_t=ae_cfg.timesteps)
    diff_cfg = MtovDiffusionConfig(timesteps=20, sampling_timesteps=2)

    ae = ViTAutoencoder(ae_cfg)
    ddpm = MtovDDPM.create(unet_cfg, diff_cfg)
    v = jnp.zeros((1, 4, 32, 32, 3))
    ae_params = jax.jit(ae.init)(jax.random.PRNGKey(0), v)
    L = ae_cfg.latent_len
    unet_params = jax.jit(ddpm.model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, L)), jnp.zeros((1, 8, L)),
        jnp.zeros((1, 4, L)), jnp.zeros((1,), jnp.int32))

    pipe = MtovSamplePipeline(ae_params, ae_params, unet_params, ae_cfg,
                              unet_cfg, diff_cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)

    def window():
        return {k: rng.uniform(-1, 1, (1, 4, 32, 32, 3)).astype(np.float32)
                for k in ("x_l", "masked_x", "x_ref", "x")}

    out = pipe.sample_long([window(), window()], jax.random.PRNGKey(2))
    assert out.shape == (1, 8, 32, 32, 3)
    assert out.dtype == np.uint8

    # fast AR mode with partial renoise
    out2 = pipe.sample_long([window()], jax.random.PRNGKey(3),
                            noised_start_ratio=0.5)
    assert out2.shape == (1, 4, 32, 32, 3)

    # uint8 device-I/O parity (round 4): uint8 windows convert to model
    # range ON DEVICE — same math as host to_model_range, so the generated
    # frames must be bit-identical to the float path
    wf = window()
    wu = {k: np.clip(np.rint((v + 1.0) * 127.5), 0, 255).astype(np.uint8)
          for k, v in wf.items()}
    wf_exact = {k: v.astype(np.float32) / 127.5 - 1.0 for k, v in wu.items()}
    of = pipe.sample_long([wf_exact], jax.random.PRNGKey(4))
    ou = pipe.sample_long([wu], jax.random.PRNGKey(4))
    np.testing.assert_array_equal(of, ou)

    # Noise-source staging cache (round 5): in "ref" fast mode the renoise
    # source is the dataset reference — constant across an identity's
    # windows — and sample_long now stages it on device ONCE (content-keyed)
    # instead of re-uploading ~3 MB of identical bytes per window (measured
    # on chip: 9 AR windows 13.6 → 5.4 s). Semantics must be unchanged:
    # fresh-but-equal host buffers per window ≡ one device-staged array.
    ref0 = rng.uniform(-1, 1, (1, 4, 32, 32, 3)).astype(np.float32)

    def fast_windows(ref_of):
        for _ in range(3):
            w = window()
            w["x_ref"] = ref_of()   # fresh buffer (or device array) each time
            yield w

    rng_state = rng.bit_generator.state
    o_fresh = pipe.sample_long(fast_windows(lambda: ref0.copy()),
                               jax.random.PRNGKey(5), noised_start_ratio=0.5)
    rng.bit_generator.state = rng_state  # same x_l/masked_x sequence
    ref_dev = jnp.asarray(ref0)
    o_dev = pipe.sample_long(fast_windows(lambda: ref_dev),
                             jax.random.PRNGKey(5), noised_start_ratio=0.5)
    np.testing.assert_array_equal(o_fresh, o_dev)

    # "gt" source with per-window distinct sources (cache-miss path) and
    # both reference fast modes still differ (they renoise different
    # latents)
    rng.bit_generator.state = rng_state
    o_gt = pipe.sample_long(fast_windows(lambda: ref0.copy()),
                            jax.random.PRNGKey(5), noised_start_ratio=0.5,
                            noised_start_source="gt")
    assert o_gt.shape == o_fresh.shape
    assert not np.array_equal(o_gt, o_fresh)
