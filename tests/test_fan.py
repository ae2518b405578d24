"""FAN structural + heatmap-decoding tests (weights unavailable offline;
the network is validated structurally, decoding exactly)."""

import numpy as np
import jax
import jax.numpy as jnp

from moditalker_tpu.preprocess import fan


import pytest


@pytest.fixture(scope="module")
def fan1_params():
    """One FAN(num_modules=1) init shared by the module: FAN is fully
    convolutional, so params from a 64² init serve every input size. Each
    init executes ~2 s of random param generation on the CPU backend."""
    return jax.jit(fan.FAN(num_modules=1).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_fan_output_shapes(fan1_params):
    model = fan.FAN(num_modules=1)  # 1 module keeps the CPU test light
    x = jnp.zeros((1, 64, 64, 3))   # FAN is fully convolutional
    params = fan1_params
    outs = model.apply(params, x)
    assert len(outs) == 1
    assert outs[0].shape == (1, 16, 16, 68)


def test_heatmap_decode_subpixel():
    hm = np.zeros((1, 64, 64, 68), np.float32)
    for n in range(68):
        hm[0, 20, 30 + (n % 3), n] = 1.0
        hm[0, 20, 31 + (n % 3), n] = 0.5  # gradient pulls +x
    pts = fan.heatmaps_to_landmarks(hm)
    assert pts.shape == (1, 68, 2)
    # argmax at x=30 (+0.25 shift toward the larger neighbor) + 0.5 center
    np.testing.assert_allclose(pts[0, 0], [30.75, 20.5], atol=1e-6)


def test_heatmap_decode_backprojection():
    hm = np.zeros((1, 64, 64, 1), np.float32)
    hm[0, 32, 32, 0] = 1.0
    center = np.array([128.0, 128.0])
    scale = 1.28  # crop side 256
    pts = fan.heatmaps_to_landmarks(hm, center=center, scale=scale)
    # heatmap center should land at the crop center = image center
    np.testing.assert_allclose(pts[0, 0], center, atol=3.0)


def test_bbox_center_scale_and_crop():
    lm = np.array([[100, 120], [200, 260]], np.float64)
    center, scale = fan.bbox_to_center_scale(lm)
    assert center[0] == 150
    assert 0.5 < scale < 2.0
    img = np.random.default_rng(0).uniform(
        0, 255, (300, 300, 3)).astype(np.float32)
    crop = fan.crop_face(img, center, scale)
    assert crop.shape == (256, 256, 3)


def test_convert_fan_structure():
    """The converter consumes a synthetic state_dict with face_alignment's
    exact key naming and produces a tree our FAN accepts."""
    import collections

    def conv_keys(name, i, o, k, bias=False):
        d = {f"{name}.weight": np.zeros((o, i, k, k), np.float32)}
        if bias:
            d[f"{name}.bias"] = np.zeros((o,), np.float32)
        return d

    def bn_keys(name, c):
        return {f"{name}.weight": np.ones((c,), np.float32),
                f"{name}.bias": np.zeros((c,), np.float32),
                f"{name}.running_mean": np.zeros((c,), np.float32),
                f"{name}.running_var": np.ones((c,), np.float32)}

    def convblock_keys(name, i, o, ds):
        d = {}
        d.update(bn_keys(f"{name}.bn1", i))
        d.update(conv_keys(f"{name}.conv1", i, o // 2, 3))
        d.update(bn_keys(f"{name}.bn2", o // 2))
        d.update(conv_keys(f"{name}.conv2", o // 2, o // 4, 3))
        d.update(bn_keys(f"{name}.bn3", o // 4))
        d.update(conv_keys(f"{name}.conv3", o // 4, o // 4, 3))
        if ds:
            d.update(bn_keys(f"{name}.downsample.0", i))
            d.update(conv_keys(f"{name}.downsample.2", i, o, 1))
        return d

    sd = {}
    sd.update(conv_keys("conv1", 3, 64, 7, bias=True))
    sd.update(bn_keys("bn1", 64))
    sd.update(convblock_keys("conv2", 64, 128, True))
    sd.update(convblock_keys("conv3", 128, 128, False))
    sd.update(convblock_keys("conv4", 128, 256, True))
    nm = 1
    for i in range(nm):
        for lv in (4, 3, 2, 1):
            for blk in ["b1", "b2", "b3"] + (["b2_plus"] if lv == 1 else []):
                sd.update(convblock_keys(f"m{i}.{blk}_{lv}", 256, 256, False))
        sd.update(convblock_keys(f"top_m_{i}", 256, 256, False))
        sd.update(conv_keys(f"conv_last{i}", 256, 256, 1, bias=True))
        sd.update(bn_keys(f"bn_end{i}", 256))
        sd.update(conv_keys(f"l{i}", 256, 68, 1, bias=True))

    tree = fan.convert_fan(sd, num_modules=nm)
    model = fan.FAN(num_modules=nm)
    x = jnp.zeros((1, 64, 64, 3))
    ref_params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    # converted tree must have the same structure as a fresh init
    def paths(t, prefix=""):
        if isinstance(t, dict):
            out = set()
            for k, v in t.items():
                out |= paths(v, prefix + "/" + k)
            return out
        return {prefix}

    assert paths(tree["params"]) == paths(ref_params["params"])
    out = model.apply(tree, x)
    assert out[0].shape == (1, 16, 16, 68)


def test_fan_landmarker_tracks(tmp_path, fan1_params):
    from moditalker_tpu.preprocess.fan import FanLandmarker

    tracker = FanLandmarker(fan1_params, num_modules=1)
    frames = (np.random.default_rng(0).uniform(0, 255, (2, 128, 128, 3))
              .astype(np.uint8))
    lm = tracker(frames)
    assert lm.shape == (2, 68, 2)
    assert np.isfinite(lm).all()


def test_crop_face_degenerate_scale_bounded():
    """A collapsed/garbage detection must not request an unbounded canvas
    (regression: 280 GiB allocation from scale ~790 in bench_e2e)."""
    img = np.zeros((64, 80, 3), np.float32)
    out = fan.crop_face(img, center=(1e7, -1e7), scale=1e4)
    assert out.shape == (256, 256, 3)
    out = fan.crop_face(img, center=(40, 32), scale=1e-9)
    assert out.shape == (256, 256, 3)


def test_device_decode_matches_host_decode():
    """decode_heatmaps_jnp (the on-device decode inside the jitted FAN
    program) is bit-identical to heatmaps_to_landmarks on the same fp32
    maps (heatmap-space coords; the center/scale tail is applied host-side
    by project_heatmap_coords)."""
    rng = np.random.default_rng(7)
    hm = rng.normal(size=(3, 64, 64, 68)).astype(np.float32)
    host = fan.heatmaps_to_landmarks(hm.copy())
    dev = np.asarray(jax.jit(fan.decode_heatmaps_jnp)(jnp.asarray(hm)))
    np.testing.assert_array_equal(dev.astype(np.float64), host)

    center, scale = np.array([120.0, 90.0]), 1.1
    full = fan.heatmaps_to_landmarks(hm.copy(), center=center, scale=scale)
    via = fan.project_heatmap_coords(dev, center, scale)
    np.testing.assert_allclose(via, full, rtol=0, atol=1e-9)


def test_bf16_eval_mode_smoke(fan1_params):
    """dtype=bfloat16 is the TPU eval mode for the preprocessing nets: the
    conv trunks compute in bf16, params and the decode/output heads stay
    fp32. Random-init heatmaps are near-flat (argmax agreement with fp32 is
    only meaningful with real weights — validated by the golden harness),
    so this pins shape/dtype/finiteness and that both dtypes share params."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    boxes = np.tile(np.array([[30.0, 30.0, 100.0, 100.0]]), (2, 1))
    # chunk=2: the default 64 pads these 2 frames to a 64-frame FAN forward
    # (32x wasted XLA:CPU execution — measured 33 s of this test's 42 s)
    lm16 = fan.FanLandmarker(fan1_params, num_modules=1, chunk=2,
                             dtype=jnp.bfloat16).landmarks_batched(
        frames, boxes)
    assert lm16.shape == (2, 68, 2)
    assert np.isfinite(lm16).all()

    from moditalker_tpu.preprocess.recon_net import ReconNet
    from moditalker_tpu.preprocess.reconstructor import Reconstructor
    from moditalker_tpu.preprocess.load_mats import synthetic_lm3d_std

    rp = jax.jit(ReconNet().init)(jax.random.PRNGKey(1),
                                  jnp.zeros((1, 224, 224, 3)))
    rec = Reconstructor(rp, synthetic_lm3d_std(), chunk=2,
                        dtype=jnp.bfloat16)
    lm68 = np.tile(lm16[:1], (2, 1, 1))
    coeff, _ = rec.recon_coeff(
        rng.integers(0, 255, (2, 256, 256, 3)).astype(np.uint8), lm68)
    assert coeff.shape == (2, 257)
    assert np.isfinite(coeff).all()
