"""Recon network parity + motion-alignment pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moditalker_tpu.preprocess import motion_align
from moditalker_tpu.preprocess.recon_net import ReconNet, convert_recon_net

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def recon_params():
    """One ReconNet (ResNet-50) init shared by the module — each init
    executes ~5 s of random param generation on the CPU backend."""
    return jax.jit(ReconNet().init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 224, 224, 3)))


def test_recon_net_shapes(recon_params):
    model = ReconNet()
    x = jnp.zeros((1, 224, 224, 3))
    params = recon_params
    out = model.apply(params, x)
    assert out.shape == (1, 257)
    # zero-init heads → zero coefficients at init (ref networks.py:94-96)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


@needs_ref
def test_recon_net_parity():
    """flax ResNet-50 coeff regressor matches the reference torchvision-style
    ReconNetWrapper with ported random weights."""
    torch = pytest.importorskip("torch")
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(
        ref_oracle.REF_ROOT, "data", "data_utils", "deep_3drecon"))
    ref_oracle._stub_missing(ref_oracle._STUBS + [
        "kornia", "kornia.geometry", "kornia.geometry.transform"])
    try:
        networks = importlib.import_module("deep_3drecon_models.networks")
    except Exception as e:
        pytest.skip(f"reference networks module not importable: {e}")
    torch.manual_seed(0)
    tmodel = networks.ReconNetWrapper("resnet50", use_last_fc=False).eval()
    # randomize the zero-init heads so the test is not trivially 0 == 0
    with torch.no_grad():
        for layer in tmodel.final_layers:
            layer.weight.normal_(0, 0.02)
            layer.bias.normal_(0, 0.02)

    params = convert_recon_net(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()})
    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 224, 224)).astype(
        np.float32)
    with torch.no_grad():
        expected = tmodel(torch.tensor(x)).numpy()
    got = ReconNet().apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


def test_pose_align_identity_pose():
    """With zero rotation/translation and a centered similarity, the aligned
    landmarks must be a pure scale+flip+shift of the input — finite and
    inside the frame for reasonable inputs."""
    rng = np.random.default_rng(0)
    t = 4
    lm68_atom = np.tanh(rng.normal(size=(t, 68, 3))) * 0.5
    coeff = np.zeros((t, 257), np.float32)
    lm3d_std = rng.normal(size=(5, 3))
    s_true = 100.0
    w0, h0 = 512, 512
    base5 = np.stack([lm3d_std[:, 0] * s_true + w0 / 2,
                      lm3d_std[:, 1] * s_true + h0 / 2], axis=1)
    # synthesize driving 68-landmarks whose extracted 5p equals base5:
    lm68_drv = np.zeros((t, 68, 2))
    idx = motion_align.align.LM5_FROM_68
    order = [1, 2, 0, 3, 4]
    for k, o in enumerate(order):
        pass
    # place the seven source landmarks so extract_5p reproduces base5
    for b in range(t):
        lm68_drv[b, idx[0]] = base5[2]            # nose
        lm68_drv[b, idx[1]] = lm68_drv[b, idx[2]] = base5[0]
        lm68_drv[b, idx[3]] = lm68_drv[b, idx[4]] = base5[1]
        lm68_drv[b, idx[5]] = base5[3]
        lm68_drv[b, idx[6]] = base5[4]
    sizes = np.tile([[w0, h0]], (t, 1))
    out = motion_align.pose_align_landmarks(
        lm68_atom, coeff, lm68_drv, sizes, lm3d_std)
    assert out.shape == (t, 68, 2)
    assert np.isfinite(out).all()


def test_motion_aligner_writes_layout(tmp_path):
    rng = np.random.default_rng(0)
    frames = (rng.uniform(0, 255, (6, 64, 64, 3))).astype(np.uint8)
    lm68_atom = np.tanh(rng.normal(size=(6, 68, 3))) * 0.4

    def landmark_fn(f):
        return rng.uniform(10, 54, (f.shape[0], 68, 2))

    def coeff_fn(f, lm5):
        return np.zeros((f.shape[0], 257), np.float32)

    aligner = motion_align.MotionAligner(
        landmark_fn, coeff_fn, rng.normal(size=(5, 3)))
    paths = aligner.run(lm68_atom, frames, str(tmp_path), "WDA_Test")
    assert len(paths) == 6
    arr = np.load(paths[0])
    assert arr.shape == (68, 2) and arr.dtype == np.int64
    assert "aligned_npy/WDA_Test" in paths[0].replace("\\", "/")


def test_reconstructor_pipeline(tmp_path, recon_params):
    """Images + landmarks → coeffs with crop params, end to end."""
    from moditalker_tpu.preprocess.reconstructor import Reconstructor

    rng = np.random.default_rng(0)
    recon = Reconstructor(recon_params, rng.normal(size=(5, 3)), chunk=4)
    frames = rng.integers(0, 255, (3, 300, 280, 3)).astype(np.uint8)
    lm68 = rng.uniform(60, 220, (3, 68, 2))
    coeff, trans_params = recon.recon_coeff(frames, lm68)
    assert coeff.shape == (3, 257)
    assert len(trans_params) == 3
    assert "s" in trans_params[0] and "t" in trans_params[0]
    coeff2, crops, _ = recon.recon_coeff(frames, lm68, return_image=True)
    assert crops.shape == (3, 224, 224, 3)
    np.testing.assert_allclose(coeff, coeff2)

    # as a MotionAligner coeff_fn
    from moditalker_tpu.preprocess import align
    fn = recon.coeff_fn()
    out = fn(frames, align.lm68_to_lm5(lm68))
    assert out.shape == (3, 257)


def test_crop_params_degenerate_landmarks_bounded():
    """Collapsed lm5 -> POS scale explodes; the resize target must stay
    within int32/PIL bounds (regression from bench_e2e)."""
    from moditalker_tpu.preprocess import align

    lm5 = np.full((5, 2), 10.0)  # all five points identical
    lm5_3d = np.random.default_rng(0).normal(size=(5, 3))
    p = align.crop_params((128, 96), lm5, lm5_3d)
    w, h = p["img_size"]
    assert 1 <= int(w * p["s"]) <= 16384
    assert 1 <= int(h * p["s"]) <= 16384
    box = align.crop_box(p)
    assert all(abs(v) < 10**6 for v in box)
