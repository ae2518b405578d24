"""Fused align-chunk program (S3FD→crop→FAN→POS→crop→ReconNet in ONE
dispatch) vs the modular three-program path it replaces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moditalker_tpu.preprocess import align
from moditalker_tpu.preprocess.fan import (FAN, FanLandmarker,
                                           bbox_to_center_scale, crop_face)
from moditalker_tpu.preprocess.fused_align import (FusedAligner,
                                                   best_box_per_frame)
from moditalker_tpu.preprocess.load_mats import synthetic_lm3d_std
from moditalker_tpu.preprocess.recon_net import ReconNet
from moditalker_tpu.preprocess.s3fd import (S3FD, S3FDDetector,
                                            decode_detections_batch)

H = W = 96
T = 5


@pytest.fixture(scope="module")
def nets():
    key = jax.random.PRNGKey(0)
    s3_p = jax.jit(S3FD().init)(key, jnp.zeros((1, H, W, 3)))
    fan_p = jax.jit(FAN(num_modules=1).init)(key,
                                             jnp.zeros((1, 256, 256, 3)))
    recon_p = jax.jit(ReconNet().init)(key, jnp.zeros((1, 224, 224, 3)))
    return s3_p, fan_p, recon_p


@pytest.fixture(scope="module")
def frames():
    return np.random.default_rng(7).integers(
        0, 255, (T, H, W, 3)).astype(np.uint8)


@pytest.fixture(scope="module")
def fused(nets):
    s3_p, fan_p, recon_p = nets
    return FusedAligner(s3_p, fan_p, recon_p, synthetic_lm3d_std(),
                        threshold=0.5, chunk=4, num_modules=1)


def test_best_box_matches_modular_top1():
    """Device top-1 == host decode→NMS→dets[0] (NMS keeps best first)."""
    rng = np.random.default_rng(3)
    olist = []
    for i in range(6):
        hw = max(96 // (2 << (i + 1)), 1)
        logits = rng.normal(size=(T, hw, hw, 2)).astype(np.float32)
        conf = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        olist.append(conf)
        olist.append(rng.normal(
            scale=0.3, size=(T, hw, hw, 4)).astype(np.float32))
    box, score = jax.jit(best_box_per_frame)(
        [jnp.asarray(o) for o in olist])
    dets = decode_detections_batch(olist, threshold=0.5)
    for i in range(T):
        assert dets[i].shape[0] > 0
        np.testing.assert_allclose(np.asarray(box)[i], dets[i][0, :4],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(score)[i], dets[i][0, 4],
                                   rtol=1e-5)


def test_fused_crop256_matches_crop_face(fused, frames):
    """The in-program FAN crop == fan.crop_face (zero-pad canvas + torch
    bilinear + uint8 rounding), bit-near."""
    _, crops, _ = fused._jit_debug(fused.params, jnp.asarray(frames[:4]))
    rows = fused.process(frames)
    for i in range(4):
        center, scale = bbox_to_center_scale(rows["boxes"][i])
        ref = crop_face(frames[i].astype(np.float32), center, scale)
        ref = np.clip(np.rint(ref), 0, 255)
        got = np.asarray(crops)[i]
        assert np.abs(got - ref).max() <= 1.0  # fp32 rint boundary ties
        assert (np.abs(got - ref) > 0).mean() < 0.01


def test_fused_crop224_matches_bilinear_reference(fused, frames):
    """The in-program recon crop == a host bilinear resample at the
    reference's resize-then-crop affine (align.crop_box); the modular path
    keeps PIL bicubic — the affine must agree, the filter is documented to
    differ."""
    _, _, crops224 = fused._jit_debug(fused.params, jnp.asarray(frames[:4]))
    rows = fused.process(frames)
    for i in range(4):
        # integer crop derivation in fp32, mirroring the device: at exact
        # ties (e.g. the POS scale clamp making W·s == 224.0) fp32 and the
        # host's float64 truncate to DIFFERENT integers — both are valid,
        # the reference's own behavior at such ties is float noise
        s = np.float32(rows["s"][i])
        t2 = rows["t"][i].astype(np.float32)
        wr = float(np.trunc(np.float32(W) * s))
        hr = float(np.trunc(np.float32(H) * s))
        left = float(np.trunc(np.float32(wr / 2 - 112) + (t2[0] - W / 2) * s))
        up = float(np.trunc(np.float32(hr / 2 - 112) + (H / 2 - t2[1]) * s))
        img = frames[i].astype(np.float32)
        o = np.arange(224)
        xs = (left + o + 0.5) * (W / wr) - 0.5
        ys = (up + o + 0.5) * (H / hr) - 0.5

        def samp(ys, xs):
            ylo = np.floor(ys).astype(int)
            xlo = np.floor(xs).astype(int)
            yf = (ys - ylo)[:, None, None]
            xf = (xs - xlo)[None, :, None]

            def at(yi, xi):
                ok = ((yi >= 0) & (yi < H))[:, None] \
                    & ((xi >= 0) & (xi < W))[None]
                return img[np.clip(yi, 0, H - 1)[:, None],
                           np.clip(xi, 0, W - 1)[None, :]] * ok[..., None]

            return (at(ylo, xlo) * (1 - xf) * (1 - yf)
                    + at(ylo, xlo + 1) * xf * (1 - yf)
                    + at(ylo + 1, xlo) * (1 - xf) * yf
                    + at(ylo + 1, xlo + 1) * xf * yf)

        ref = np.clip(np.rint(samp(ys, xs)), 0, 255)
        got = np.asarray(crops224)[i]
        assert np.abs(got - ref).max() <= 1.0
        assert (np.abs(got - ref) > 0).mean() < 0.01


def test_fused_matches_modular_landmarks_and_pos(nets, frames, fused):
    """lm68 / POS t,s from the fused program == the modular
    S3FDDetector→FanLandmarker→crop_params chain (same boxes, same crops,
    same net) to fp32 tolerance."""
    s3_p, fan_p, _ = nets
    det = S3FDDetector(s3_p, threshold=0.5, chunk=4)
    lmk = FanLandmarker(fan_p, num_modules=1, chunk=4)

    rows = fused.process(frames)
    assert rows["detected"].all()  # random-weight softmax: max conf ~ 1

    boxes = det.boxes_for_frames(frames)
    np.testing.assert_allclose(rows["boxes"], boxes, rtol=1e-4, atol=1e-3)

    lm68_mod = lmk.landmarks_batched(frames, boxes)
    np.testing.assert_allclose(rows["lm68"], lm68_mod, atol=0.35)
    # sub-pixel: the ±0.25 argmax-gradient shift can flip on fp32 ties;
    # require near-exact agreement for the overwhelming majority
    assert (np.abs(rows["lm68"] - lm68_mod) < 1e-2).mean() > 0.95

    lm5 = align.lm68_to_lm5(lm68_mod)
    for i in range(T):
        p = align.crop_params((W, H), lm5[i], np.asarray(
            synthetic_lm3d_std(), np.float64))
        np.testing.assert_allclose(rows["t"][i], np.asarray(
            p["t"]).ravel(), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(rows["s"][i], p["s"], rtol=2e-3)


def test_motion_aligner_fused_path_and_fallback(nets, frames):
    """MotionAligner(fused=...) aligns via the fused rows; an
    all-undetected chunk falls back to the modular callables."""
    from moditalker_tpu.preprocess.motion_align import (MotionAligner,
                                                        pose_align_landmarks)

    s3_p, fan_p, recon_p = nets
    lm3d = synthetic_lm3d_std()
    fused = FusedAligner(s3_p, fan_p, recon_p, lm3d, threshold=0.5,
                         chunk=4, num_modules=1)
    lm68_atom = np.random.default_rng(0).normal(
        scale=0.3, size=(T, 68, 3)).astype(np.float32)

    aligner = MotionAligner(None, None, lm3d, fused=fused)
    out = aligner.align_sequence(lm68_atom, frames)
    assert out.shape == (T, 68, 2)

    rows = fused.process(frames)
    sizes = np.tile([[W, H]], (T, 1))
    ref = pose_align_landmarks(lm68_atom, rows["coeff"], rows["lm68"],
                               sizes, np.asarray(lm3d, np.float64),
                               crop_t=rows["t"], crop_s=rows["s"])
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    # precomputed t/s == recomputed-from-lm68 t/s (same POS math)
    ref2 = pose_align_landmarks(lm68_atom, rows["coeff"], rows["lm68"],
                                sizes, np.asarray(lm3d, np.float64))
    np.testing.assert_allclose(out, ref2, atol=0.2)

    # fallback: impossible threshold → detected none → modular callables
    fused_hi = FusedAligner(s3_p, fan_p, recon_p, lm3d, threshold=2.0,
                            chunk=4, num_modules=1)
    calls = []

    def lm_fn(fr):
        calls.append("lm")
        return rows["lm68"]

    def co_fn(fr, lm5):
        calls.append("co")
        return rows["coeff"]

    aligner2 = MotionAligner(lm_fn, co_fn, lm3d, fused=fused_hi)
    out2 = aligner2.align_sequence(lm68_atom, frames)
    assert calls == ["lm", "co"]
    assert out2.shape == (T, 68, 2)

    # require_detection=False keeps the fused rows even when undetected
    aligner3 = MotionAligner(lm_fn, co_fn, lm3d, fused=fused_hi,
                             require_detection=False)
    calls.clear()
    aligner3.align_sequence(lm68_atom, frames)
    assert calls == []
