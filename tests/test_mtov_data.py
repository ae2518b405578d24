"""MToV host data-pipeline tests: resize parity vs torch, rasterization,
masking, InfiniteSampler."""

import numpy as np
import pytest

from moditalker_tpu.data import mtov_dataset as md

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


def test_bilinear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (2, 37, 53, 3)).astype(np.float32)
    got = md.bilinear_resize(img, 16, 16)
    t = torch.tensor(img).permute(0, 3, 1, 2)
    expected = F.interpolate(t, size=(16, 16), mode="bilinear",
                             align_corners=False)
    expected = expected.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


@needs_ref
def test_resize_crop_matches_reference():
    torch = pytest.importorskip("torch")
    du = ref_oracle.import_mtov_module("tools.data_utils")
    rng = np.random.default_rng(1)
    video = rng.uniform(0, 255, (4, 120, 90, 3)).astype(np.float32)
    # reference takes [t, c, h, w], returns [c, t, h, w]
    ref_in = torch.tensor(video.transpose(0, 3, 1, 2))
    expected = du.resize_crop(ref_in, resolution=64).numpy()  # [c,t,h,w]
    got = md.resize_crop(video, 64)  # [t,h,w,c]
    np.testing.assert_allclose(
        got.transpose(3, 0, 1, 2), expected, rtol=1e-4, atol=1e-3)


def test_rasterize_landmarks_dots():
    lm = np.array([[[100, 100], [10, 240]] + [[128, 128]] * 66])
    img = md.rasterize_landmarks(lm, size=256)
    assert img.shape == (1, 256, 256, 3)
    assert img[0, 100, 100, 0] == 255       # dot center set
    assert img[0, 103, 100, 0] == 255       # radius-3 extent
    assert img[0, 110, 100, 0] == 0         # outside the dot
    assert img.dtype == np.uint8


def test_crop_lower_half():
    img = np.full((64, 64, 3), 200, np.uint8)
    lm = np.zeros((68, 2))
    lm[33] = [32, 40]
    out = md.crop_lower_half(img, lm)
    assert out[39].max() == 200
    assert out[40].max() == 0


def test_infinite_sampler_strides():
    s0 = md.InfiniteSampler(10, rank=0, num_replicas=2, seed=1)
    s1 = md.InfiniteSampler(10, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < 10 for i in a + b)
    # both ranks together cover the dataset reasonably often
    assert len(set(a)) > 5 and len(set(b)) > 5


@needs_ref
def test_infinite_sampler_matches_reference():
    du = ref_oracle.import_mtov_module("tools.data_utils")

    class _DS:
        def __len__(self):
            return 13

    # newer torch removed Sampler.__init__(dataset); build via __new__ and
    # set the attributes __iter__ reads
    ref = du.InfiniteSampler.__new__(du.InfiniteSampler)
    ref.dataset = _DS()
    ref.rank = 0
    ref.num_replicas = 2
    ref.shuffle = True
    ref.seed = 7
    ref.window_size = 0.5
    ref_it = iter(ref)
    got_it = iter(md.InfiniteSampler(13, rank=0, num_replicas=2, seed=7))
    ref_seq = [next(ref_it) for _ in range(50)]
    got_seq = [next(got_it) for _ in range(50)]
    assert ref_seq == got_seq
