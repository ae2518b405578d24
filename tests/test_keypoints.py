"""Keypoint-set extraction tests."""

import numpy as np

from moditalker_tpu.preprocess import keypoints
from moditalker_tpu.preprocess.bfm import Face3DHelper


def test_keypoint_sets_shapes_and_layout(tmp_path):
    rng = np.random.default_rng(0)
    b = 3
    helper = Face3DHelper.synthetic()
    coeff = rng.normal(scale=0.1, size=(b, 257)).astype(np.float32)
    lm68 = rng.uniform(50, 400, (b, 68, 2))
    sizes = np.tile([[512, 480]], (b, 1))
    lm3d_std = rng.normal(size=(5, 3))

    sets = keypoints.keypoint_sets(coeff, lm68, sizes, helper, lm3d_std)
    assert set(sets) == {"face-centric/unposed", "face-centric/posed",
                         "fa", "non-face-centric/posed"}
    assert sets["face-centric/unposed"].shape == (b, 68, 3)
    assert sets["face-centric/posed"].shape == (b, 68, 3)
    assert sets["fa"].shape == (b, 68, 2)
    assert sets["non-face-centric/posed"].shape == (b, 68, 2)
    for v in sets.values():
        assert np.isfinite(v).all()

    # mean-point match: 5p means of fa and matched landmarks coincide
    from moditalker_tpu.preprocess import align
    m_fa = align.lm68_to_lm5(sets["fa"]).mean(axis=1)
    m_po = align.lm68_to_lm5(sets["non-face-centric/posed"]).mean(axis=1)
    np.testing.assert_allclose(m_fa, m_po, atol=1e-6)

    paths = keypoints.write_keypoint_sets(
        sets, str(tmp_path), "WDA_X", ["00000.jpg", "00001.jpg", "00002.jpg"])
    assert len(paths) == 12
    arr = np.load(paths[0])
    assert arr.shape in ((68, 3), (68, 2))


def test_unposed_identity_zero_coeff():
    """Zero id/exp coefficients → unposed landmarks equal key_mean_shape."""
    helper = Face3DHelper.synthetic()
    coeff = np.zeros((1, 257), np.float32)
    lm68 = np.random.default_rng(0).uniform(50, 400, (1, 68, 2))
    sets = keypoints.keypoint_sets(
        coeff, lm68, np.array([[512, 512]]), helper,
        np.random.default_rng(1).normal(size=(5, 3)))
    np.testing.assert_allclose(
        sets["face-centric/unposed"][0], helper.key_mean_shape, atol=1e-6)


def test_shard_indices():
    idx = keypoints.shard_indices(10, 1, 3)
    assert idx == [1, 4, 7]
