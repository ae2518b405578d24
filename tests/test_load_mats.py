"""BFM asset loaders (ref deep_3drecon/util/load_mats.py:35-133)."""

import os
from array import array

import numpy as np
import pytest
from scipy.io import loadmat, savemat

from moditalker_tpu.preprocess.load_mats import (lm68_template_to_lm5,
                                                 load_lm3d, synthetic_lm3d_std,
                                                 transfer_bfm09)


def test_load_lm3d_reduction(tmp_path):
    """The 68→5 reduction: nose 31, eye-corner means, mouth 49/55 (1-based),
    reordered (eyeL, eyeR, nose, mouthL, mouthR)."""
    rng = np.random.default_rng(0)
    lm = rng.normal(size=(68, 3))
    savemat(tmp_path / "similarity_Lm3D_all.mat", {"lm": lm})
    out = load_lm3d(str(tmp_path))
    idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    np.testing.assert_allclose(out[2], lm[idx[0]])                 # nose
    np.testing.assert_allclose(out[0], lm[idx[[1, 2]]].mean(0))    # eye L
    np.testing.assert_allclose(out[1], lm[idx[[3, 4]]].mean(0))    # eye R
    np.testing.assert_allclose(out[3], lm[idx[5]])                 # mouth L
    np.testing.assert_allclose(out[4], lm[idx[6]])                 # mouth R


def test_load_lm3d_fallback_without_asset(tmp_path):
    out = load_lm3d(str(tmp_path))  # no .mat present
    np.testing.assert_allclose(out, synthetic_lm3d_std())
    # template sanity: eyes above mouth, nose foremost (largest z)
    assert out[0, 1] > out[3, 1] and out[1, 1] > out[4, 1]
    assert out[2, 2] == out[:, 2].max()


def _write_synthetic_bfm09(d, n_raw=12, n_exp_v=10, n_front=6,
                           n_id_pc=5, n_exp_pc=4, n_tex_pc=5):
    """Tiny fake Basel-2009 release with the real file/shape layout."""
    rng = np.random.default_rng(1)
    savemat(os.path.join(d, "01_MorphableModel.mat"), {
        "shapePC": rng.normal(size=(3 * n_raw, n_id_pc)),
        "shapeEV": rng.uniform(1, 2, size=(n_id_pc, 1)),
        "shapeMU": rng.normal(size=(3 * n_raw, 1)),
        "texPC": rng.normal(size=(3 * n_raw, n_tex_pc)),
        "texEV": rng.uniform(1, 2, size=(n_tex_pc, 1)),
        "texMU": rng.normal(size=(3 * n_raw, 1)),
    })
    # Exp_Pca.bin: int32 dim, float32 mu [3V], float32 pc [dim*3V]
    with open(os.path.join(d, "Exp_Pca.bin"), "wb") as f:
        array("i", [n_exp_pc]).tofile(f)
        array("f", rng.normal(size=3 * n_exp_v).tolist()).tofile(f)
        array("f", rng.normal(size=n_exp_pc * 3 * n_exp_v).tolist()).tofile(f)
    np.savetxt(os.path.join(d, "std_exp.txt"),
               rng.uniform(1, 2, size=n_exp_pc))
    # index files (1-based, like the published assets)
    idx_front = rng.choice(n_exp_v, size=n_front, replace=False) + 1
    savemat(os.path.join(d, "BFM_front_idx.mat"),
            {"idx": idx_front.reshape(-1, 1)})
    trim = rng.choice(n_raw, size=n_exp_v, replace=False) + 1
    savemat(os.path.join(d, "BFM_exp_idx.mat"),
            {"trimIndex": trim.reshape(-1, 1)})
    savemat(os.path.join(d, "facemodel_info.mat"), {
        "tri": np.ones((4, 3)), "point_buf": np.ones((n_front, 8)),
        "tri_mask2": np.ones((4, 1)), "keypoints": np.ones((1, 68)),
        "frontmask2_idx": np.ones((5, 1)), "skinmask": np.ones((1, n_front)),
    })
    return idx_front - 1, trim - 1


def test_transfer_bfm09_structure_and_values(tmp_path):
    n_front, n_id_pc = 6, 5
    idx_front, trim = _write_synthetic_bfm09(str(tmp_path))
    path = transfer_bfm09(str(tmp_path), n_id=3, n_exp=2, n_tex=3)
    out = loadmat(path)
    assert out["idBase"].shape == (3 * n_front, 3)
    assert out["exBase"].shape == (3 * n_front, 2)
    assert out["texBase"].shape == (3 * n_front, 3)
    assert out["meanshape"].shape == (1, 3 * n_front)

    # value check: idBase = (shapePC * shapeEV / 1e5) re-indexed through
    # trim∘front (ref load_mats.py:52-80)
    raw = loadmat(tmp_path / "01_MorphableModel.mat")
    expect = raw["shapePC"] * raw["shapeEV"].reshape(1, n_id_pc) / 1e5
    expect = expect[:, :3].reshape(-1, 3, 3)[trim[idx_front].ravel()]
    np.testing.assert_allclose(out["idBase"],
                               expect.reshape(-1, 3), rtol=1e-6)
    mean_expect = (raw["shapeMU"].reshape(-1, 3) / 1e5)[trim[idx_front].ravel()]
    np.testing.assert_allclose(out["meanshape"].reshape(-1, 3),
                               mean_expect, rtol=1e-6)


def test_reconstructor_default_template():
    """Reconstructor loads the standard template when lm3d_std is omitted."""
    pytest.importorskip("jax")
    from moditalker_tpu.preprocess.reconstructor import Reconstructor

    # params are applied lazily; the template default resolves at ctor time
    r = Reconstructor(recon_params=None)
    np.testing.assert_allclose(r.lm3d_std, synthetic_lm3d_std())
