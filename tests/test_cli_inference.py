"""End-to-end CLI inference tests on tiny synthetic fixtures.

Round-1 verdict item 2: the two commands users actually run for inference
(``sample`` ~ ref MToV/sample.py, ``atom-infer`` ~ ref AToM/inference.py)
must execute end-to-end under pytest and produce output files in the
reference layouts (sample.py:388-428, AToM/inference.py:151-177).
"""

import os

import numpy as np
import pytest

from moditalker_tpu import cli

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
TINY = os.path.join(CONFIGS, "tiny.yaml")


def test_cli_atom_infer_e2e(tmp_path, capsys):
    rng = np.random.default_rng(0)
    kp_dir = tmp_path / "keypoints"
    for ident in ("idA", "idB"):
        os.makedirs(kp_dir / ident)
        np.save(kp_dir / ident / "00000.npy",
                rng.normal(scale=0.3, size=(68, 3)).astype(np.float32))
    hub = tmp_path / "hubert.npy"
    np.save(hub, rng.normal(size=(30, 1024)).astype(np.float32))
    out = tmp_path / "out"

    cli.main(["atom-infer", "--config", TINY,
              "--keypoint-dir", str(kp_dir), "--hubert", str(hub),
              "--out-dir", str(out), "--seed", "0"])

    # reference layout: frontalized_npy/{id}/*.npy, [T,68,3] float
    for ident in ("idA", "idB"):
        p = out / "frontalized_npy" / ident / "atom.npy"
        assert p.exists(), f"missing {p}"
        lm = np.load(p)
        assert lm.shape == (12, 68, 3)  # tiny.yaml horizon
        assert np.isfinite(lm).all()
    # the two identities must differ (different keypoints + rng stream)
    a = np.load(out / "frontalized_npy" / "idA" / "atom.npy")
    b = np.load(out / "frontalized_npy" / "idB" / "atom.npy")
    assert not np.allclose(a, b)


@pytest.fixture()
def sample_fixture(tmp_path):
    """Tiny frames dir + aligned landmark dir (the motion-align output
    layout the sample command consumes)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    frames = tmp_path / "frames"
    aligned = tmp_path / "aligned"
    os.makedirs(frames)
    os.makedirs(aligned)
    n = 8  # two 4-frame windows at tiny.yaml timesteps=4
    for i in range(n):
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(frames / f"{i:05d}.jpg")
        lm = rng.uniform(4, 28, (68, 2)).astype(np.float32)
        np.save(aligned / f"{i:05d}.npy", lm)
    return frames, aligned


def test_cli_sample_e2e(sample_fixture, tmp_path):
    frames, aligned = sample_fixture
    out = tmp_path / "out"
    cli.main(["sample", "--config", TINY,
              "--frames-dir", str(frames), "--aligned-dir", str(aligned),
              "--out-dir", str(out), "--seed", "0"])
    produced = [f for f in os.listdir(out)
                if f.startswith("sample.")]  # .mp4, or .npz without ffmpeg
    assert produced, f"no sample output in {out}"
    path = out / produced[0]
    if path.suffix == ".npz":
        vid = np.load(path)["frames"]
        assert vid.shape == (8, 32, 32, 3)  # 2 windows x 4 frames
        assert vid.dtype == np.uint8
    else:
        assert path.stat().st_size > 0


def test_cli_sample_noised_start(sample_fixture, tmp_path):
    """Fast AR mode: partial renoise from the ground-truth latent
    (ref scripts/inference/sample.sh:10, ddpm.py:407-454)."""
    frames, aligned = sample_fixture
    out = tmp_path / "out_noised"
    cli.main(["sample", "--config", TINY,
              "--frames-dir", str(frames), "--aligned-dir", str(aligned),
              "--noised-start-ratio", "0.5",
              "--out-dir", str(out), "--seed", "0"])
    assert any(f.startswith("sample.") for f in os.listdir(out))
