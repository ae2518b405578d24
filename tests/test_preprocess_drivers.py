"""Corpus-driver tests: align-motion and extract-keypoints end to end on
tiny synthetic fixtures (VERDICT r2 #2 — the reference ships these as
runnable scripts, align_face_recon.py:240-348 / batchify.py:253-321)."""

import os

import numpy as np
import pytest

from moditalker_tpu import cli
from moditalker_tpu.preprocess import drivers


@pytest.fixture()
def corpus(tmp_path):
    """Two-identity frame corpus + frontalized AToM npy files."""
    from PIL import Image

    rng = np.random.default_rng(0)
    frames_root = tmp_path / "frames"
    front_root = tmp_path / "frontalized_npy"
    for ident in ("WDA_A", "WDA_B"):
        d = frames_root / ident
        d.mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, (64, 48, 3)).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i:05d}.jpg")
        fd = front_root / ident
        fd.mkdir(parents=True)
        np.save(fd / "atom_0.npy",
                rng.normal(scale=0.3, size=(6, 68, 3)).astype(np.float32))
    return tmp_path, frames_root, front_root


def test_align_motion_corpus(corpus):
    tmp, frames_root, front_root = corpus
    lf, cf, std, _, _ = drivers.build_detectors(synthetic=True)
    out = tmp / "out"
    written = drivers.align_motion_corpus(
        str(front_root), str(frames_root), str(out), lf, cf, std, chunk=4)
    assert set(written) == {"WDA_A", "WDA_B"}
    for ident in written:
        d = out / "aligned_npy" / ident
        files = sorted(os.listdir(d))
        assert files == [f"{i:05d}.npy" for i in range(6)]
        arr = np.load(d / files[0])
        assert arr.shape == (68, 2) and arr.dtype == np.int64

    # resume: a second run skips completed identities (0 new frames)
    again = drivers.align_motion_corpus(
        str(front_root), str(frames_root), str(out), lf, cf, std, chunk=4)
    assert all(v == 0 for v in again.values())


def test_align_motion_striping(corpus):
    tmp, frames_root, front_root = corpus
    lf, cf, std, _, _ = drivers.build_detectors(synthetic=True)
    out = tmp / "striped"
    w0 = drivers.align_motion_corpus(
        str(front_root), str(frames_root), str(out), lf, cf, std,
        process_id=0, total_processes=2)
    w1 = drivers.align_motion_corpus(
        str(front_root), str(frames_root), str(out), lf, cf, std,
        process_id=1, total_processes=2)
    assert set(w0) | set(w1) == {"WDA_A", "WDA_B"}
    assert not (set(w0) & set(w1))


def test_extract_keypoints_corpus(corpus):
    tmp, frames_root, _ = corpus
    lf, cf, std, helper, _ = drivers.build_detectors(synthetic=True)
    out = tmp / "kpts"
    written = drivers.extract_keypoints_corpus(
        str(frames_root), str(out), lf, cf, helper, std, batch_size=4)
    assert written == {"WDA_A": 6, "WDA_B": 6}
    for tree, shape in (("face-centric/unposed", (68, 3)),
                        ("face-centric/posed", (68, 3)),
                        ("fa", (68, 2)),
                        ("non-face-centric/posed", (68, 2))):
        p = out / tree / "WDA_A" / "00003.npy"
        assert p.exists(), tree
        assert np.load(p).shape == shape

    # resume: everything already written → 0 new frames
    again = drivers.extract_keypoints_corpus(
        str(frames_root), str(out), lf, cf, helper, std, batch_size=4)
    assert again == {"WDA_A": 0, "WDA_B": 0}


def test_extract_keypoints_skips_bad_batch(corpus, capsys):
    """A corrupt frame fails its batch only; the rest of the corpus is
    still processed (ref batchify.py:319-321 blanket-continue)."""
    tmp, frames_root, _ = corpus
    (frames_root / "WDA_A" / "00002.jpg").write_bytes(b"not a jpeg")
    lf, cf, std, helper, _ = drivers.build_detectors(synthetic=True)
    out = tmp / "kpts_bad"
    written = drivers.extract_keypoints_corpus(
        str(frames_root), str(out), lf, cf, helper, std, batch_size=2)
    assert written["WDA_B"] == 6
    assert written["WDA_A"] == 4  # one 2-frame batch lost


def test_cli_align_motion_and_extract_keypoints(corpus, capsys):
    """The CLI commands the docstring mapping table promises exist and run."""
    tmp, frames_root, front_root = corpus
    cli.main(["align-motion", "--frontalized-dir", str(front_root),
              "--frames-dir", str(frames_root),
              "--out-dir", str(tmp / "cli_out"), "--synthetic-detectors"])
    out = capsys.readouterr().out
    assert "aligned 12 frames across 2 identities" in out
    assert (tmp / "cli_out" / "aligned_npy" / "WDA_B" / "00005.npy").exists()

    cli.main(["extract-keypoints", "--frames-dir", str(frames_root),
              "--out-dir", str(tmp / "cli_kpts"), "--synthetic-detectors",
              "--batch-size", "3"])
    out = capsys.readouterr().out
    assert "extracted keypoints for 12 frames" in out
    assert (tmp / "cli_kpts" / "fa" / "WDA_A" / "00000.npy").exists()


def test_build_detectors_requires_ckpts_without_synthetic():
    with pytest.raises(ValueError):
        drivers.build_detectors(synthetic=False)
