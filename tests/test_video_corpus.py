"""unify-fps / video2frame corpus drivers + CLI subcommands.

ffmpeg is not installed in the CI image, so the subprocess invocation is
stubbed with a writer that records the exact command target — the tests
cover what IS this repo's code: corpus enumeration (both reference layouts),
striping, resume skipping, Pool fan-out, and the CLI wiring.
(ref unify_fps.py:19, video2frame_hdtf.py.)
"""

import os

import pytest

from moditalker_tpu import cli
from moditalker_tpu.preprocess import video as vid


@pytest.fixture()
def corpus(tmp_path):
    """Mixed-layout corpus: flat {id}.mp4 and nested {id}/video.mp4."""
    src = tmp_path / "src"
    os.makedirs(src)
    (src / "idA.mp4").write_bytes(b"x")
    os.makedirs(src / "idB")
    (src / "idB" / "video.mp4").write_bytes(b"x")
    (src / "notes.txt").write_text("ignored")
    os.makedirs(src / "empty_dir")
    return src


# module-level so Pool.starmap can pickle them by qualified name
def _fake_unify(src, dst, fps=25):
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with open(dst, "w") as f:
        f.write(f"{src}|{fps}")
    return dst


def _fake_v2f(src, out_dir, quality=2):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "00000.jpg"), "w") as f:
        f.write(f"{src}|{quality}")
    return out_dir


@pytest.fixture(autouse=True)
def stub_ffmpeg(monkeypatch):
    """Replace the ffmpeg subprocess with output-file writers."""
    monkeypatch.setattr(vid, "unify_fps", _fake_unify)
    monkeypatch.setattr(vid, "video_to_frames", _fake_v2f)


def test_corpus_videos_both_layouts(corpus):
    vids = vid.corpus_videos(str(corpus))
    assert vids == [("idA", str(corpus / "idA.mp4")),
                    ("idB", str(corpus / "idB" / "video.mp4"))]


def test_unify_fps_corpus_resume_and_stripe(corpus, tmp_path):
    out = tmp_path / "fps25"
    written = vid.unify_fps_corpus(str(corpus), str(out), fps=25,
                                   processes=1)
    assert len(written) == 2
    assert (out / "idA.mp4").read_text().endswith("|25")
    # resume: nothing re-encoded on a second pass
    again = vid.unify_fps_corpus(str(corpus), str(out), fps=25, processes=1)
    assert again == []
    # striping covers disjoint subsets that union to the corpus
    out2 = tmp_path / "striped"
    a = vid.unify_fps_corpus(str(corpus), str(out2), processes=1,
                             process_id=0, total_processes=2)
    b = vid.unify_fps_corpus(str(corpus), str(out2), processes=1,
                             process_id=1, total_processes=2)
    assert len(a) == 1 and len(b) == 1
    assert sorted(os.listdir(out2)) == ["idA.mp4", "idB.mp4"]


def test_cli_unify_fps(corpus, tmp_path, capsys):
    out = tmp_path / "out"
    cli.main(["unify-fps", "--src-root", str(corpus),
              "--out-dir", str(out), "--fps", "30", "--processes", "1"])
    assert (out / "idB.mp4").read_text().endswith("|30")
    assert "re-encoded 2 videos" in capsys.readouterr().out


def test_cli_video2frame(corpus, tmp_path, capsys):
    out = tmp_path / "frames"
    cli.main(["video2frame", "--src-root", str(corpus),
              "--out-dir", str(out), "--processes", "1"])
    assert (out / "idA" / "00000.jpg").exists()
    assert (out / "idB" / "00000.jpg").exists()
    assert "extracted frames for 2 videos" in capsys.readouterr().out
    # resume: identity dirs holding jpgs are skipped
    cli.main(["video2frame", "--src-root", str(corpus),
              "--out-dir", str(out), "--processes", "1"])
    assert "extracted frames for 0 videos" in capsys.readouterr().out
