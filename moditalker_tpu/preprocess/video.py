"""Video preparation utilities (ffmpeg/PIL host-side).

Re-implements ``data/data_utils/preprocess/unify_fps.py`` (ffmpeg -r 25) and
``video2frame_hdtf.py`` (frame extraction) as thin subprocess wrappers with
multiprocessing fan-out, matching the reference's output layout
({out_root}/{identity}/{frame:05d}.jpg).
"""

from __future__ import annotations

import os
import subprocess
from multiprocessing import Pool


def _run(cmd: list[str]):
    proc = subprocess.run(cmd, capture_output=True)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[-400:])


def unify_fps(src: str, dst: str, fps: int = 25) -> str:
    """ref unify_fps.py:19 — re-encode at a fixed frame rate."""
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    _run(["ffmpeg", "-y", "-i", src, "-r", str(fps), dst])
    return dst


def video_to_frames(src: str, out_dir: str, quality: int = 2) -> str:
    """ref video2frame_hdtf.py — dump frames as {i:05d}.jpg."""
    os.makedirs(out_dir, exist_ok=True)
    _run(["ffmpeg", "-y", "-i", src, "-qscale:v", str(quality),
          "-start_number", "0", os.path.join(out_dir, "%05d.jpg")])
    return out_dir


def probe_fps(src: str) -> float:
    """ffprobe frame rate (ref video2frame_hdtf.py ffprobe call)."""
    proc = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=r_frame_rate", "-of",
         "default=noprint_wrappers=1:nokey=1", src],
        capture_output=True, text=True)
    num, den = proc.stdout.strip().split("/")
    return float(num) / float(den)


def batch_videos_to_frames(jobs: list[tuple[str, str]],
                           processes: int = 4) -> list[str]:
    """Parallel frame extraction (ref multiprocessing Pool)."""
    with Pool(processes) as pool:
        return pool.starmap(video_to_frames, jobs)
