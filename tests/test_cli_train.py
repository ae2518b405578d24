"""CLI training-path tests: the real second stage and first-stage probes
are reachable from commands (VERDICT r2 #3/#5)."""

import json
import os

import numpy as np

from moditalker_tpu import cli

TINY = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny.yaml")


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_train_diffusion_real_second_stage(tmp_path, capsys):
    """train-diffusion (no --latents-only) runs frozen AEs + video batches
    through LatentDiffusionLoop, logs a sample probe and saves an EMA
    checkpoint at the reference cadence."""
    out = tmp_path / "run"
    cli.main(["train-diffusion", "--config", TINY, "--synthetic",
              "--steps", "2", "--batch-size", "8",
              "--ckpt-every", "2", "--eval-every", "2",
              "--out-dir", str(out), "--seed", "0"])
    stdout = capsys.readouterr().out
    assert "probe @2" in stdout and "sample_psnr" in stdout

    recs = _read_jsonl(out / "logs" / "metrics.jsonl")
    assert any("sample_psnr" in r for r in recs)

    # EMA checkpoints exist and contain ema_params
    ckpt_dir = out / "diffusion_ema"
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert steps, list(os.listdir(ckpt_dir))

    from moditalker_tpu.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(ckpt_dir))
    state = mgr.restore()
    assert "ema_params" in state
    assert int(np.asarray(state["step"])) >= 2


def test_train_diffusion_latents_only_smoke(tmp_path, capsys):
    cli.main(["train-diffusion", "--config", TINY, "--latents-only",
              "--steps", "2", "--batch-size", "8",
              "--out-dir", str(tmp_path), "--seed", "0"])
    out = capsys.readouterr().out
    assert "loss" in out


def test_train_first_stage_probes(tmp_path, capsys):
    """train-first-stage logs PSNR probes and saves full-state checkpoints
    at --eval-every (ref trainer.py:232-257 cadence)."""
    out = tmp_path / "fs"
    cli.main(["train-first-stage", "--config", TINY, "--synthetic",
              "--steps", "2", "--batch-size", "8", "--eval-every", "2",
              "--out-dir", str(out), "--seed", "0"])
    stdout = capsys.readouterr().out
    assert "eval_psnr" in stdout

    recs = _read_jsonl(out / "logs" / "metrics.jsonl")
    assert any("eval_psnr" in r for r in recs)
    ckpt_dir = out / "ae_rgb_ckpt"
    assert any(d.isdigit() for d in os.listdir(ckpt_dir))
