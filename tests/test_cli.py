"""CLI smoke tests (tiny synthetic runs + checkpoint conversion)."""

import numpy as np
import pytest


def test_cli_help_lists_all_commands(capsys):
    from moditalker_tpu import cli

    with pytest.raises(SystemExit):
        cli.main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("train-atom", "train-first-stage", "train-diffusion",
                "sample", "atom-infer", "process-audio",
                "convert-checkpoint"):
        assert cmd in out, cmd


def test_convert_checkpoint_atom(tmp_path):
    torch = pytest.importorskip("torch")
    import sys

    from . import ref_oracle

    if not ref_oracle.has_reference():
        pytest.skip("no reference")
    ref_model = ref_oracle.import_atom_module("model.model")
    torch.manual_seed(0)
    tmodel = ref_model.MotionDecoder(
        nfeats=204, seq_len=156, latent_dim=512, ff_size=1024, num_layers=8,
        num_heads=8, dropout=0.0, cond_feature_dim=1024,
        activation=torch.nn.functional.gelu)
    ckpt = {"ema_state_dict": tmodel.state_dict(),
            "model_state_dict": tmodel.state_dict(),
            "optimizer_state_dict": {}}
    pth = str(tmp_path / "train-5.pt")
    torch.save(ckpt, pth)

    from moditalker_tpu import cli

    out = str(tmp_path / "atom_params")
    cli.main(["convert-checkpoint", "--torch-ckpt", pth, "--kind", "atom",
              "--ema", "--out", out])

    from moditalker_tpu.core.checkpoint import load_single

    tree = load_single(out)
    assert "params" in tree
    w = np.asarray(tree["params"]["final_layer"]["kernel"])
    np.testing.assert_allclose(
        w, tmodel.final_layer.weight.detach().numpy().T, rtol=1e-6)


def test_process_audio_flax_path(tmp_path, monkeypatch):
    """--hubert-ckpt routes through the jitted flax encoder (bucketed
    serving path) instead of torch transformers; verified with a tiny
    checkpoint by stubbing the model builder while keeping the real
    chunking + save pipeline."""
    import wave as wavemod

    import numpy as np

    from moditalker_tpu import cli
    from moditalker_tpu.core.checkpoint import save_single
    from moditalker_tpu.preprocess import audio as audio_mod

    wav = tmp_path / "a.wav"
    sr = 16000
    samples = (np.sin(np.linspace(0, 300, sr)) * 0.2 * 32767).astype(
        np.int16)
    with wavemod.open(str(wav), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(samples.tobytes())

    ckpt = tmp_path / "hub"
    save_single(str(ckpt), {"marker": np.arange(3.0)})

    calls = {}

    def fake_forward(params, cfg=None, bucket_samples=32000):
        calls["params"] = params

        def fn(wave_arr):
            n = wave_arr.shape[1]
            t = audio_mod.expected_num_frames(n)
            return np.zeros((max(t, 1), 1024), np.float32)

        return fn

    monkeypatch.setattr(audio_mod, "flax_hubert_forward", fake_forward)
    out = tmp_path / "feats.npy"
    cli.main(["process-audio", "--audio", str(wav), "--out", str(out),
              "--hubert-ckpt", str(ckpt)])
    assert "params" in calls  # the flax path was taken with loaded params
    np.testing.assert_allclose(np.asarray(calls["params"]["marker"]),
                               np.arange(3.0))
    feats = np.load(out)
    assert feats.shape == (audio_mod.expected_num_frames(sr), 1024)
