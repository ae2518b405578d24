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
