"""Golden-harness self-test (tiny configs, random weights): record → check
must pass; a perturbed goldens file must fail (verdict item 10)."""

import numpy as np
import pytest

from moditalker_tpu import cli, golden


def test_golden_record_then_check(tmp_path, capsys):
    g = tmp_path / "goldens.npz"
    cli.main(["golden", "--mode", "record", "--golden", str(g), "--tiny"])
    assert g.exists()

    cli.main(["golden", "--mode", "check", "--golden", str(g), "--tiny"])
    out = capsys.readouterr().out
    assert '"ok": true' in out

    # perturb one probe → check must fail with nonzero exit
    data = dict(np.load(g))
    data["atom_sequence"] = data["atom_sequence"] + 0.5
    np.savez_compressed(g, **data)
    with pytest.raises(SystemExit):
        cli.main(["golden", "--mode", "check", "--golden", str(g), "--tiny"])
    out = capsys.readouterr().out
    assert '"ok": false' in out


def test_golden_probes_deterministic():
    a = golden.run_probes(None, tiny=True)
    b = golden.run_probes(None, tiny=True)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
