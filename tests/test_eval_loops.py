"""In-training eval loop tests with mock models."""

import numpy as np

from moditalker_tpu.evals import loops


def _batches(n=3, b=2):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield rng.uniform(-1, 1, (b, 4, 16, 16, 3)).astype(np.float32)


def test_eval_ae_psnr_identity_is_inf_free():
    val = loops.eval_ae_psnr(lambda v: v * 0.9, _batches())
    assert np.isfinite(val)
    # a closer reconstruction gives higher PSNR
    better = loops.eval_ae_psnr(lambda v: v * 0.99, _batches())
    assert better > val


def test_eval_rfvd_with_mock_i3d():
    def mock_i3d(videos):
        # cheap embedding: per-clip channel means + stds
        v = np.asarray(videos)
        return np.concatenate(
            [v.mean(axis=(1, 2, 3)), v.std(axis=(1, 2, 3))], axis=-1)

    perfect = loops.eval_ae_rfvd(lambda v: v, _batches(), mock_i3d,
                                 max_batches=3)
    # sqrtm via SVD leaves tiny numerical residue even on identical sets
    assert perfect < 1e-2
    worse = loops.eval_ae_rfvd(lambda v: v * 0.2, _batches(), mock_i3d,
                               max_batches=3)
    assert worse > perfect * 10


def test_eval_sample_fvd_runs():
    rng = np.random.default_rng(1)

    def mock_i3d(videos):
        v = np.asarray(videos)
        return v.mean(axis=(1, 2, 3))

    def sample_fn(batch):
        return rng.uniform(-1, 1, batch["x"].shape)

    batches = [{"x": rng.uniform(-1, 1, (2, 4, 16, 16, 3))} for _ in range(2)]
    val = loops.eval_sample_fvd(sample_fn, batches, mock_i3d, max_batches=2)
    assert np.isfinite(val)
