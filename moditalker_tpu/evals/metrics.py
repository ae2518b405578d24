"""Scalar quality metrics: PSNR, landmark L2, reconstruction eval loops.

Re-implements ``MToV/utils.py:psnr`` (:117) and ``MToV/evals/eval.py``'s
``test_psnr`` (:47-76); adds the landmark-L2 metric used for AToM parity
(the reference computes it ad hoc in commented-out code,
AToM/model/diffusion.py:502-516). The diffusion-FVD eval that the reference
stubs out (``test_fvd_ddpm`` returns 0, evals/eval.py:240) is implemented
for real in ``evals.fvd.compute_fvd``.
"""

from __future__ import annotations

import numpy as np


def psnr(mse: float, max_val: float = 1.0) -> float:
    """ref MToV/utils.py:117-121 (inputs scaled to [0,1])."""
    return float(20 * np.log10(max_val) - 10 * np.log10(mse))


def video_psnr(real: np.ndarray, fake: np.ndarray) -> float:
    """Videos in [-1, 1] → PSNR on the [0,1] scale like test_psnr
    (evals/eval.py:57-66: (x+1)/2 then MSE over all dims per batch)."""
    r = (np.asarray(real, np.float64) + 1.0) / 2.0
    f = (np.asarray(fake, np.float64) + 1.0) / 2.0
    mse = ((r - f) ** 2).mean(axis=tuple(range(1, r.ndim)))
    return float(np.mean([psnr(m) for m in mse]))


def landmark_l2(pred: np.ndarray, target: np.ndarray) -> float:
    """Mean per-landmark Euclidean distance, [T,68,3] or [B,T,68,3]."""
    d = np.linalg.norm(np.asarray(pred) - np.asarray(target), axis=-1)
    return float(d.mean())


def ae_reconstruction_eval(ae_apply, batches, max_batches: int = 100) -> float:
    """AE recon PSNR over a batch iterator (ref test_psnr, eval.py:47-76).
    ``ae_apply(video)`` → reconstruction, both [B,T,H,W,3] in [-1,1]."""
    vals = []
    for i, video in enumerate(batches):
        if i >= max_batches:
            break
        recon = np.asarray(ae_apply(video))
        vals.append(video_psnr(video, recon))
    return float(np.mean(vals))


def mouth_landmark_l2(pred: np.ndarray, target: np.ndarray) -> float:
    """M-LMD: mean mouth-landmark (48:68) distance — the paper's lip-sync
    proxy metric (landmarks [.., 68, 2or3])."""
    return landmark_l2(np.asarray(pred)[..., 48:68, :],
                       np.asarray(target)[..., 48:68, :])


def face_landmark_l2(pred: np.ndarray, target: np.ndarray) -> float:
    """F-LMD: mean full-face landmark distance."""
    return landmark_l2(pred, target)
