"""HuBERT audio feature extraction with the reference's exact chunking.

Re-implements ``data/data_utils/preprocess/process_audio.py:10-55``:
16 kHz speech → [T, 1024] features where T = (samples - (400-320)) // 320,
computed in overlapping clips of 320·1000 samples (each extended by
kernel−stride so conv windows line up), then padded/trimmed to expected_T.

The HuBERT model itself is pluggable:
  * ``torch_hubert_forward`` — transformers' torch HuBERT on host CPU (the
    reference path; requires downloaded weights);
  * any callable ``wave [1, N] float32 → features [T', 1024]`` works, e.g. a
    jitted flax port — the chunking logic is model-agnostic.

``ffmpeg_resample_to_16k`` mirrors the reference's ffmpeg resample step
(process_audio.py:57-64).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

KERNEL = 400
STRIDE = 320
CLIP_LENGTH = STRIDE * 1000


def expected_num_frames(n_samples: int) -> int:
    return (n_samples - (KERNEL - STRIDE)) // STRIDE


def chunk_bounds(n_samples: int) -> list[tuple[int, int]]:
    """Clip boundaries exactly as the reference iterates (ref :28-47)."""
    bounds = []
    num_iter = n_samples // CLIP_LENGTH
    for i in range(num_iter):
        if i == 0:
            bounds.append((0, CLIP_LENGTH - STRIDE + KERNEL))
        else:
            start = CLIP_LENGTH * i
            bounds.append((start, start + (CLIP_LENGTH - STRIDE + KERNEL)))
    tail_start = CLIP_LENGTH * num_iter if num_iter > 0 else 0
    if n_samples - tail_start >= KERNEL:  # skip sub-kernel tails (ref :45)
        bounds.append((tail_start, n_samples))
    return bounds


def extract_hubert_features(speech: np.ndarray, model_fn) -> np.ndarray:
    """speech: [N] float 16 kHz mono (stereo takes channel 0, ref :21-22);
    model_fn: [1, n] → [T', D]. Returns [expected_T, D]."""
    speech = np.asarray(speech, np.float32)
    if speech.ndim == 2:
        speech = speech[:, 0]
    n = speech.shape[0]
    exp_t = expected_num_frames(n)
    feats = []
    for start, end in chunk_bounds(n):
        out = np.asarray(model_fn(speech[None, start:end]))
        feats.append(out.reshape(-1, out.shape[-1]))
    ret = np.concatenate(feats, axis=0) if feats else np.zeros((0, 1024))
    assert abs(ret.shape[0] - exp_t) <= 1, (ret.shape, exp_t)
    if ret.shape[0] < exp_t:
        ret = np.pad(ret, ((0, exp_t - ret.shape[0]), (0, 0)))
    return ret[:exp_t]


def normalize_like_wav2vec2(speech: np.ndarray) -> np.ndarray:
    """Zero-mean unit-variance per utterance — what Wav2Vec2Processor does
    for hubert-large-ls960-ft (do_normalize=True)."""
    speech = np.asarray(speech, np.float32)
    return (speech - speech.mean()) / np.sqrt(speech.var() + 1e-7)


def torch_hubert_forward(model_name: str = "facebook/hubert-large-ls960-ft",
                         device: str = "cpu"):
    """Build the reference model_fn via transformers (requires weights on
    disk / hub access). Returns a callable for ``extract_hubert_features``."""
    import torch
    from transformers import HubertModel

    model = HubertModel.from_pretrained(model_name).to(device).eval()

    def fn(wave):
        with torch.no_grad():
            out = model(torch.tensor(wave, device=device)).last_hidden_state
        return out[0].cpu().numpy()

    return fn


def conv_out_frames(n: int, cfg=None) -> int:
    """Output frame count of the HuBERT conv feature extractor (VALID
    convs) for an n-sample wave."""
    from .hubert import HubertConfig

    c = cfg or HubertConfig()
    for k, s in zip(c.conv_kernel, c.conv_stride):
        n = (n - k) // s + 1
    return n


def flax_hubert_forward(params, cfg=None, bucket_samples: int = 32000):
    """TPU-native model_fn: jitted flax HuBERT encoder with static-shape
    bucketing. Full 10 s clips share one program; the per-utterance tail
    chunk is zero-padded up to the next ``bucket_samples`` multiple (2 s
    default) and masked — valid-frame outputs are exactly the unpadded
    forward's (see HubertEncoder.__call__), so serving compiles at most
    ~10 programs total instead of one 24-layer compile per distinct
    utterance length."""
    import jax
    import jax.numpy as jnp

    from .hubert import HubertConfig, HubertEncoder

    c = cfg or HubertConfig()
    model = HubertEncoder(c)
    apply = jax.jit(model.apply)

    def fn(wave):
        wave = np.asarray(wave, np.float32)
        n = wave.shape[1]
        t_true = conv_out_frames(n, c)
        full = CLIP_LENGTH - STRIDE + KERNEL
        # chunk_bounds never exceeds `full`; an oversize caller wave just
        # runs unpadded at its own shape
        n_pad = n if n >= full else (
            ((n + bucket_samples - 1) // bucket_samples) * bucket_samples)
        if n_pad > n:
            wave = np.pad(wave, ((0, 0), (0, n_pad - n)))
        out = apply(params, jnp.asarray(wave),
                    n_frames=jnp.array([t_true], jnp.int32))
        return out[0, :t_true]

    return fn


def ffmpeg_resample_to_16k(src: str, dst: str,
                           sampling_rate: int = 16000) -> str:
    """ref convert_wav_sampling_rate (process_audio.py:57-64)."""
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    proc = subprocess.run(
        ["ffmpeg", "-i", src, "-f", "wav", "-ar", str(sampling_rate), dst,
         "-y"], capture_output=True)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[-300:])
    return dst
