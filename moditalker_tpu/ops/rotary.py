"""Rotary position embeddings (three variants used by the reference).

1. ``rotary_full_dim``: lucidrains rotary_embedding_torch semantics — applied
   to the FULL model dim before attention projection splits heads
   (AToM/model/rotary_embedding_torch.py:109-132, pairs interleaved via
   ``rotate_half``).
2. ``time_rotary_sincos`` / ``axial_rotary_sincos`` + ``apply_rot_emb``:
   TimeSformer per-head rotary over the time axis and axial (2D) rotary over
   space (MToV/models/autoencoder/vit_modules.py:8-63).

All tables are shape-static, computed eagerly with numpy-free jnp so they
fold into jit constants.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


import functools


@functools.lru_cache(maxsize=None)
def _rot_matrix(d: int) -> np.ndarray:
    """Signed pair-swap permutation R with (x @ R)[2i] = -x[2i+1],
    (x @ R)[2i+1] = x[2i] — i.e. interleaved rotate-half as a matmul."""
    r = np.zeros((d, d), np.float32)
    idx = np.arange(0, d, 2)
    r[idx + 1, idx] = -1.0
    r[idx, idx + 1] = 1.0
    return r


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2d) pairs (x1, x2) -> (-x2, x1), interleaved layout.

    Implemented as ``x @ R`` with a static ±1 permutation matrix rather than
    strided lane slices: on TPU, ``x[..., 0::2]`` / ``jnp.stack`` lower to
    cross-lane shuffles that dominated the TimeSformer rotary cost
    (measured: the rotary + layout wrapper cost ~3x the attention matmuls).
    A 0/±1 matmul over the trailing dim is exact in bf16/fp32 (every product
    is ±x or 0.0) and rides the MXU instead.
    """
    r = jnp.asarray(_rot_matrix(x.shape[-1]), x.dtype)
    return x @ r


def rotary_full_dim_freqs(seq_len: int, dim: int) -> np.ndarray:
    """freqs table [seq_len, dim]: outer(arange(n), 1/theta^(2i/d)), each freq
    repeated twice interleaved (rotary_embedding_torch.py:126-127)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    freqs = np.repeat(freqs, 2, axis=-1)  # '... n -> ... (n r)', r=2
    return freqs.astype(np.float32)


def apply_rotary_full_dim(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate the leading `freqs.shape[-1]` features of t along its seq axis
    (axis -2). t: [..., N, D], freqs: [N, rot_dim]."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    t_rot = t_rot * cos + _rotate_half_interleaved(t_rot) * sin
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def time_rotary_sincos(n: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """TimeSformer 1D rotary: (sin, cos) each [n, dim]
    (vit_modules.py:52-63; freqs duplicated by concat, not interleave)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freqs = np.outer(np.arange(n, dtype=np.float32), inv_freq)
    freqs = np.concatenate([freqs, freqs], axis=-1)
    return np.sin(freqs), np.cos(freqs)


def axial_rotary_sincos(
    h: int, w: int, dim: int, max_freq: float = 10.0
) -> tuple[np.ndarray, np.ndarray]:
    """TimeSformer 2D axial rotary: (sin, cos) each [h*w, dim]
    (vit_modules.py:22-50)."""
    n_scales = dim // 4
    # torch.logspace(0, log2(max_freq/2), n, base=2)
    scales = np.logspace(
        0.0, math.log(max_freq / 2) / math.log(2), n_scales, base=2.0
    ).astype(np.float32)
    h_seq = np.linspace(-1.0, 1.0, h, dtype=np.float32)[:, None] * scales * math.pi
    w_seq = np.linspace(-1.0, 1.0, w, dtype=np.float32)[:, None] * scales * math.pi
    x_sinu = np.broadcast_to(h_seq[:, None, :], (h, w, n_scales))
    y_sinu = np.broadcast_to(w_seq[None, :, :], (h, w, n_scales))
    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], axis=-1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], axis=-1)
    sin = sin.reshape(h * w, -1)
    cos = cos.reshape(h * w, -1)
    # 'n d -> n (d j)', j=2 — each element repeated twice (interleaved)
    sin = np.repeat(sin, 2, axis=-1)
    cos = np.repeat(cos, 2, axis=-1)
    return sin, cos


def _rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    """vit_modules.py:8-12 — identical to interleaved rotate_half."""
    return _rotate_half_interleaved(x)


def apply_rot_emb(
    q: jnp.ndarray, k: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """TimeSformer rotary application (vit_modules.py:14-20).

    q, k: [..., N, D_head]; sin/cos: [N, rot_dim] with rot_dim <= D_head.
    """
    rot_dim = sin.shape[-1]
    q_rot, q_pass = q[..., :rot_dim], q[..., rot_dim:]
    k_rot, k_pass = k[..., :rot_dim], k[..., rot_dim:]
    q_rot = q_rot * cos + _rotate_every_two(q_rot) * sin
    k_rot = k_rot * cos + _rotate_every_two(k_rot) * sin
    q = jnp.concatenate([q_rot, q_pass], axis=-1)
    k = jnp.concatenate([k_rot, k_pass], axis=-1)
    return q, k
