"""Fixed-shape chunked dispatch for the preprocessing nets.

The corpus drivers and the e2e path run S3FD / FAN / ReconNet over "all
frames of a video" — a batch whose size is whatever the clip length is.
Every distinct batch size is a fresh XLA compile (20-40 s per program over
the device tunnel), so per-video-length batching recompiles three programs
for every new clip length and poisons steady-state serving latency.

``padded_chunk_apply`` instead dispatches in fixed-size chunks, padding the
last chunk by repeating its final frame: ONE compiled program per net
serves every sequence length. The reference has no equivalent (torch is
eager; its per-frame loops pay per-frame Python+kernel-launch instead —
align_face_recon.py:155-163).
"""

from __future__ import annotations

import numpy as np

import jax


def padded_chunk_apply(fn, x: np.ndarray, chunk: int = 64,
                       max_in_flight: int = 4):
    """Apply ``fn`` (a jitted program batched over the leading axis) to
    ``x`` in fixed-``chunk``-size pieces.

    The last piece is padded by repeating the final row, and the padded
    rows are trimmed from the result. ``fn`` may return any pytree of
    arrays whose leaves share the chunk's leading dimension. Results are
    concatenated chunk-wise along axis 0 per leaf.

    Dispatch is pipelined: up to ``max_in_flight`` chunks are enqueued
    before the first result is fetched, so the per-chunk host round-trip
    (the dominant cost over a remote device link — ~0.1 s dispatch +
    ~0.1 s fetch measured round 4) overlaps the next chunks' device
    compute instead of serializing with it. Device memory holds at most
    ``max_in_flight`` chunk inputs at once.
    """
    t = x.shape[0]
    pending: list[tuple[int, object]] = []
    outs = []

    def drain_one():
        n, o = pending.pop(0)
        outs.append(jax.tree_util.tree_map(lambda a: np.asarray(a)[:n], o))

    for lo in range(0, max(t, 1), chunk):
        part = x[lo : lo + chunk]
        n = part.shape[0]
        if n < chunk:
            pad = np.repeat(np.asarray(part[-1:]), chunk - n, axis=0)
            part = np.concatenate([np.asarray(part), pad], axis=0)
        pending.append((n, fn(part)))     # async dispatch
        if len(pending) >= max_in_flight:
            drain_one()
    while pending:
        drain_one()
    if len(outs) == 1:
        return outs[0]
    return jax.tree_util.tree_map(
        lambda *leaves: np.concatenate(leaves, axis=0), *outs)
