"""Fused motion-alignment chunk program: S3FD → crop → FAN → POS → crop →
ReconNet as ONE jitted device program per fixed-size frame chunk.

The modular path (``S3FDDetector`` + ``FanLandmarker`` + ``Reconstructor``)
dispatches three device programs per chunk with host work between them
(box decode, crop_face, PIL resize) — over a remote device link each
dispatch+fetch pair costs ~150 ms and the host crops serialize with device
compute. This module keeps the whole per-frame chain of the reference's
alignment loop (``align_face_recon.py:155-163``: fa.get_landmarks per frame,
then ``reconstructor.py:96-148``: POS solve + 224² crop + ResNet-50) on
device: a 64-frame chunk costs one uint8 upload, one dispatch, and one
~100 KB packed fetch.

Device-side re-derivations (each mirrors the host/modular math):
  * best box  — top-1 SSD anchor over all 6 scales; identical to the
    modular ``decode → NMS → dets[0]`` (NMS never reorders the top-1).
  * crop 256  — ``fan.crop_face`` exactly (zero-pad canvas + bilinear
    resize with half-pixel centers + uint8 rounding), as a static-shape
    bilinear gather per frame.
  * POS solve — ``align.pos_solve``'s lstsq: the design matrix A depends
    only on the static BFM template, so pinv(A) is a host-precomputed
    constant and the per-frame solve is one [10]·[10,8] matvec.
  * crop 224  — the reference resizes the full frame with PIL bicubic then
    crops (``reconstructor._crop``); here the same affine map is sampled
    BILINEARLY in one gather (a 16-tap PIL-antialiased bicubic is not
    worth a separate resample program for a regressor input; sub-pixel
    difference only — the modular path keeps PIL for strict parity, and
    the golden harness owns real-weight agreement).

Outputs per frame, packed into one fp32 row: 68 image-space landmarks, the
257 recon coefficients, the POS crop params (t, s), the detection box /
score / flag, and the FAN center/scale.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import align
from .fan import FAN, decode_heatmaps_jnp
from .recon_net import ReconNet
from .s3fd import S3FD, _BGR_MEANS

# packed row layout: [lm68(136) | coeff(257) | t(2) | s(1) | center(2) |
#                     scale(1) | box(4) | score(1) | detected(1)] = 405
_LM68 = slice(0, 136)
_COEFF = slice(136, 393)
_T = slice(393, 395)
_S = 395
_CENTER = slice(396, 398)
_SCALE = 398
_BOX = slice(399, 403)
_SCORE = 403
_DETECTED = 404
ROW = 405


def _pos_pinv(lm3d_std: np.ndarray) -> np.ndarray:
    """pinv of the POS design matrix (``align.pos_solve``'s A) — constant
    because A is built from the static BFM 5-landmark template only."""
    x = np.asarray(lm3d_std, np.float64).T        # [3, 5]
    npts = x.shape[1]
    A = np.zeros([2 * npts, 8])
    A[0 : 2 * npts - 1 : 2, 0:3] = x.T
    A[0 : 2 * npts - 1 : 2, 3] = 1
    A[1 : 2 * npts : 2, 4:7] = x.T
    A[1 : 2 * npts : 2, 7] = 1
    return np.linalg.pinv(A)                      # [8, 10]


def _best_box_scale(conf, loc, stride, variances=(0.1, 0.2)):
    """Per-frame argmax anchor of one scale, SSD-decoded: [B, 5]."""
    b = conf.shape[0]
    h, w = conf.shape[1], conf.shape[2]
    flat = conf[..., 1].reshape(b, h * w).astype(jnp.float32)
    idx = jnp.argmax(flat, axis=-1)                          # [B]
    score = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    d = jnp.take_along_axis(loc.reshape(b, h * w, 4).astype(jnp.float32),
                            idx[:, None, None], axis=1)[:, 0]  # [B, 4]
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    axc = stride / 2 + xs * stride
    ayc = stride / 2 + ys * stride
    cx = axc + d[:, 0] * variances[0] * stride * 4
    cy = ayc + d[:, 1] * variances[0] * stride * 4
    bw = stride * 4 * jnp.exp(d[:, 2] * variances[1])
    bh = stride * 4 * jnp.exp(d[:, 3] * variances[1])
    return jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
                      score], axis=1)


def best_box_per_frame(olist):
    """Global top-1 SSD detection per frame: [B, 4] box + [B] score.
    Equals ``decode_detections_batch(...)[i][0]`` (greedy NMS keeps the
    highest-scoring box first; the global argmax IS that box)."""
    cands = jnp.stack([
        _best_box_scale(olist[2 * i], olist[2 * i + 1], 2 << (i + 1))
        for i in range(len(olist) // 2)], axis=1)            # [B, S, 5]
    best = jnp.argmax(cands[..., 4], axis=1)                 # [B]
    row = jnp.take_along_axis(cands, best[:, None, None], axis=1)[:, 0]
    return row[:, :4], row[:, 4]


def _sample_bilinear(img, ys, xs):
    """Zero-padded bilinear sample of one frame. img [H, W, 3] float;
    ys [Ho], xs [Wo] fractional source coords (may lie outside the image —
    samples there read 0, the crop canvas convention). → [Ho, Wo, 3]."""
    h, w = img.shape[0], img.shape[1]

    def axis(src, n):
        lo = jnp.floor(src)
        frac = (src - lo).astype(img.dtype)
        lo = lo.astype(jnp.int32)
        return lo, lo + 1, frac

    ylo, yhi, yf = axis(ys, h)
    xlo, xhi, xf = axis(xs, w)

    def take(yi, xi):
        ok = ((yi >= 0) & (yi < h))[:, None] & ((xi >= 0) & (xi < w))[None]
        v = img[jnp.clip(yi, 0, h - 1)[:, None],
                jnp.clip(xi, 0, w - 1)[None, :]]
        return v * ok[..., None].astype(img.dtype)

    top = take(ylo, xlo) * (1 - xf)[None, :, None] \
        + take(ylo, xhi) * xf[None, :, None]
    bot = take(yhi, xlo) * (1 - xf)[None, :, None] \
        + take(yhi, xhi) * xf[None, :, None]
    return top * (1 - yf)[:, None, None] + bot * yf[:, None, None]


def _crop256_coords(center, scale, h, w, resolution=256):
    """Source coords of ``fan.crop_face``'s canvas resample, per frame.

    Mirrors the host exactly: integer side = round(200·scale) (clamped),
    integer canvas origin from the rounded/clamped center, bilinear resize
    of the zero-padded canvas with half-pixel centers and coords clipped to
    the canvas (edge replication happens INSIDE the canvas, zeros outside
    the image)."""
    side = jnp.round(200.0 * scale)
    side = jnp.clip(side, 8, 4 * max(h, w))
    cx = jnp.clip(jnp.round(center[0]), -2 * w, 3 * w)
    cy = jnp.clip(jnp.round(center[1]), -2 * h, 3 * h)
    x0 = cx - jnp.floor(side / 2)      # side//2 for side >= 0
    y0 = cy - jnp.floor(side / 2)
    o = jnp.arange(resolution, dtype=jnp.float32)
    # canvas coords, clipped to [0, side-1] like bilinear_resize's axis clip
    c = jnp.clip((o + 0.5) * (side / resolution) - 0.5, 0, side - 1)
    return y0 + c, x0 + c


def _crop224_coords(t, s, h, w, target=224.0):
    """Source coords of the reference's resize-then-crop 224² BFM crop
    (``reconstructor._crop`` / ``align.crop_box``): full-frame resize to
    (int32(w·s), int32(h·s)) then integer crop. Resized pixel r maps to
    source (r + 0.5)/s - 0.5 (half-pixel centers; PIL uses the same affine,
    a different filter)."""
    wr = jnp.trunc(w * s)              # np.int32 cast truncates
    hr = jnp.trunc(h * s)
    left = jnp.trunc(wr / 2 - target / 2 + (t[0] - w / 2) * s)
    up = jnp.trunc(hr / 2 - target / 2 + (h / 2 - t[1]) * s)
    o = jnp.arange(int(target), dtype=jnp.float32)
    # PIL maps resized pixel r to source (r+0.5)·(w/wr)−0.5 — the ACTUAL
    # integer-size ratio, not 1/s (wr = trunc(w·s) truncates)
    xs = (left + o + 0.5) * (w / wr) - 0.5
    ys = (up + o + 0.5) * (h / hr) - 0.5
    return ys, xs


class FusedAligner:
    """One-dispatch-per-chunk detector+landmarker+reconstructor.

    Drop-in provider of ``MotionAligner``'s ``landmark_fn``/``coeff_fn``
    results, in one device program. ``process(frames_u8)`` returns a dict
    with lm68 / coeff / t / s / boxes / scores / detected (host numpy).

    When a frame's best score misses ``threshold`` the row is still
    computed from the argmax box (static shapes); callers decide whether
    to trust it via ``detected`` (the modular path neighbour-fills — a
    talking-head corpus detects every frame, so the fused path simply
    reports the flag and ``MotionAligner`` falls back for chunks where
    coverage is incomplete)."""

    def __init__(self, s3fd_params, fan_params, recon_params,
                 lm3d_std: np.ndarray, threshold: float = 0.5,
                 chunk: int = 64, num_modules: int = 4,
                 rescale_factor: float = 102.0, dtype=None):
        dtype = dtype or jnp.float32
        self.s3fd = S3FD(dtype=dtype)
        self.fan = FAN(num_modules=num_modules, dtype=dtype)
        self.recon = ReconNet(dtype=dtype)
        self.params = {"s3fd": s3fd_params, "fan": fan_params,
                       "recon": recon_params}
        self.threshold = float(threshold)
        self.chunk = chunk
        self.rescale_factor = float(rescale_factor)
        self.lm3d_std = np.asarray(lm3d_std, np.float64)
        self._pinv = jnp.asarray(_pos_pinv(self.lm3d_std), jnp.float32)
        self._jit = jax.jit(self._chunk_program)
        self._jit_debug = jax.jit(
            lambda p, f: self._chunk_program(p, f, debug=True))

    # ------------------------------------------------------------------
    def _chunk_program(self, params, frames_u8, debug: bool = False):
        """[C, H, W, 3] uint8 → packed [C, ROW] fp32 (+ crops when debug)."""
        c, h, w = frames_u8.shape[:3]
        fx = frames_u8.astype(jnp.float32)

        # ---- S3FD: BGR flip + mean subtract (s3fd.S3FDDetector.fwd) ----
        olist = self.s3fd.apply(params["s3fd"],
                                fx[..., ::-1] - jnp.asarray(_BGR_MEANS))
        box, score = best_box_per_frame(olist)
        detected = (score > self.threshold).astype(jnp.float32)

        # ---- center/scale (fan.bbox_to_center_scale) ----
        x0b, y0b, x1b, y1b = box[:, 0], box[:, 1], box[:, 2], box[:, 3]
        center = jnp.stack([(x0b + x1b) / 2,
                            (y0b + y1b) / 2 - (y1b - y0b) * 0.12], axis=1)
        scale = (x1b - x0b + y1b - y0b) / 195.0

        # ---- FAN crop + forward + decode ----
        def crop256(img, ctr, sc):
            ys, xs = _crop256_coords(ctr, sc, h, w)
            return _sample_bilinear(img, ys, xs)

        crops = jax.vmap(crop256)(fx, center, scale)
        crops = jnp.clip(jnp.rint(crops), 0, 255)  # host uint8 round-trip
        hm = self.fan.apply(params["fan"], crops / 255.0)[-1]
        pts = decode_heatmaps_jnp(hm)                        # [C, 68, 2]
        # project_heatmap_coords (heatmap res 64 → image space)
        sc200 = (200.0 * scale)[:, None, None]
        lm68 = pts / 64.0 * sc200 + (center[:, None, :] - 0.5 * sc200)

        # ---- 68 → 5 (align.extract_5p, vectorized) ----
        eye_l = (lm68[:, 36] + lm68[:, 39]) / 2
        eye_r = (lm68[:, 42] + lm68[:, 45]) / 2
        lm5 = jnp.stack([eye_l, eye_r, lm68[:, 30], lm68[:, 48],
                         lm68[:, 54]], axis=1)               # [C, 5, 2]

        # ---- POS similarity (align.pos_solve via constant pinv) ----
        k = lm5.reshape(c, 10) @ self._pinv.T                # [C, 8]
        s0 = (jnp.linalg.norm(k[:, 0:3], axis=1)
              + jnp.linalg.norm(k[:, 4:7], axis=1)) / 2
        t_pos = k[:, [3, 7]]
        longest = float(max(w, h, 1))
        s_crop = jnp.clip(self.rescale_factor / s0,
                          224.0 / longest, 16384.0 / longest)

        # ---- recon crop + forward ----
        def crop224(img, tt, ss):
            ys, xs = _crop224_coords(tt, ss, float(h), float(w))
            return _sample_bilinear(img, ys, xs)

        crops224 = jax.vmap(crop224)(fx, t_pos, s_crop)
        crops224 = jnp.clip(jnp.rint(crops224), 0, 255)
        coeff = self.recon.apply(params["recon"], crops224 / 255.0)

        packed = jnp.concatenate([
            lm68.reshape(c, 136).astype(jnp.float32),
            coeff.astype(jnp.float32),
            t_pos.astype(jnp.float32),
            s_crop[:, None].astype(jnp.float32),
            center.astype(jnp.float32),
            scale[:, None].astype(jnp.float32),
            box.astype(jnp.float32),
            score[:, None].astype(jnp.float32),
            detected[:, None],
        ], axis=1)
        if debug:
            return packed, crops, crops224
        return packed

    # ------------------------------------------------------------------
    def process(self, frames_u8: np.ndarray) -> dict:
        """[T, H, W, 3] uint8 → per-frame alignment products (host numpy).
        One dispatch + one packed fetch per ``chunk`` frames."""
        from .batching import padded_chunk_apply

        rows = padded_chunk_apply(
            lambda part: self._jit(self.params, jnp.asarray(part)),
            np.ascontiguousarray(frames_u8), self.chunk)
        rows = np.asarray(rows, np.float64)
        t = rows.shape[0]
        return {
            "lm68": rows[:, _LM68].reshape(t, 68, 2),
            "coeff": rows[:, _COEFF],
            "t": rows[:, _T],
            "s": rows[:, _S],
            "center": rows[:, _CENTER],
            "scale": rows[:, _SCALE],
            "boxes": rows[:, _BOX],
            "scores": rows[:, _SCORE],
            "detected": rows[:, _DETECTED] > 0.5,
        }
