"""FAN (Face Alignment Network, 2D-FAN-4) in flax + heatmap decoding.

The reference detects 68 2D landmarks with the ``face_alignment`` package
(adrianb's FAN — used at ``motion_align/align_face_recon.py:155`` and the
3DMM batchify preprocessor). This is a flax implementation of the same
architecture — 4 stacked depth-4 hourglass modules over 256-channel
ConvBlocks, 68 heatmaps at 64² — with a converter for the public
``2DFAN4-*.pth`` checkpoint naming, plus the exact sub-pixel heatmap
decoding (argmax + 0.25 gradient shift + center/scale back-projection).

Face detection (the box prior) stays pluggable: for video the previous
frame's landmarks give the crop (standard practice); any detector callable
can seed the first frame.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBlock(nn.Module):
    """Pre-activation 3-way split block (FAN models.py ConvBlock)."""

    in_planes: int
    out_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=1e-5, name=name)
        o = self.out_planes
        h1 = nn.Conv(o // 2, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1")(
                         jax.nn.relu(bn("bn1")(x)))
        h2 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv2")(
                         jax.nn.relu(bn("bn2")(h1)))
        h3 = nn.Conv(o // 4, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="conv3")(
                         jax.nn.relu(bn("bn3")(h2)))
        out = jnp.concatenate([h1, h2, h3], axis=-1)
        if self.in_planes != self.out_planes:
            res = nn.Conv(o, (1, 1), use_bias=False, dtype=self.dtype,
                          name="ds_conv")(jax.nn.relu(bn("ds_bn")(x)))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive depth-4 hourglass (FAN models.py HourGlass)."""

    depth: int = 4
    features: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features

        def level(x, lv):
            up1 = ConvBlock(f, f, self.dtype, name=f"b1_{lv}")(x, train)
            low = nn.avg_pool(x, (2, 2), strides=(2, 2))
            low = ConvBlock(f, f, self.dtype, name=f"b2_{lv}")(low, train)
            if lv > 1:
                low2 = level(low, lv - 1)
            else:
                low2 = ConvBlock(f, f, self.dtype,
                                 name=f"b2_plus_{lv}")(low, train)
            low3 = ConvBlock(f, f, self.dtype, name=f"b3_{lv}")(low2, train)
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(x, self.depth)


class FAN(nn.Module):
    """input [B, 256, 256, 3] (0..1 RGB) → list of [B, 64, 64, 68]
    heatmaps, one per stacked module (use the last)."""

    num_modules: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       epsilon=1e-5, name=name)
        h = nn.Conv(64, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(bn("bn1")(h))
        h = ConvBlock(64, 128, self.dtype, name="conv2")(h, train)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = ConvBlock(128, 128, self.dtype, name="conv3")(h, train)
        h = ConvBlock(128, 256, self.dtype, name="conv4")(h, train)

        previous = h
        outputs = []
        for i in range(self.num_modules):
            hg = HourGlass(4, 256, self.dtype, name=f"m{i}")(previous, train)
            ll = ConvBlock(256, 256, self.dtype, name=f"top_m_{i}")(hg, train)
            ll = nn.Conv(256, (1, 1), dtype=self.dtype,
                         name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(bn(f"bn_end{i}")(ll))
            tmp_out = nn.Conv(68, (1, 1), dtype=self.dtype, name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), dtype=self.dtype,
                             name=f"bl{i}")(ll)
                tmp = nn.Conv(256, (1, 1), dtype=self.dtype,
                              name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp
        return outputs


# ---------------------------------------------------------------- decoding

def heatmaps_to_landmarks(heatmaps: np.ndarray, center=None,
                          scale: float | None = None) -> np.ndarray:
    """[B, H, W, 68] heatmaps → [B, 68, 2] landmark coords.

    face_alignment's get_preds_fromhm: argmax (1-indexed), ±0.25 shift along
    the local heatmap gradient, then optional center/scale back-projection
    to the original image (transform() semantics with resolution H)."""
    b, hh, ww, n = heatmaps.shape
    hm = heatmaps.transpose(0, 3, 1, 2).reshape(b, n, -1)
    idx = hm.argmax(axis=-1)
    xs = (idx % ww).astype(np.float64)
    ys = (idx // ww).astype(np.float64)
    # sub-pixel shift, vectorized over (b, 68) — the original per-point
    # python loop was ~10k iterations per 156-frame alignment call
    xi = (idx % ww).astype(np.intp)
    yi = (idx // ww).astype(np.intp)
    bidx = np.arange(b, dtype=np.intp)[:, None]
    nidx = np.arange(n, dtype=np.intp)[None, :]
    right = heatmaps[bidx, yi, np.minimum(xi + 1, ww - 1), nidx]
    left = heatmaps[bidx, yi, np.maximum(xi - 1, 0), nidx]
    below = heatmaps[bidx, np.minimum(yi + 1, hh - 1), xi, nidx]
    above = heatmaps[bidx, np.maximum(yi - 1, 0), xi, nidx]
    in_x = (xi > 0) & (xi < ww - 1)
    in_y = (yi > 0) & (yi < hh - 1)
    xs += 0.25 * np.sign(right - left) * in_x
    ys += 0.25 * np.sign(below - above) * in_y
    pts = np.stack([xs, ys], axis=-1) + 0.5  # pixel centers
    if center is not None and scale is not None:
        # map 64² heatmap coords to image coords: crop of size 200*scale
        # centered at `center` (face_alignment transform())
        pts = pts / hh * (200.0 * scale)
        pts = pts + (np.asarray(center, np.float64) - 100.0 * scale)
    return pts


def decode_heatmaps_jnp(heatmaps):
    """On-device mirror of ``heatmaps_to_landmarks`` WITHOUT the
    center/scale back-projection: [B, H, W, 68] → fp32 [B, 68, 2] heatmap
    coords (pixel centers, +0.5). Runs inside the jitted FAN program so a
    chunk returns 35 KB of landmarks instead of ~71 MB of fp32 heatmaps —
    the heatmap fetch dominated alignment wall time over the device tunnel.
    Bit-identical to the host decode on the same fp32 maps (argmax picks the
    first maximum in both numpy and jnp)."""
    import jax.numpy as jnp

    b, hh, ww, n = heatmaps.shape
    hm = heatmaps.astype(jnp.float32)
    flat = hm.transpose(0, 3, 1, 2).reshape(b, n, hh * ww)
    idx = jnp.argmax(flat, axis=-1)                       # [B, 68]
    xi = idx % ww
    yi = idx // ww
    hm_n = hm.transpose(0, 3, 1, 2)                       # [B, 68, H, W]

    def at(y, x):
        return jnp.take_along_axis(
            hm_n.reshape(b, n, hh * ww),
            (y * ww + x)[..., None], axis=-1)[..., 0]

    right = at(yi, jnp.minimum(xi + 1, ww - 1))
    left = at(yi, jnp.maximum(xi - 1, 0))
    below = at(jnp.minimum(yi + 1, hh - 1), xi)
    above = at(jnp.maximum(yi - 1, 0), xi)
    in_x = ((xi > 0) & (xi < ww - 1)).astype(jnp.float32)
    in_y = ((yi > 0) & (yi < hh - 1)).astype(jnp.float32)
    xs = xi.astype(jnp.float32) + 0.25 * jnp.sign(right - left) * in_x
    ys = yi.astype(jnp.float32) + 0.25 * jnp.sign(below - above) * in_y
    return jnp.stack([xs, ys], axis=-1) + 0.5


def project_heatmap_coords(pts: np.ndarray, center, scale: float,
                           resolution: int = 64) -> np.ndarray:
    """Heatmap-space coords → image coords (the center/scale tail of
    ``heatmaps_to_landmarks``, applied host-side in float64)."""
    pts = np.asarray(pts, np.float64)
    pts = pts / resolution * (200.0 * scale)
    return pts + (np.asarray(center, np.float64) - 100.0 * scale)


def crop_face(img: np.ndarray, center, scale: float,
              resolution: int = 256) -> np.ndarray:
    """Square crop of side 200·scale around center, resized to 256²
    (bilinear, torch semantics). img [H, W, 3] float 0..255."""
    from ..data.mtov_dataset import bilinear_resize

    h, w = img.shape[:2]
    # clamp the crop to a sane multiple of the frame: degenerate detections
    # (wild landmarks from an untrained net, a collapsed track) otherwise
    # request a crop of arbitrary size — seen as a 280 GiB canvas allocation
    side = int(round(200.0 * scale))
    side = max(8, min(side, 4 * max(h, w)))
    cx, cy = int(round(center[0])), int(round(center[1]))
    cx = max(-2 * w, min(cx, 3 * w))
    cy = max(-2 * h, min(cy, 3 * h))
    x0, y0 = cx - side // 2, cy - side // 2
    canvas = np.zeros((side, side, 3), np.float32)
    sx0, sy0 = max(x0, 0), max(y0, 0)
    sx1, sy1 = min(x0 + side, w), min(y0 + side, h)
    canvas[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
    return bilinear_resize(canvas[None], resolution, resolution)[0]


def bbox_to_center_scale(lm_or_box: np.ndarray) -> tuple[np.ndarray, float]:
    """Center/scale from prior-frame landmarks ([68,2]) or a box [x0,y0,x1,y1]
    (face_alignment's convention: scale = box_diag-ish / 195)."""
    a = np.asarray(lm_or_box, np.float64)
    if a.ndim == 2:  # landmarks
        x0, y0 = a.min(axis=0)
        x1, y1 = a.max(axis=0)
    else:
        x0, y0, x1, y1 = a
    center = np.array([(x0 + x1) / 2.0, (y0 + y1) / 2.0])
    center[1] -= (y1 - y0) * 0.12
    scale = (x1 - x0 + y1 - y0) / 195.0
    return center, scale


def convert_fan(sd: dict, num_modules: int = 4) -> dict:
    """face_alignment 2DFAN4 state_dict → flax params/batch_stats."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    def conv(dst_p, name, src):
        w = sd[f"{src}.weight"]
        d = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
        if f"{src}.bias" in sd:
            d["bias"] = sd[f"{src}.bias"]
        dst_p[name] = d

    def bn(dst_p, dst_s, name, src):
        dst_p[name] = {"scale": sd[f"{src}.weight"],
                       "bias": sd[f"{src}.bias"]}
        dst_s[name] = {"mean": sd[f"{src}.running_mean"],
                       "var": sd[f"{src}.running_var"]}

    def convblock(dst_p, dst_s, src, has_ds):
        for i in (1, 2, 3):
            conv(dst_p, f"conv{i}", f"{src}.conv{i}")
            bn(dst_p, dst_s, f"bn{i}", f"{src}.bn{i}")
        if has_ds:
            bn(dst_p, dst_s, "ds_bn", f"{src}.downsample.0")
            conv(dst_p, "ds_conv", f"{src}.downsample.2")

    conv(params, "conv1", "conv1")
    bn(params, stats, "bn1", "bn1")
    for name, src, ds in [("conv2", "conv2", True), ("conv3", "conv3", False),
                          ("conv4", "conv4", True)]:
        params[name], stats[name] = {}, {}
        convblock(params[name], stats[name], src, ds)
    for i in range(num_modules):
        params[f"m{i}"], stats[f"m{i}"] = {}, {}
        for lv in (4, 3, 2, 1):
            for blk in (["b1", "b2", "b3"] + (["b2_plus"] if lv == 1 else [])):
                key = f"{blk}_{lv}"
                params[f"m{i}"][key], stats[f"m{i}"][key] = {}, {}
                convblock(params[f"m{i}"][key], stats[f"m{i}"][key],
                          f"m{i}.{key}", False)
        params[f"top_m_{i}"], stats[f"top_m_{i}"] = {}, {}
        convblock(params[f"top_m_{i}"], stats[f"top_m_{i}"],
                  f"top_m_{i}", False)
        conv(params, f"conv_last{i}", f"conv_last{i}")
        bn(params, stats, f"bn_end{i}", f"bn_end{i}")
        conv(params, f"l{i}", f"l{i}")
        if i < num_modules - 1:
            conv(params, f"bl{i}", f"bl{i}")
            conv(params, f"al{i}", f"al{i}")
    return {"params": params, "batch_stats": stats}


class FanLandmarker:
    """Video landmark tracker: FAN heatmaps + crop tracking.

    The production ``landmark_fn`` for ``MotionAligner``/``keypoints``: for
    each frame the crop is derived from the PREVIOUS frame's landmarks
    (standard video tracking — avoids running a face detector per frame);
    the first frame's crop comes from ``initial_box`` ([x0,y0,x1,y1]) or an
    optional ``detector_fn(frame) -> box``.
    """

    def __init__(self, fan_params, num_modules: int = 4,
                 initial_box=None, detector_fn=None, chunk: int = 64,
                 dtype=None):
        import jax

        import jax.numpy as jnp

        # dtype=bfloat16: bf16 hourglass trunk (fp32 params; the heatmap
        # decode runs fp32) — the TPU eval mode; fp32 default is what the
        # parity tests pin.
        self.model = FAN(num_modules=num_modules, dtype=dtype or jnp.float32)
        self.params = fan_params
        self.initial_box = initial_box
        self.detector_fn = detector_fn
        self.chunk = chunk
        self._apply = jax.jit(
            lambda p, x: self.model.apply(p, x)[-1])
        # Transfer-lean program: uint8 crops up (4× less than fp32),
        # decoded [B, 68, 2] landmarks down (~2000× less than the heatmaps).
        # uint8 crop quantization matches the reference: face_alignment
        # crops with cv2.resize on uint8 frames, so its FAN inputs are
        # uint8-quantized too.
        self._apply_pts = jax.jit(
            lambda p, x_u8: decode_heatmaps_jnp(self.model.apply(
                p, x_u8.astype(jnp.float32) / 255.0)[-1]
                .astype(jnp.float32)))

    @classmethod
    def with_s3fd(cls, fan_params, s3fd_params, num_modules: int = 4,
                  threshold: float = 0.5, chunk: int = 64) -> "FanLandmarker":
        """Cold-start tracker: S3FD detects the face on frame 0, FAN tracks
        from there (the reference's face_alignment default —
        align_face_recon.py:155 builds FaceAlignment with its bundled SFD
        detector). ``chunk`` sizes the fixed-shape dispatch for both nets."""
        from .s3fd import S3FDDetector

        return cls(fan_params, num_modules=num_modules, chunk=chunk,
                   detector_fn=S3FDDetector(s3fd_params, threshold,
                                            chunk=chunk))

    def landmarks_for_frame(self, frame_u8: np.ndarray,
                            prior) -> np.ndarray:
        center, scale = bbox_to_center_scale(prior)
        crop = crop_face(frame_u8.astype(np.float32), center, scale)
        crop_u8 = np.clip(np.rint(crop), 0, 255).astype(np.uint8)
        import jax.numpy as jnp

        pts = np.asarray(self._apply_pts(self.params,
                                         jnp.asarray(crop_u8[None])))
        return project_heatmap_coords(pts, center, scale)[0]

    def landmarks_batched(self, frames_u8: np.ndarray,
                          boxes: np.ndarray) -> np.ndarray:
        """All frames in ONE FAN dispatch, given per-frame boxes [T, 4].

        The reference detects + landmarks every frame independently
        (align_face_recon.py:155-163: fa.get_landmarks per frame), which is
        embarrassingly batchable; the sequential path below exists only for
        detector-free prior-frame tracking. 156 frames = 1 device call
        instead of 156."""
        import jax.numpy as jnp

        t = frames_u8.shape[0]
        centers, scales = zip(*(bbox_to_center_scale(b) for b in boxes))
        crops = np.stack([
            crop_face(frames_u8[i].astype(np.float32), centers[i], scales[i])
            for i in range(t)])
        crops_u8 = np.clip(np.rint(crops), 0, 255).astype(np.uint8)
        from .batching import padded_chunk_apply

        # fixed-chunk dispatch: one compiled FAN program per clip length;
        # landmarks decode on device (decode_heatmaps_jnp) so only [T,68,2]
        # crosses the tunnel
        pts = padded_chunk_apply(
            lambda part: self._apply_pts(self.params, jnp.asarray(part)),
            crops_u8, self.chunk)
        out = np.empty((t, 68, 2), np.float64)
        for i in range(t):
            out[i] = project_heatmap_coords(pts[i], centers[i], scales[i])
        return out

    def __call__(self, frames_u8: np.ndarray) -> np.ndarray:
        """[T, H, W, 3] uint8 → [T, 68, 2] image-space landmarks.

        With a batch-capable detector (S3FDDetector.boxes_for_frames) all
        frames run as two batched device programs; otherwise frame-by-frame
        tracking from the first frame's box/prior."""
        t, h, w = frames_u8.shape[:3]
        if self.detector_fn is not None and hasattr(self.detector_fn,
                                                    "boxes_for_frames"):
            boxes = self.detector_fn.boxes_for_frames(frames_u8)
            if boxes is not None:
                return self.landmarks_batched(frames_u8, boxes)
        prior = None
        if self.initial_box is not None:
            prior = np.asarray(self.initial_box, np.float64)
        elif self.detector_fn is not None:
            box = self.detector_fn(frames_u8[0])
            if box is not None:
                prior = np.asarray(box, np.float64)
        if prior is None:
            # whole-frame prior (center crop): no detector, or no detection
            prior = np.array([w * 0.2, h * 0.2, w * 0.8, h * 0.8])
        out = np.empty((t, 68, 2), np.float64)
        for i in range(t):
            out[i] = self.landmarks_for_frame(frames_u8[i], prior)
            prior = out[i]  # track
        return out
