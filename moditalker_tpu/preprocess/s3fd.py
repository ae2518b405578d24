"""S3FD face detector — first-frame bootstrap for the FAN landmark tracker.

The reference's alignment pipeline self-starts via face_alignment's bundled
S3FD detector (ref data/data_utils/motion_align/align_face_recon.py:155,
``face_alignment.FaceAlignment`` constructs SFDDetector). This is the
TPU-native equivalent: the conv trunk (VGG16 features + dilated fc6/fc7 +
two extra stages, L2Norm feature scaling, 6 detection heads with max-out
background at stride 4) runs as one jitted flax program; the SSD box decode
+ NMS run on host numpy (data-dependent thresholding, executed once per
video so host cost is irrelevant).

Weights port from face_alignment's ``s3fd-619a316812.pth`` via
``convert_s3fd``. Without weights, ``FanLandmarker`` falls back to its
whole-frame prior (talking-head videos are face-centered by construction).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learned scale (S3FD trick for
    mixing shallow feature maps into detection heads)."""

    channels: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight",
                       lambda k, s: jnp.full(s, self.init_scale, jnp.float32),
                       (self.channels,))
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(-1, keepdims=True)
                        + 1e-10)
        return (x / norm.astype(x.dtype)) * w.astype(x.dtype)


class S3FD(nn.Module):
    """Trunk + 6 (conf, loc) heads. Input [B, H, W, 3] float (BGR means
    already subtracted, as in the original); returns a list of 12 maps
    [conf_s4, loc_s4, conf_s8, loc_s8, ...] at strides 4,8,16,32,64,128."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        C = lambda ch, k, name, **kw: nn.Conv(ch, (k, k), dtype=d,
                                              name=name, **kw)
        pool = lambda h: nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(C(64, 3, "conv1_1", padding=1)(x))
        h = nn.relu(C(64, 3, "conv1_2", padding=1)(h))
        h = pool(h)
        h = nn.relu(C(128, 3, "conv2_1", padding=1)(h))
        h = nn.relu(C(128, 3, "conv2_2", padding=1)(h))
        h = pool(h)
        h = nn.relu(C(256, 3, "conv3_1", padding=1)(h))
        h = nn.relu(C(256, 3, "conv3_2", padding=1)(h))
        h = nn.relu(C(256, 3, "conv3_3", padding=1)(h))
        f3 = h                                     # stride 4
        h = pool(h)
        h = nn.relu(C(512, 3, "conv4_1", padding=1)(h))
        h = nn.relu(C(512, 3, "conv4_2", padding=1)(h))
        h = nn.relu(C(512, 3, "conv4_3", padding=1)(h))
        f4 = h                                     # stride 8
        h = pool(h)
        h = nn.relu(C(512, 3, "conv5_1", padding=1)(h))
        h = nn.relu(C(512, 3, "conv5_2", padding=1)(h))
        h = nn.relu(C(512, 3, "conv5_3", padding=1)(h))
        f5 = h                                     # stride 16
        h = pool(h)
        h = nn.relu(C(1024, 3, "fc6", padding=3)(h))   # pad 3, like the ref
        h = nn.relu(C(1024, 1, "fc7", padding=0)(h))
        ffc7 = h                                   # stride 32
        h = nn.relu(C(256, 1, "conv6_1", padding=0)(h))
        h = nn.relu(nn.Conv(512, (3, 3), strides=(2, 2), padding=1,
                            dtype=d, name="conv6_2")(h))
        f6 = h                                     # stride 64
        h = nn.relu(C(128, 1, "conv7_1", padding=0)(h))
        h = nn.relu(nn.Conv(256, (3, 3), strides=(2, 2), padding=1,
                            dtype=d, name="conv7_2")(h))
        f7 = h                                     # stride 128

        f3 = L2Norm(256, 10.0, name="conv3_3_norm")(f3)
        f4 = L2Norm(512, 8.0, name="conv4_3_norm")(f4)
        f5 = L2Norm(512, 5.0, name="conv5_3_norm")(f5)

        out = []
        specs = [(f3, "conv3_3_norm", 4), (f4, "conv4_3_norm", 2),
                 (f5, "conv5_3_norm", 2), (ffc7, "fc7", 2),
                 (f6, "conv6_2", 2), (f7, "conv7_2", 2)]
        for feat, name, n_conf in specs:
            conf = C(n_conf, 3, f"{name}_mbox_conf", padding=1)(feat)
            loc = C(4, 3, f"{name}_mbox_loc", padding=1)(feat)
            if n_conf == 4:
                # max-out background at the finest scale: 3 bg logits maxed
                # into one, channel 3 is the face logit
                bg = jnp.max(conf[..., :3], axis=-1, keepdims=True)
                conf = jnp.concatenate([bg, conf[..., 3:]], axis=-1)
            out.append(jax.nn.softmax(conf.astype(jnp.float32), axis=-1))
            out.append(loc.astype(jnp.float32))
        return out


def decode_detections_batch(olist: list[np.ndarray],
                            threshold: float = 0.5,
                            variances=(0.1, 0.2)) -> list[np.ndarray]:
    """SSD decode, vectorized over frames AND anchors: per-scale anchors
    (stride s, size 4s), standard center-variance box regression, then
    per-frame NMS. ``olist`` = [conf_s4 [T,H,W,2], loc_s4 [T,H,W,4], ...].
    Returns a list of T arrays [Ni, 5] (x0,y0,x1,y1,score), best first."""
    t_total = np.asarray(olist[0]).shape[0]
    per_frame: list[list[np.ndarray]] = [[] for _ in range(t_total)]
    for i in range(len(olist) // 2):
        conf = np.asarray(olist[2 * i])
        loc = np.asarray(olist[2 * i + 1])
        stride = 2 << (i + 1)  # 4, 8, 16, 32, 64, 128
        ts, ys, xs = np.nonzero(conf[..., 1] > threshold)
        if ts.size == 0:
            continue
        score = conf[ts, ys, xs, 1]
        d = loc[ts, ys, xs]                         # [M, 4]
        axc = stride / 2 + xs * stride
        ayc = stride / 2 + ys * stride
        cx = axc + d[:, 0] * variances[0] * stride * 4
        cy = ayc + d[:, 1] * variances[0] * stride * 4
        w = stride * 4 * np.exp(d[:, 2] * variances[1])
        hh = stride * 4 * np.exp(d[:, 3] * variances[1])
        det = np.stack([cx - w / 2, cy - hh / 2, cx + w / 2, cy + hh / 2,
                        score], axis=1)
        for f in np.unique(ts):
            per_frame[int(f)].append(det[ts == f])
    out = []
    for rows in per_frame:
        if not rows:
            out.append(np.zeros((0, 5)))
            continue
        b = np.concatenate(rows, axis=0).astype(np.float64)
        out.append(b[nms(b, 0.3)])
    return out


def decode_detections(olist: list[np.ndarray], threshold: float = 0.5,
                      variances=(0.1, 0.2)) -> np.ndarray:
    """Single-frame SSD decode (maps carry a leading batch axis of 1).
    Returns [N, 5] (x0,y0,x1,y1,score), best first."""
    return decode_detections_batch(
        [np.asarray(o)[:1] for o in olist], threshold, variances)[0]


def nms(dets: np.ndarray, thresh: float) -> list[int]:
    """Greedy IoU NMS (indices sorted by score)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return keep


_BGR_MEANS = np.array([104.0, 117.0, 123.0], np.float32)


def topk_candidates_packed(olist, k: int = 128, threshold: float = 0.5):
    """Like ``topk_candidates`` but returns ONE packed fp32 array
    [T, S, k+1, 6] instead of a 24-leaf tree: per scale, row 0 is metadata
    (count, h, w, 0, 0, 0) and rows 1..k are candidates (score, flat idx,
    loc0..loc3). Scales with fewer than k anchors pad with score = -1e30.

    Why: over the device tunnel each fetched leaf is its own ~110 ms
    round-trip (measured round 4) — the 24-leaf tree cost ~2.6 s per
    64-frame chunk; one array is one fetch. idx is exact in fp32 up to
    2^24 anchors (the largest map here is 64×64 = 4096)."""
    import jax.numpy as jnp
    from jax import lax

    scales = []
    for i in range(len(olist) // 2):
        conf, loc = olist[2 * i], olist[2 * i + 1]
        t, h, w = conf.shape[0], conf.shape[1], conf.shape[2]
        flat = conf[..., 1].reshape(t, h * w)
        kk = min(k, h * w)
        score, idx = lax.top_k(flat, kk)
        loc_flat = loc.reshape(t, h * w, 4)
        cand_loc = jnp.take_along_axis(loc_flat, idx[..., None], axis=1)
        count = (flat > threshold).sum(axis=-1).astype(jnp.float32)
        rows = jnp.concatenate(
            [score[..., None], idx[..., None].astype(jnp.float32),
             cand_loc.astype(jnp.float32)], axis=-1)        # [t, kk, 6]
        if kk < k:
            # pad score with -1e30 (never clears any threshold); idx/loc
            # pad with 0 so the host's int cast of the idx slot stays valid
            pad = jnp.concatenate([
                jnp.full((t, k - kk, 1), -1e30, jnp.float32),
                jnp.zeros((t, k - kk, 5), jnp.float32)], axis=-1)
            rows = jnp.concatenate([rows, pad], axis=1)
        meta = jnp.broadcast_to(
            jnp.array([0.0, h, w, 0.0, 0.0, 0.0], jnp.float32), (t, 6))
        meta = jnp.concatenate([count[:, None], meta[:, 1:]], axis=-1)
        scales.append(jnp.concatenate([meta[:, None, :], rows], axis=1))
    return jnp.stack(scales, axis=1)                        # [t, S, k+1, 6]


def decode_candidates_packed(arr: np.ndarray, threshold: float = 0.5,
                             variances=(0.1, 0.2)) -> list[np.ndarray]:
    """SSD decode + per-frame NMS from ``topk_candidates_packed`` output.
    Same results as ``decode_detections_batch`` on the full maps whenever
    every per-frame above-threshold count fits in the candidate budget."""
    arr = np.asarray(arr)
    t_total = arr.shape[0]
    per_frame: list[list[np.ndarray]] = [[] for _ in range(t_total)]
    for i in range(arr.shape[1]):
        stride = 2 << (i + 1)
        w_map = int(arr[0, i, 0, 2])
        score = arr[:, i, 1:, 0]
        idx = arr[:, i, 1:, 1].astype(np.int64)
        loc = arr[:, i, 1:, 2:6]
        ts, js = np.nonzero(score > threshold)
        if ts.size == 0:
            continue
        sel_idx = idx[ts, js]
        ys, xs = sel_idx // w_map, sel_idx % w_map
        d = loc[ts, js]
        axc = stride / 2 + xs * stride
        ayc = stride / 2 + ys * stride
        cx = axc + d[:, 0] * variances[0] * stride * 4
        cy = ayc + d[:, 1] * variances[0] * stride * 4
        bw = stride * 4 * np.exp(d[:, 2] * variances[1])
        bh = stride * 4 * np.exp(d[:, 3] * variances[1])
        det = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
                        score[ts, js]], axis=1)
        for f in np.unique(ts):
            per_frame[int(f)].append(det[ts == f])
    out = []
    for rows in per_frame:
        if not rows:
            out.append(np.zeros((0, 5)))
            continue
        b = np.concatenate(rows, axis=0).astype(np.float64)
        out.append(b[nms(b, 0.3)])
    return out


class S3FDDetector:
    """``detector_fn`` for FanLandmarker: frame [H,W,3] uint8 RGB →
    [x0,y0,x1,y1] of the highest-scoring face (None if no detection)."""

    def __init__(self, params, threshold: float = 0.5, chunk: int = 64,
                 topk: int = 128, dtype=None):
        # dtype=bfloat16: bf16 conv trunk (detection heads already emit
        # fp32 softmax/loc maps) — the TPU eval mode.
        self.model = S3FD(dtype=dtype or jnp.float32)
        self.params = params
        self.threshold = threshold
        self.chunk = chunk
        self.topk = topk

        # uint8 RGB frames in; RGB→BGR flip + mean subtraction on device
        # (a fp32 upload is 4× the bytes over the tunnel)
        def fwd(p, x_u8):
            return self.model.apply(
                p, x_u8[..., ::-1].astype(jnp.float32)
                - jnp.asarray(_BGR_MEANS))

        self._apply = jax.jit(fwd)
        # compact program: only top-k candidates per scale leave the
        # device, packed into ONE array = ONE fetch round-trip
        self._apply_topk = jax.jit(lambda p, x_u8: topk_candidates_packed(
            fwd(p, x_u8), topk, threshold))

    def __call__(self, frame_u8: np.ndarray):
        boxes = self.boxes_for_frames(frame_u8[None])
        return None if boxes is None else boxes[0]

    def boxes_for_frames(self, frames_u8: np.ndarray):
        """[T, H, W, 3] uint8 → [T, 4] best box per frame (ONE batched
        device call), or None when any frame has no detection (callers then
        fall back to tracking). Frames without a face reuse the previous
        frame's box when at least one frame detected."""
        from .batching import padded_chunk_apply

        frames_c = np.ascontiguousarray(frames_u8)
        # fixed-chunk dispatch: one compiled program serves every clip
        # length (a per-length batch would recompile per video)
        all_dets = None
        tk = getattr(self, "_apply_topk", None)
        if tk is not None:
            cands = padded_chunk_apply(
                lambda part: tk(self.params, jnp.asarray(part)),
                frames_c, self.chunk)
            if float(cands[:, :, 0, 0].max(initial=0)) <= self.topk:
                all_dets = decode_candidates_packed(cands, self.threshold)
            # else: a frame overflows the candidate budget (crowded scene)
            # — refetch the full maps below for exactness
        if all_dets is None:
            olist = padded_chunk_apply(
                lambda part: self._apply(self.params, jnp.asarray(part)),
                frames_c, self.chunk)
            all_dets = decode_detections_batch(olist, self.threshold)
        t = frames_u8.shape[0]
        boxes = np.zeros((t, 4))
        have = np.zeros(t, bool)
        for i, dets in enumerate(all_dets):
            if dets.shape[0]:
                boxes[i] = dets[0, :4]
                have[i] = True
        if not have.any():
            return None
        # forward/backward fill gaps from neighbours
        last = None
        for i in range(t):
            if have[i]:
                last = boxes[i]
            elif last is not None:
                boxes[i] = last
        last = None
        for i in range(t - 1, -1, -1):
            if have[i]:
                last = boxes[i]
            elif not have[i] and not boxes[i].any() and last is not None:
                boxes[i] = last
        return boxes


def convert_s3fd(sd: dict) -> dict:
    """torch face_alignment s3fd state_dict → flax params tree.

    torch conv weight [O, I, kh, kw] → flax [kh, kw, I, O]; L2Norm scale
    vectors pass through.
    """
    p: dict = {}
    names = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1",
             "conv3_2", "conv3_3", "conv4_1", "conv4_2", "conv4_3",
             "conv5_1", "conv5_2", "conv5_3", "fc6", "fc7",
             "conv6_1", "conv6_2", "conv7_1", "conv7_2"]
    heads = ["conv3_3_norm", "conv4_3_norm", "conv5_3_norm", "fc7",
             "conv6_2", "conv7_2"]
    for n in names:
        p[n] = {
            "kernel": np.asarray(sd[f"{n}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{n}.bias"]),
        }
    for n in heads:
        for kind in ("conf", "loc"):
            key = f"{n}_mbox_{kind}"
            p[key] = {
                "kernel": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"{key}.bias"]),
            }
    # L2Norm scales: 1-D '<name>.weight' tensors
    for n in ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm"):
        p[n] = {"weight": np.asarray(sd[f"{n}.weight"])}
    return {"params": p}
