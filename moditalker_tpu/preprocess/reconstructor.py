"""Face reconstructor: images + landmarks → 3DMM coefficients.

Re-implements the inference surface of ``deep_3drecon/reconstructor.py``
(``Reconstructor.recon_coeff`` :96 and ``pose_extract`` :72): per frame,
solve the POS similarity against the BFM standard landmarks, crop/resize to
the 224² template (PIL bicubic, like the reference's ``align_img``), run the
ResNet-50 coefficient regressor on the batch, and return [B, 257] coeffs +
per-frame transform params. The regressor weights port from the reference's
``epoch_20.pth`` via ``recon_net.convert_recon_net``.

This is the production ``coeff_fn`` for ``MotionAligner`` and
``keypoints.keypoint_sets``.
"""

from __future__ import annotations

import numpy as np

from . import align
from .recon_net import ReconNet


class Reconstructor:
    def __init__(self, recon_params, lm3d_std: np.ndarray | None = None,
                 rescale_factor: float = 102.0, bfm_dir: str | None = None,
                 chunk: int = 64, dtype=None):
        import jax

        if lm3d_std is None:
            # default: the BFM standard template (similarity_Lm3D_all.mat
            # via load_mats.load_lm3d, ref reconstructor.py:36)
            from .load_mats import load_lm3d, synthetic_lm3d_std

            lm3d_std = (load_lm3d(bfm_dir) if bfm_dir
                        else synthetic_lm3d_std())
        import jax.numpy as _jnp

        # dtype=bfloat16: bf16 conv trunk (fp32 params/heads) — the TPU
        # eval mode; the fp32 default is what the parity tests pin.
        self.model = ReconNet(dtype=dtype or _jnp.float32)
        self.params = recon_params
        self.lm3d_std = np.asarray(lm3d_std, np.float64)
        self.rescale_factor = rescale_factor
        self.chunk = chunk
        # uint8 crops in, /255 normalization on device: PIL's resize/crop
        # keep uint8 (exactly what the reference's align_img feeds the
        # regressor), so the uint8 upload is lossless and 4× smaller over
        # the tunnel than fp32.
        import jax.numpy as jnp

        self._jit_apply = jax.jit(lambda p, x: self.model.apply(
            p, x.astype(jnp.float32) / 255.0))

    def _apply(self, params, crops):
        from .batching import padded_chunk_apply

        # fixed-chunk dispatch: one compiled regressor program per clip
        # length (a per-length batch would recompile per video)
        import jax.numpy as jnp

        return padded_chunk_apply(
            lambda part: self._jit_apply(params, jnp.asarray(part)),
            np.asarray(crops), self.chunk)

    def pose_extract(self, img_sizes, lm5_batch) -> list[dict]:
        """Per-frame similarity params (ref reconstructor.py:72-94)."""
        return [
            align.crop_params(tuple(img_sizes[i]), lm5_batch[i],
                              self.lm3d_std, self.rescale_factor)
            for i in range(len(lm5_batch))
        ]

    def _crop(self, frame_u8: np.ndarray, params: dict) -> np.ndarray:
        from PIL import Image

        img = Image.fromarray(frame_u8)
        w0, h0 = img.size
        s = params["s"]
        w, h = int(np.int32(w0 * s)), int(np.int32(h0 * s))
        img = img.resize((w, h), resample=Image.BICUBIC)
        img = img.crop(align.crop_box(params))
        return np.asarray(img, np.uint8)  # /255 happens on device

    def recon_coeff(self, frames_u8: np.ndarray, lm68: np.ndarray,
                    return_image: bool = False):
        """frames [B, H, W, 3] uint8 + landmarks [B, 68, 2] →
        (coeff [B, 257], crops?, trans_params list)
        (ref reconstructor.py:96-148)."""
        import jax.numpy as jnp

        b, h, w = frames_u8.shape[:3]
        lm5 = align.lm68_to_lm5(lm68)
        sizes = np.tile([[w, h]], (b, 1))
        trans_params = self.pose_extract(sizes, lm5)
        crops = np.stack([
            self._crop(frames_u8[i], trans_params[i]) for i in range(b)])
        coeff = np.asarray(self._apply(self.params, jnp.asarray(crops)))
        if return_image:
            return coeff, crops, trans_params
        return coeff, trans_params

    def coeff_fn(self):
        """Adapter for MotionAligner's ``coeff_fn(frames, lm5)`` slot."""

        def fn(frames_u8, lm5):
            b = frames_u8.shape[0]
            h, w = frames_u8.shape[1:3]
            sizes = np.tile([[w, h]], (b, 1))
            params = self.pose_extract(sizes, lm5)
            crops = np.stack([
                self._crop(frames_u8[i], params[i]) for i in range(b)])
            import jax.numpy as jnp

            return np.asarray(self._apply(self.params, jnp.asarray(crops)))

        return fn
