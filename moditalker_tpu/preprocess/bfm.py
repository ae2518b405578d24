"""BFM 2009 morphable-model landmark math, pure JAX/numpy.

Re-implements the landmark-only subset of the reference's Face3DHelper
(``data/data_utils/face3d_helper.py`` = ``AToM/data_util/face3d_helper.py``)
and the pose math of ``deep_3drecon_models/bfm.py``: basis blends are plain
einsums — exactly the MXU's favourite shape of work. The pytorch3d
rasterizer is NOT reproduced: the MoDiTalker pipeline only ever consumes
coefficients and projected landmarks (SURVEY.md §2.9).

Assets: requires ``BFM_model_front.mat`` (scipy.io). When the asset is
missing, ``Face3DHelper.synthetic()`` provides a deterministic stand-in so
the pipeline stays runnable end-to-end (tests, benches).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


class Face3DHelper:
    """Landmark basis container.

    key_mean_shape: [68,3]; key_id_base: [204,80]; key_exp_base: [204,64]
    (ref face3d_helper.py:28-34).
    """

    def __init__(self, key_mean_shape: np.ndarray, key_id_base: np.ndarray,
                 key_exp_base: np.ndarray):
        self.key_mean_shape = np.asarray(key_mean_shape, np.float32).reshape(68, 3)
        self.key_id_base = np.asarray(key_id_base, np.float32).reshape(204, 80)
        self.key_exp_base = np.asarray(key_exp_base, np.float32).reshape(204, 64)

    @classmethod
    def from_bfm(cls, bfm_dir: str) -> "Face3DHelper":
        from scipy.io import loadmat

        model = loadmat(os.path.join(bfm_dir, "BFM_model_front.mat"))
        mean_shape = model["meanshape"].transpose()  # [3N,1]
        id_base = model["idBase"]                    # [3N,80]
        exp_base = model["exBase"]                   # [3N,64]
        keypoints = model["keypoints"].squeeze().astype(np.int64)  # [68]
        key_mean = mean_shape.reshape(-1, 3)[keypoints]
        key_id = id_base.reshape(-1, 3, 80)[keypoints].reshape(-1, 80)
        key_exp = exp_base.reshape(-1, 3, 64)[keypoints].reshape(-1, 64)
        return cls(key_mean, key_id, key_exp)

    @classmethod
    def synthetic(cls, seed: int = 0) -> "Face3DHelper":
        """Deterministic stand-in basis for asset-free runs."""
        rng = np.random.default_rng(seed)
        return cls(
            rng.normal(scale=0.5, size=(68, 3)),
            rng.normal(scale=0.01, size=(204, 80)),
            rng.normal(scale=0.01, size=(204, 64)),
        )

    # ------------------------------------------------------------ math
    def split_coeff(self, coeff):
        """257-dim Deep3DFaceRecon coefficient split (ref :36-48)."""
        return {
            "identity": coeff[..., :80],
            "expression": coeff[..., 80:144],
            "texture": coeff[..., 144:224],
            "angles": coeff[..., 224:227],
            "gamma": coeff[..., 227:254],
            "translation": coeff[..., 254:257],
        }

    def reconstruct_idexp_lm3d(self, id_coeff, exp_coeff):
        """(id_base·id + exp_base·exp) × 10 → [T,68,3] (ref :90-105)."""
        face = (
            jnp.einsum("...c,dc->...d", id_coeff, jnp.asarray(self.key_id_base))
            + jnp.einsum("...c,dc->...d", exp_coeff, jnp.asarray(self.key_exp_base))
        )
        return face.reshape(*face.shape[:-1], 68, 3) * 10.0

    def reconstruct_lm3d(self, id_coeff, exp_coeff):
        """Full landmark positions, re-centered (ref :70-88)."""
        mean = jnp.asarray(self.key_mean_shape).reshape(1, -1)
        face = (
            mean
            + jnp.einsum("...c,dc->...d", id_coeff, jnp.asarray(self.key_id_base))
            + jnp.einsum("...c,dc->...d", exp_coeff, jnp.asarray(self.key_exp_base))
        )
        face = face.reshape(*face.shape[:-1], 68, 3)
        mean_xyz = jnp.asarray(self.key_mean_shape).mean(axis=0)
        return face - mean_xyz[None, :]

    def idexp_to_absolute(self, idexp_lm3d):
        """AToM output un-scaling: lm3d = idexp/10 + key_mean_shape
        (ref AToM/inference.py:155-161)."""
        return idexp_lm3d / 10.0 + jnp.asarray(self.key_mean_shape)

    @staticmethod
    def eye_mouth_landmarks(lm3d):
        """(eye [.,31,3], mouth [.,20,3]) slices (ref :107-115)."""
        return lm3d[..., 17:48, :], lm3d[..., 48:68, :]


def compute_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """XYZ-euler → rotation matrices, batched (ref deep_3drecon_models/
    bfm.py:171-197: R = (Rz @ Ry @ Rx) transposed)."""
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    rot_x = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], -1
    ).reshape(*x.shape, 3, 3)
    rot_y = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], -1
    ).reshape(*x.shape, 3, 3)
    rot_z = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], -1
    ).reshape(*x.shape, 3, 3)
    rot = rot_z @ rot_y @ rot_x
    return jnp.swapaxes(rot, -1, -2)


def rigid_transform(points: jnp.ndarray, rot: jnp.ndarray,
                    trans: jnp.ndarray) -> jnp.ndarray:
    """points [.,N,3] @ rot [.,3,3] + trans [.,1,3] (pose application, ref
    process_video_3dmm_rollback_hdtf_batchify.py:129-132)."""
    return points @ rot + trans[..., None, :]


def to_camera(shape: jnp.ndarray, camera_distance: float = 10.0) -> jnp.ndarray:
    """z → distance − z (ref bfm.py:198-201)."""
    return shape.at[..., 2].set(camera_distance - shape[..., 2])


def to_image(shape: jnp.ndarray, focal: float = 1015.0,
             center: float = 112.0) -> jnp.ndarray:
    """Perspective projection to 224² image coords (ref bfm.py:202-227)."""
    xy = shape[..., :2] * focal / shape[..., 2:3]
    return xy + center
