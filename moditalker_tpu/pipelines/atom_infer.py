"""AToM inference: audio (HuBERT features) → frontalized landmark sequences.

Re-implements ``AToM/inference.py:34-199``: per identity, condition on the
frame-0 face-centric unposed keypoint and a 2×horizon slice of HuBERT
features, DDIM-sample the landmark residual with CFG, add back the keypoint,
un-scale (÷10 + key_mean_shape) and write ``frontalized_npy/{id}/atom_*.npy``
as [T,68,3] float arrays — layout-compatible with the reference output so the
downstream motion-alignment stage consumes it unchanged.

TPU notes: ``run_directory`` stacks identities along the leading axis and
samples each chunk in ONE doubled-batch CFG DDIM dispatch — the reference
samples one identity at a time on one GPU (inference.py:108). When a
``mesh`` is passed, the identity batch is ``device_put`` with
``NamedSharding(mesh, P("data"))`` (padded to a mesh-size multiple), so the
DDIM program runs SPMD across every chip.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import AtomDiffusionConfig, AtomModelConfig
from ..core.sharding import DATA_AXIS
from ..models.atom.diffusion import AtomDiffusion
from ..preprocess.bfm import Face3DHelper

HORIZON = 156  # 6.24 s at 25 fps (ref AToM/inference.py:26)


def prepare_condition(keypoint_npy: np.ndarray, hubert_npy: np.ndarray,
                      horizon: int = HORIZON) -> tuple[np.ndarray, np.ndarray]:
    """Identity keypoint [68,3] (or [1,68,3]) + hubert [T,1024] →
    (face [1,horizon,204], cond [1,2*horizon,1024]) (ref inference.py:114-130).
    Hubert shorter than 2*horizon is zero-padded."""
    kp = np.asarray(keypoint_npy, np.float32).reshape(-1)[: 68 * 3]
    face = np.tile(kp[None, None, :], (1, horizon, 1))
    hub = np.asarray(hubert_npy, np.float32)
    need = horizon * 2
    if hub.shape[0] < need:
        hub = np.pad(hub, ((0, need - hub.shape[0]), (0, 0)))
    cond = hub[None, :need]
    return face, cond


class AtomInferencePipeline:
    def __init__(
        self,
        params,
        model_cfg: AtomModelConfig = AtomModelConfig(),
        diff_cfg: AtomDiffusionConfig = AtomDiffusionConfig(),
        face3d: Face3DHelper | None = None,
        dtype=jnp.float32,
        mesh: Mesh | None = None,
    ):
        self.diff = AtomDiffusion.create(model_cfg, diff_cfg, dtype=dtype)
        self.mesh = mesh
        if mesh is not None:
            self._batch_sh = NamedSharding(mesh, P(DATA_AXIS))
            self._repl_sh = NamedSharding(mesh, P())
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._repl_sh), params)
        self.params = params
        self.model_cfg = model_cfg
        self.face3d = face3d

        def _sample(params, key, face, cond):
            shape = (face.shape[0], model_cfg.horizon, model_cfg.repr_dim)
            return self.diff.ddim_sample(params, key, shape, face, cond)

        self._sample = jax.jit(_sample)

    def generate_residual(self, key, face: np.ndarray, cond: np.ndarray):
        """[B,horizon,204] landmark residuals. With a mesh, the identity
        batch is padded by repetition to a mesh-size multiple, sharded over
        the data axis, and lazily trimmed back."""
        if self.mesh is None:
            return self._sample(self.params, key,
                                jnp.asarray(face), jnp.asarray(cond))
        n_real = face.shape[0]
        pad = (-n_real) % self.mesh.size

        def put(v):
            v = np.asarray(v)
            if pad:
                v = np.concatenate([v, v[-1:].repeat(pad, axis=0)])
            return jax.device_put(v, self._batch_sh)

        out = self._sample(self.params, jax.device_put(key, self._repl_sh),
                           put(face), put(cond))
        return out[:n_real] if pad else out

    def generate_landmarks(self, key, keypoint_npy, hubert_npy):
        """Full single-identity path → [horizon,68,3] absolute landmarks."""
        face, cond = prepare_condition(keypoint_npy, hubert_npy,
                                       self.model_cfg.horizon)
        residual = self.generate_residual(key, face, cond)
        out = residual + jnp.asarray(face)           # ref inference.py:155
        out = out.reshape(out.shape[0], out.shape[1], 68, 3)
        if self.face3d is not None:
            out = self.face3d.idexp_to_absolute(out)  # /10 + key_mean_shape
        else:
            out = out / 10.0
        return np.asarray(out[0])

    def run_directory(self, identities: dict[str, tuple], out_dir: str,
                      seed: int = 0, tag: str = "atom",
                      save_pngs: bool = False,
                      batch: int | None = None) -> dict[str, str]:
        """identities: {id: (keypoint ndarray, hubert ndarray)} →
        writes frontalized_npy/{id}/{tag}.npy (+ optional dot-rendered pngs,
        ref inference.py:164-177), returns paths.

        Identities are stacked along the leading axis and sampled in chunks
        of ``batch`` (default: all at once) — ONE doubled-batch CFG DDIM
        per chunk instead of the reference's per-identity loop; shapes are
        identical across identities (fixed horizon, hubert padded to
        2·horizon) so every chunk reuses the same compiled program."""
        names = sorted(identities)
        if not names:
            return {}
        batch = len(names) if batch is None else max(1, batch)
        if self.mesh is not None:  # chunk shape must divide over the mesh
            batch = -(-batch // self.mesh.size) * self.mesh.size
        paths: dict[str, str] = {}
        key = jax.random.PRNGKey(seed)
        for lo in range(0, len(names), batch):
            chunk = names[lo : lo + batch]
            n_real = len(chunk)
            prepped = [prepare_condition(*identities[n],
                                         self.model_cfg.horizon)
                       for n in chunk]
            while len(prepped) < batch:  # pad to the compiled batch shape
                prepped.append(prepped[-1])
            face = np.concatenate([f for f, _ in prepped])
            cond = np.concatenate([c for _, c in prepped])
            key, sub = jax.random.split(key)
            residual = self.generate_residual(sub, face, cond)
            out = residual + jnp.asarray(face)       # ref inference.py:155
            out = out.reshape(out.shape[0], out.shape[1], 68, 3)
            if self.face3d is not None:
                out = self.face3d.idexp_to_absolute(out)
            else:
                out = out / 10.0
            out = np.asarray(out)
            for i, name in enumerate(chunk[:n_real]):
                d = os.path.join(out_dir, "frontalized_npy", name)
                os.makedirs(d, exist_ok=True)
                p = os.path.join(d, f"{tag}.npy")
                np.save(p, out[i])
                paths[name] = p
                if save_pngs:
                    save_landmark_pngs(
                        out[i], os.path.join(out_dir, "png", name))
        return paths


def save_landmark_pngs(lm3d: np.ndarray, out_dir: str, wh: int = 256):
    """Dot-render [T,68,3] landmarks to per-frame pngs, reference scaling
    (× WH/2 + WH/2, y-flip — inference.py:166-177). cv2-free."""
    from ..data.mtov_dataset import rasterize_landmarks

    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return []
    lm2d = (lm3d[..., :2] * wh / 2 + wh / 2).astype(int)
    imgs = rasterize_landmarks(lm2d, size=wh, src_wh=wh)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(imgs.shape[0]):
        frame = 255 - imgs[i, ::-1]  # black dots on white, y-flipped
        p = os.path.join(out_dir, f"{i:05d}.png")
        Image.fromarray(frame).save(p)
        paths.append(p)
    return paths
