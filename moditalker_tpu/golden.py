"""Real-checkpoint golden harness.

The published MoDiTalker release ships seven pretrained-artifact kinds
(SURVEY.md §2.7: atom.pt, autoencoder_rgb.pth, autoencoder_motion.pth,
diffusion_model.pth, LPIPS vgg.pth, i3d_pretrained_400.pt, FAN/S3FD from
face_alignment; HuBERT comes from the HF hub). None are available offline,
so round-1 parity tests ported freshly initialized torch modules. This
harness makes real-weight validation a one-command affair the moment the
files exist:

    python -m moditalker_tpu.cli golden --ckpt-dir ckpts/ --mode convert
    python -m moditalker_tpu.cli golden --params-dir out/ --mode record
    python -m moditalker_tpu.cli golden --params-dir out/ --mode check \
        --golden goldens.npz

``convert``  : run every applicable torch→flax converter on the files found
               (missing files are reported and skipped).
``record``   : run fixed-seed probes through every converted model (one
               MToV window, one AToM sequence, single forwards of the
               auxiliary nets) and save the outputs.
``check``    : re-run the probes and compare against a stored goldens file
               (numerical tolerance, reports per-probe max error).

Probes are deterministic: fixed PRNG keys, fixed synthetic inputs, DDIM
step counts cut to 4 (golden value determinism matters, realism doesn't).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# checkpoint file name → converter kind (reference names, README.md:100-106)
CKPT_KINDS = {
    "atom.pt": "atom",
    "autoencoder_rgb.pth": "vit-autoencoder",
    "autoencoder_motion.pth": "vit-autoencoder",
    "diffusion_model.pth": "triplane-unet",
    "vgg.pth": "lpips",
    "i3d_pretrained_400.pt": "i3d",
    "epoch_20.pth": "recon-resnet50",
    "s3fd-619a316812.pth": "s3fd",
    "2DFAN4-cd938726ad.zip": "fan",
}


# torchvision's pretrained VGG16 file name (the LPIPS trunk; vgg.pth holds
# only the lin heads — ref losses/lpips.py:14-52 wraps torchvision vgg16)
VGG16_TRUNK_FILE = "vgg16-397923af.pth"


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_vgg16_features_sd(ckpt_dir: str | None = None,
                           path: str | None = None) -> dict:
    """torchvision VGG16 ``features`` state_dict as numpy, for the LPIPS
    trunk. Search order: explicit ``path``, ``{ckpt_dir}/vgg16-*.pth``, the
    torch hub cache. Accepts either a full-model state dict (keys
    ``features.N.*`` — the torchvision download format) or a bare
    ``features`` state dict (keys ``N.*``)."""
    import torch

    candidates = []
    if path:
        candidates.append(path)
    if ckpt_dir:
        candidates.append(os.path.join(ckpt_dir, VGG16_TRUNK_FILE))
    hub = os.path.join(os.path.expanduser("~"), ".cache", "torch", "hub",
                       "checkpoints", VGG16_TRUNK_FILE)
    candidates.append(hub)
    for c in candidates:
        if os.path.exists(c):
            raw = torch.load(c, map_location="cpu", weights_only=False)
            if hasattr(raw, "state_dict"):
                raw = raw.state_dict()
            sd = {k: v.detach().numpy() if hasattr(v, "detach") else
                  np.asarray(v) for k, v in raw.items()}
            return {k[len("features."):]: v for k, v in sd.items()
                    if k.startswith("features.")} or sd
    raise FileNotFoundError(
        f"VGG16 trunk weights not found (looked for {VGG16_TRUNK_FILE} in "
        f"{candidates}); LPIPS needs torchvision's vgg16 features in "
        f"addition to the lin-head file vgg.pth")


def _convert_lpips_entry(sd: dict, ctx: dict) -> dict:
    from .utils import torch_port

    vgg_sd = load_vgg16_features_sd(ctx.get("ckpt_dir"),
                                    ctx.get("vgg16_path"))
    return torch_port.convert_lpips(vgg_sd, sd)


def _converter(kind: str):
    """Uniform-arity converter registry: every entry is ``fn(sd, ctx)``.

    One dispatch point shared by ``convert_all`` and the CLI so an arity
    mismatch like round 2's ``convert_lpips(sd)`` (two-argument function
    called with one — VERDICT r2 #4) cannot recur unseen."""
    from .utils import torch_port

    if kind == "atom":
        return lambda sd, ctx: torch_port.convert_atom_decoder(sd)
    if kind == "vit-autoencoder":
        return lambda sd, ctx: torch_port.convert_vit_autoencoder(sd)
    if kind == "triplane-unet":
        return lambda sd, ctx: torch_port.convert_triplane_unet(sd)
    if kind == "lpips":
        return _convert_lpips_entry
    if kind == "i3d":
        from .evals.i3d import convert_i3d

        return lambda sd, ctx: convert_i3d(sd)
    if kind == "recon-resnet50":
        from .preprocess.recon_net import convert_recon_net

        return lambda sd, ctx: convert_recon_net(sd)
    if kind == "s3fd":
        from .preprocess.s3fd import convert_s3fd

        return lambda sd, ctx: convert_s3fd(sd)
    if kind == "fan":
        from .preprocess.fan import convert_fan

        return lambda sd, ctx: convert_fan(sd)
    if kind == "hubert":
        from .preprocess.hubert import HubertConfig, convert_hubert

        return lambda sd, ctx: convert_hubert(sd, HubertConfig())
    raise KeyError(f"no converter for kind {kind!r}")


def load_torch_state_dict(path: str, ema: bool = True) -> dict:
    """torch checkpoint file → flat numpy state dict (unwraps the AToM
    {ema,model,optimizer} container, AToM/AToM.py:188-192, and DDP
    ``module.`` prefixes)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "ema_state_dict" in raw:
        raw = raw["ema_state_dict" if ema else "model_state_dict"]
    return {k.replace("module.", ""):
            (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in raw.items()}


def convert_all(ckpt_dir: str, out_dir: str) -> dict:
    """Convert every recognized checkpoint present in ``ckpt_dir``."""
    from .core.checkpoint import save_single

    os.makedirs(out_dir, exist_ok=True)
    done, missing = {}, []
    ctx = {"ckpt_dir": ckpt_dir}
    for fname, kind in CKPT_KINDS.items():
        path = os.path.join(ckpt_dir, fname)
        if not os.path.exists(path):
            missing.append(fname)
            continue
        sd = load_torch_state_dict(path)
        try:
            tree = _converter(kind)(sd, ctx)
        except FileNotFoundError as e:
            _log(f"skipped {fname} [{kind}]: {e}")
            continue
        out = os.path.join(out_dir, fname.split(".")[0])
        save_single(out, tree)
        done[fname] = out
        _log(f"converted {fname} [{kind}] → {out}")
    for m in missing:
        _log(f"missing: {m} (skipped)")
    return done


def _load_or_init(params_dir: str | None, stem: str, init_fn):
    """Converted params when present, deterministic random init otherwise."""
    if params_dir:
        path = os.path.join(params_dir, stem)
        if os.path.exists(path):
            from .core.checkpoint import load_single

            return load_single(path), True
    return init_fn(), False


def run_probes(params_dir: str | None = None, tiny: bool = False) -> dict:
    """Fixed-seed forward probes for every model family → {name: ndarray}."""
    import jax
    import jax.numpy as jnp

    from .config import (AtomDiffusionConfig, AtomModelConfig, MtovAEConfig,
                         MtovDiffusionConfig, MtovUNetConfig)
    from .models.atom import AtomDiffusion, MotionDecoder
    from .models.mtov import MtovDDPM, ViTAutoencoder

    key = jax.random.PRNGKey(1234)
    rng = np.random.default_rng(1234)
    out: dict[str, np.ndarray] = {}

    # ---- AToM: one DDIM-4 sequence
    mc = AtomModelConfig(horizon=16 if tiny else 156)
    dc = AtomDiffusionConfig(sampling_steps=4)
    dec = MotionDecoder(mc)

    def init_atom():
        return jax.jit(dec.init)(
            key, jnp.zeros((1, mc.horizon, 204)),
            jnp.zeros((1, mc.horizon, 204)),
            jnp.zeros((1, mc.horizon * 2, 1024)), jnp.zeros((1,), "int32"))

    atom_params, real = _load_or_init(params_dir, "atom", init_atom)
    diff = AtomDiffusion.create(mc, dc)
    face = jnp.asarray(rng.normal(size=(1, mc.horizon, 204)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(1, mc.horizon * 2, 1024)),
                       jnp.float32)
    seq = jax.jit(lambda p, k: diff.ddim_sample(
        p, k, (1, mc.horizon, 204), face, cond))(atom_params, key)
    out["atom_sequence"] = np.asarray(seq)
    _log(f"atom probe ({'real' if real else 'random'} weights): "
         f"{seq.shape}")

    # ---- MToV: one window (extract → DDIM-4 → decode)
    ae_cfg = (MtovAEConfig(channels=32, resolution=32, timesteps=4, depth=1,
                           heads=2, dim_head=8, quant_depth=1, quant_heads=2,
                           quant_mlp_dim=16)
              if tiny else MtovAEConfig())
    unet_cfg = (MtovUNetConfig(model_channels=32, num_res_blocks=1,
                               channel_mult=(1, 2),
                               attention_resolutions=(1, 2), num_heads=2,
                               latent_res=ae_cfg.latent_res,
                               latent_t=ae_cfg.timesteps)
                if tiny else MtovUNetConfig())
    diff_cfg = MtovDiffusionConfig(sampling_timesteps=4)
    ae = ViTAutoencoder(ae_cfg)
    ddpm = MtovDDPM.create(unet_cfg, diff_cfg)
    L = ae_cfg.latent_len
    video = jnp.asarray(
        rng.uniform(-1, 1, (1, ae_cfg.timesteps, ae_cfg.resolution,
                            ae_cfg.resolution, 3)), jnp.float32)

    def init_ae():
        return jax.jit(ae.init)(key, video)

    def init_unet():
        return jax.jit(ddpm.model.init)(
            key, jnp.zeros((1, 4, L)), jnp.zeros((1, 8, L)),
            jnp.zeros((1, 4, L)), jnp.zeros((1,), "int32"))

    ae_rgb, real_rgb = _load_or_init(params_dir, "autoencoder_rgb", init_ae)
    ae_ldmk, _ = _load_or_init(params_dir, "autoencoder_motion", init_ae)
    unet_p, real_unet = _load_or_init(params_dir, "diffusion_model",
                                      init_unet)

    @jax.jit
    def window(pr, pl, pu, k):
        z_l = ae.apply(pl, video, method=ae.extract)
        masked_z = ae.apply(pr, video, method=ae.extract)
        ic = ae.apply(pr, video, method=ae.extract)
        c = jnp.concatenate([z_l, masked_z], axis=1)
        lat = ddpm.ddim_sample(pu, k, (1, 4, L), c, ic)
        return ae.apply(pr, lat, method=ae.decode_from_sample)

    vid = window(ae_rgb, ae_ldmk, unet_p, key)
    out["mtov_window"] = np.asarray(vid)
    out["mtov_extract"] = np.asarray(
        jax.jit(lambda p: ae.apply(p, video, method=ae.extract))(ae_rgb))
    _log(f"mtov probe ({'real' if real_rgb and real_unet else 'random'} "
         f"weights): {vid.shape}")

    # ---- auxiliary nets: single forwards
    from .preprocess.recon_net import ReconNet

    recon = ReconNet()
    img224 = jnp.asarray(rng.uniform(0, 1, (1, 224, 224, 3)), jnp.float32)
    rp, _ = _load_or_init(
        params_dir, "epoch_20",
        lambda: jax.jit(recon.init)(key, img224))
    out["recon_coeff"] = np.asarray(jax.jit(
        lambda p: recon.apply(p, img224))(rp))

    if not tiny:
        from .preprocess.fan import FAN

        fan = FAN(num_modules=4)
        img256 = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)), jnp.float32)
        fp, _ = _load_or_init(params_dir, "2DFAN4-cd938726ad",
                              lambda: jax.jit(fan.init)(key, img256))
        out["fan_heatmaps"] = np.asarray(
            jax.jit(lambda p: fan.apply(p, img256)[-1])(fp))

        from .preprocess.s3fd import S3FD

        s3 = S3FD()
        sp, _ = _load_or_init(params_dir, "s3fd-619a316812",
                              lambda: jax.jit(s3.init)(key, img256))
        out["s3fd_conf_s4"] = np.asarray(
            jax.jit(lambda p: s3.apply(p, img256)[0])(sp))
    return out


def record(out_path: str, params_dir: str | None, tiny: bool = False):
    probes = run_probes(params_dir, tiny=tiny)
    np.savez_compressed(out_path, **probes)
    _log(f"goldens recorded: {out_path} ({sorted(probes)})")


def compare_probes(probes: dict, gold, rtol: float = 1e-4,
                   atol: float = 1e-4) -> tuple[bool, dict]:
    """Compare a probe dict against recorded goldens (npz mapping or dict)."""
    names = gold.files if hasattr(gold, "files") else list(gold)
    ok = True
    report = {}
    for name in names:
        if name not in probes:
            report[name] = "MISSING"
            ok = False
            continue
        a, b = probes[name], gold[name]
        if a.shape != b.shape:
            report[name] = f"SHAPE {a.shape} vs {b.shape}"
            ok = False
            continue
        err = float(np.abs(a - b).max())
        tol = atol + rtol * float(np.abs(b).max())
        report[name] = f"max_err={err:.3e} tol={tol:.3e}"
        if err > tol:
            ok = False
    return ok, report


def check(golden_path: str, params_dir: str | None, tiny: bool = False,
          rtol: float = 1e-4, atol: float = 1e-4) -> bool:
    probes = run_probes(params_dir, tiny=tiny)
    ok, report = compare_probes(probes, np.load(golden_path), rtol, atol)
    print(json.dumps({"ok": ok, "probes": report}))
    return ok
