"""Full audio→video pipeline benchmark — prints ONE JSON line (stdout).

Times every stage of the reference's end-to-end inference dataflow
(SURVEY.md §1, ref README.md:109-147) at the published op point, on the
attached TPU chip, with full-size models (random weights — identical FLOPs):

    wav 6.24 s ──hubert-large (chunked fwd)──▶ [T,1024]        process_audio.py
      ──AToM DDIM-50 CFG, horizon 156──▶ frontalized [156,68,3] AToM/inference.py
      ──motion align: FAN per frame + recon ResNet-50──▶ aligned [156,68,2]
                                                         align_face_recon.py
      ──MToV: rasterize → 9 AR windows × (extract ×3 + DDIM + decode)──▶ frames
                                                                sample.py
      ──ffmpeg mux──▶ mp4

Reports seconds-per-second-of-video (the BASELINE.md north-star unit) with a
stage breakdown, for both the standard DDIM-100 window and the reference's
shipped fast AR mode (noised start, ratio 0.25 → 25 denoise steps,
scripts/inference/sample.sh:10-13).

Timing is honest over the device tunnel: host fetches close every stage (the
per-frame FAN/recon stages fetch inherently).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

FPS = 25
HORIZON = 156                       # ref AToM/inference.py:26
SECONDS = HORIZON / FPS             # 6.24 s
IDENTITIES = int(os.environ.get("BENCH_E2E_IDENTITIES", "1"))

# Reference single-H100 end-to-end ESTIMATE (derivation + bounds:
# BASELINE.md "End-to-end baseline estimate"): hubert 0.2 s + AToM 1.0 s
# (100 sequential CFG decoder passes) + align 22 s (156 sequential
# fa.get_landmarks calls ~0.1 s each, align_face_recon.py:159-162, + 9
# recon_coeff windows) + MToV 10.8 s (144 frames / 13.3 fps) + mux 0.3 s
# ≈ 34.3 s for 5.76 s of generated video → 5.95 s/s. Fast mode (25-step
# windows): MToV 5.4 s → 28.9 s → 5.02 s/s.
REF_H100_E2E_S_PER_S = 5.95
REF_H100_E2E_S_PER_S_FAST = 5.02


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from moditalker_tpu.compile_cache import cache_was_warm, \
        enable_compile_cache
    compile_cache_warm = cache_was_warm()
    enable_compile_cache()

    from moditalker_tpu.config import (AtomDiffusionConfig, AtomModelConfig,
                                       MtovAEConfig, MtovDiffusionConfig,
                                       MtovUNetConfig)
    from moditalker_tpu.data.mtov_dataset import rasterize_landmarks
    from moditalker_tpu.models.atom import MotionDecoder
    from moditalker_tpu.models.mtov import MtovDDPM, ViTAutoencoder
    from moditalker_tpu.pipelines.atom_infer import AtomInferencePipeline
    from moditalker_tpu.pipelines.mtov_sample import (MtovSamplePipeline,
                                                      write_video)
    from moditalker_tpu.preprocess import audio as audio_pp
    from moditalker_tpu.preprocess.fan import FAN, FanLandmarker
    from moditalker_tpu.preprocess.hubert import HubertConfig, HubertEncoder
    from moditalker_tpu.preprocess.motion_align import MotionAligner
    from moditalker_tpu.preprocess.recon_net import ReconNet
    from moditalker_tpu.preprocess.reconstructor import Reconstructor
    from moditalker_tpu.preprocess.load_mats import synthetic_lm3d_std

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    stages: dict[str, float] = {}
    t_wall = time.perf_counter()

    # ---------------- model setup (all full-size, random weights) ----------
    t0 = time.perf_counter()
    hub_cfg = HubertConfig()  # hubert-large
    hub = HubertEncoder(hub_cfg, dtype=jnp.bfloat16)
    n_chunk = 16000 * 10      # process_audio chunking unit
    hub_params = jax.jit(hub.init)(key, jnp.zeros((1, n_chunk)))
    hub_apply = jax.jit(lambda p, w: hub.apply(p, w))

    atom_cfg = AtomModelConfig()
    atom_diff = AtomDiffusionConfig()
    dec = MotionDecoder(atom_cfg)
    atom_params = jax.jit(dec.init)(
        key, jnp.zeros((1, HORIZON, 204)), jnp.zeros((1, HORIZON, 204)),
        jnp.zeros((1, HORIZON * 2, 1024)), jnp.zeros((1,), jnp.int32))
    atom = AtomInferencePipeline(atom_params, atom_cfg, atom_diff,
                                 dtype=jnp.bfloat16)

    fan_model = FAN(num_modules=4)
    fan_params = jax.jit(fan_model.init)(key, jnp.zeros((1, 256, 256, 3)))
    # bf16 conv trunks = the TPU eval mode (fp32 params/heads; fp32 is the
    # parity-test path, bf16 agreement at real weights is golden's job)
    fan = FanLandmarker(fan_params, dtype=jnp.bfloat16)

    from moditalker_tpu.preprocess.s3fd import S3FD, S3FDDetector

    s3_model = S3FD()
    s3_params = jax.jit(s3_model.init)(key, jnp.zeros((1, 256, 256, 3)))
    # threshold 0.999, NOT the production 0.5: random-weight confidences are
    # ~uniform, so ~half of all 5.4k anchors clear 0.5 on EVERY frame —
    # overflowing the top-k candidate budget and forcing the full-map
    # refetch + a 2000-box NMS per frame, a control path real weights never
    # take (real detections are sparse). 0.999 keeps counts inside the
    # budget so the phase times the production program sequence; FLOPs are
    # identical (thresholds gate only the host decode).
    s3_det = S3FDDetector(s3_params, threshold=0.999, dtype=jnp.bfloat16)

    align_phases: dict[str, float] = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            align_phases[name] = (align_phases.get(name, 0.0)
                                  + time.perf_counter() - t0)
            return out
        return wrap

    def landmark_fn(frames_u8):
        # the reference detects + landmarks every frame independently
        # (align_face_recon.py:155-163) — both nets batch over frames.
        # Random S3FD weights rarely clear the detection threshold, so the
        # timed path pays the real batched detector forward and falls back
        # to fixed boxes for the FAN crops (identical FLOPs to detections).
        boxes = timed("s3fd", s3_det.boxes_for_frames)(frames_u8)
        if boxes is None:
            t = frames_u8.shape[0]
            h, w = frames_u8.shape[1:3]
            boxes = np.tile(np.array(
                [[w * 0.22, h * 0.22, w * 0.78, h * 0.78]]), (t, 1))
        return timed("fan", fan.landmarks_batched)(frames_u8, boxes)

    recon_model = ReconNet()
    recon_params = jax.jit(recon_model.init)(key,
                                             jnp.zeros((1, 224, 224, 3)))
    lm3d_std = synthetic_lm3d_std()
    recon = Reconstructor(recon_params, lm3d_std, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_E2E_MODULAR_ALIGN"):
        # the three-program modular path (kept for A/B)
        aligner = MotionAligner(landmark_fn,
                                timed("recon", recon.coeff_fn()), lm3d_std)
    else:
        # production path: the whole S3FD→crop→FAN→POS→crop→ReconNet chain
        # as ONE device program per 64-frame chunk (preprocess/fused_align).
        # require_detection=False: random S3FD weights rarely clear the
        # threshold; the flag skips the modular neighbour-fill fallback so
        # the timed path is the fused program sequence (identical FLOPs —
        # every frame computes from its argmax box either way).
        from moditalker_tpu.preprocess.fused_align import FusedAligner

        fused = FusedAligner(s3_params, fan_params, recon_params, lm3d_std,
                             threshold=0.999, dtype=jnp.bfloat16)
        fused.process = timed("fused", fused.process)
        aligner = MotionAligner(landmark_fn,
                                timed("recon", recon.coeff_fn()), lm3d_std,
                                fused=fused, require_detection=False)

    ae_cfg = MtovAEConfig()
    unet_cfg = MtovUNetConfig()
    diff_cfg = MtovDiffusionConfig(sampling_timesteps=100)
    ae = ViTAutoencoder(ae_cfg, dtype=jnp.bfloat16)
    v0 = jnp.zeros((1, ae_cfg.timesteps, ae_cfg.resolution,
                    ae_cfg.resolution, 3))
    ae_params = jax.jit(ae.init)(key, v0)
    ddpm = MtovDDPM.create(unet_cfg, diff_cfg, dtype=jnp.bfloat16)
    L = ae_cfg.latent_len
    unet_params = jax.jit(ddpm.model.init)(
        key, jnp.zeros((1, 4, L)), jnp.zeros((1, 8, L)),
        jnp.zeros((1, 4, L)), jnp.zeros((1,), jnp.int32))
    pipe = MtovSamplePipeline(ae_params, ae_params, unet_params,
                              ae_cfg, unet_cfg, diff_cfg)
    log(f"setup(init) {time.perf_counter()-t0:.1f}s")

    # synthetic inputs: 6.24 s of audio, a 156-frame driving video, an
    # identity keypoint, in the reference's exact formats
    wave = rng.normal(scale=0.1, size=(int(16000 * SECONDS),)).astype(
        np.float32)
    driving = rng.integers(0, 255, (HORIZON, 256, 256, 3)).astype(np.uint8)
    ident_kp = rng.normal(scale=0.3, size=(68, 3)).astype(np.float32)

    # ---------------- stage 1: audio → hubert features ---------------------
    # warmup: the chunked forward compiles one program per distinct chunk
    # length (full 10 s chunks + the remainder); steady state is what a
    # serving process pays per utterance
    hub_fn = lambda w: np.asarray(hub_apply(hub_params, jnp.asarray(w)),
                                  np.float32)[0]
    _ = audio_pp.extract_hubert_features(
        audio_pp.normalize_like_wav2vec2(wave), hub_fn)
    t0 = time.perf_counter()
    feats = audio_pp.extract_hubert_features(
        audio_pp.normalize_like_wav2vec2(wave), hub_fn)
    stages["hubert"] = time.perf_counter() - t0
    log(f"hubert {stages['hubert']:.2f}s → {feats.shape}")

    # ---------------- stage 2: AToM → frontalized landmarks ----------------
    # warmup compile outside the timed region (one-time cost per process)
    _ = atom.generate_landmarks(key, ident_kp, feats)
    t0 = time.perf_counter()
    lm3d = np.stack([
        atom.generate_landmarks(jax.random.PRNGKey(i), ident_kp, feats)
        for i in range(IDENTITIES)])
    stages["atom"] = (time.perf_counter() - t0) / IDENTITIES
    log(f"atom {stages['atom']:.2f}s → {lm3d.shape}")

    # ---------------- stage 3: motion alignment (FAN + recon) --------------
    # warmup: compile the FAN and recon programs on a 2-frame slice
    _ = aligner.align_sequence(lm3d[0][:2], driving[:2])
    align_phases.clear()
    t0 = time.perf_counter()
    aligned = aligner.align_sequence(lm3d[0], driving)
    stages["align"] = time.perf_counter() - t0
    other = stages["align"] - sum(align_phases.values())
    log(f"align {stages['align']:.2f}s → {aligned.shape} "
        f"(phases: " + " ".join(f"{k}={v:.2f}s"
                                for k, v in align_phases.items())
        + f" other(host math)={other:.2f}s)")
    # snapshot: the A/B below re-enters the shared timed landmark_fn and
    # would otherwise fold modular-arm time into the headline phase split
    align_phases_headline = dict(align_phases)

    # fused-vs-modular align A/B, SAME session (VERDICT r4 #3: the fused
    # gain must be driver-reproducible, not quoted from a favorable relay
    # day). The modular arm re-times the reference-shaped three-program
    # path (batched S3FD dispatch + host crops + batched FAN + host POS +
    # batched recon) on the SAME 156-frame sequence; its time is recorded
    # in extra only — the headline total uses the production (fused) arm.
    align_ab: dict[str, float] = {}
    if not os.environ.get("BENCH_E2E_SKIP_AB") \
            and not os.environ.get("BENCH_E2E_MODULAR_ALIGN"):
        align_ab["fused_s"] = stages["align"]
        mod_aligner = MotionAligner(landmark_fn, recon.coeff_fn(), lm3d_std)
        _ = mod_aligner.align_sequence(lm3d[0][:2], driving[:2])  # warmup
        t0 = time.perf_counter()
        aligned_mod = mod_aligner.align_sequence(lm3d[0], driving)
        align_ab["modular_s"] = time.perf_counter() - t0
        align_ab["fused_speedup"] = round(
            align_ab["modular_s"] / max(align_ab["fused_s"], 1e-9), 2)
        # sanity: both arms must produce the same-shaped aligned output
        assert aligned_mod.shape == aligned.shape
        log(f"align A/B: fused {align_ab['fused_s']:.2f}s vs modular "
            f"{align_ab['modular_s']:.2f}s ({align_ab['fused_speedup']}x)")

    # ---------------- stage 4: MToV AR windows -----------------------------
    aligned_i = np.clip(np.nan_to_num(aligned), 0, 255).astype(int)
    res = ae_cfg.resolution

    def windows():
        for lo in range(0, HORIZON - ae_cfg.timesteps + 1, ae_cfg.timesteps):
            lm = aligned_i[lo : lo + ae_cfg.timesteps]
            ldmk = rasterize_landmarks(lm, size=res, src_wh=256)
            vid = driving[lo : lo + ae_cfg.timesteps]
            # uint8 windows: model-range conversion happens ON DEVICE inside
            # the window program (round-4 change — 4x less host-link upload)
            yield {
                "x_l": ldmk[None],
                "x": vid[None],
                "masked_x": vid[None],
                "x_ref": np.stack([driving[0]] * ae_cfg.timesteps)[None],
            }

    n_windows = HORIZON // ae_cfg.timesteps

    def two_windows():
        it = iter(windows())
        yield next(it)
        yield next(it)

    # warmup: sample_long itself with >=2 windows (the first window and the
    # chained last-frame-as-reference windows compile different program
    # variants; warming sample_window alone is not enough)
    _ = pipe.sample_long(two_windows(), key, use_last_as_reference=True)
    t0 = time.perf_counter()
    frames = pipe.sample_long(windows(), key, use_last_as_reference=True)
    stages["mtov"] = time.perf_counter() - t0
    log(f"mtov {stages['mtov']:.2f}s → {frames.shape} ({n_windows} windows)")

    # fast AR mode (noised start 0.25 → 25 denoise steps)
    _ = pipe.sample_long(two_windows(), key, use_last_as_reference=True,
                         noised_start_ratio=0.25)
    t0 = time.perf_counter()
    frames_fast = pipe.sample_long(windows(), key,
                                   use_last_as_reference=True,
                                   noised_start_ratio=0.25)
    stages["mtov_fast"] = time.perf_counter() - t0
    log(f"mtov fast {stages['mtov_fast']:.2f}s")

    # ---------------- stage 5: ffmpeg mux -----------------------------------
    import tempfile
    import wave as wavemod

    with tempfile.TemporaryDirectory() as td:
        wav_path = os.path.join(td, "a.wav")
        with wavemod.open(wav_path, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes((wave * 32767).astype(np.int16).tobytes())
        t0 = time.perf_counter()
        out = write_video(frames[0], os.path.join(td, "out.mp4"), fps=FPS,
                          audio_path=wav_path)
        stages["mux"] = time.perf_counter() - t0
        log(f"mux {stages['mux']:.2f}s → {out}")

    gen_seconds = frames.shape[1] / FPS
    total = (stages["hubert"] + stages["atom"] + stages["align"]
             + stages["mtov"] + stages["mux"])
    total_fast = (stages["hubert"] + stages["atom"] + stages["align"]
                  + stages["mtov_fast"] + stages["mux"])
    s_per_s = total / gen_seconds
    s_per_s_fast = total_fast / gen_seconds
    print(json.dumps({
        "metric": "e2e_seconds_per_second_of_video",
        "value": round(s_per_s, 3),
        "unit": "s/s",
        # >1 = this chip is faster end-to-end than the documented reference
        # H100 estimate (derivation + bounds in BASELINE.md)
        "vs_baseline": round(REF_H100_E2E_S_PER_S / s_per_s, 3),
        "extra": {
            "video_seconds": round(gen_seconds, 2),
            "total_seconds": round(total, 2),
            "total_seconds_fast_mode": round(total_fast, 2),
            "fast_mode_s_per_s": round(s_per_s_fast, 3),
            "fast_mode_vs_baseline": round(
                REF_H100_E2E_S_PER_S_FAST / s_per_s_fast, 3),
            "stages_seconds": {k: round(v, 3) for k, v in stages.items()},
            "align_phases_seconds": {k: round(v, 3)
                                     for k, v in align_phases_headline
                                     .items()},
            "align_fused_vs_modular": ({k: round(v, 3)
                                        for k, v in align_ab.items()}
                                       or None),
            "wall_with_compile": round(time.perf_counter() - t_wall, 1),
            "compile_cache_warm": compile_cache_warm,
            "baseline_note": "vs documented per-stage estimate of the "
                             "reference on 1xH100 (BASELINE.md 'End-to-end "
                             "baseline estimate'); no published numbers",
            "note": "random weights (identical FLOPs); stage order = ref "
                    "README.md:109-147; mtov = DDIM-100 windows, "
                    "mtov_fast = noised-start ratio 0.25 (sample.sh mode)",
        },
    }))


if __name__ == "__main__":
    main()
