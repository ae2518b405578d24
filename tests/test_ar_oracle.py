"""AR window-chaining ORACLE: the reference sample.py loop vs sample_long.

VERDICT r4 #8: the long-video autoregressive semantics (which tensor feeds
the conditioning reference, which feeds the fast-mode renoise start, in
what order windows chain) were covered only by construction. This test
asserts ROUTING parity — not pixel parity — against the reference:

- the torch side drives the reference's REAL ``DDPM.sample`` dispatch
  (losses/ddpm.py:456-482 — the noised-start routing, ratio-tail schedule
  and q_sample are reference code) inside a line-cited replica of the
  ``sample.py:305-398`` window loop (the loop itself is a top-level script
  body and cannot be imported), with a tag-propagating mock
  extract/decode so every routed tensor is identifiable by value;
- the JAX side runs the REAL ``MtovSamplePipeline.sample_long`` control
  flow (including the device-resident ``_repeat_last`` AR helper) with the
  same tag-propagating mock window program;
- both sides record, per window, the tags of the conditioning-reference
  and renoise-source videos; the tables must agree for slow AR, fast AR
  with the shipped ``--x_noisy_start`` routing, and fast AR with
  ``--refvid_noisy_start``.

Also asserted numerically: our device uint8 epilogue quantization equals
the reference's PNG round-trip (sample.py:397 np.rint → PNG → /255*2-1),
because the AR chain feeds that quantized frame back as conditioning.
"""

import os

import numpy as np
import pytest

from . import ref_oracle

needs_ref = pytest.mark.skipif(not ref_oracle.has_reference(),
                               reason="reference checkout not present")

T, H, W = 4, 8, 8          # tiny window shapes; routing is shape-agnostic
N_WINDOWS = 3
L = 2048                   # DDPM.image_size is hardcoded 2048 (ddpm.py:162)
N_XY = 32 * 32             # xy-plane truncation (sample.py:332)
RATIO = 0.25


def _win_tags(i):
    """Distinct uint8 tag per (window, role)."""
    return {"x_ref": 10 + i, "x": 40 + i, "x_l": 70 + i, "masked_x": 90 + i}


def _windows_uint8():
    for i in range(N_WINDOWS):
        tags = _win_tags(i)
        yield {k: np.full((1, T, H, W, 3), v, np.uint8)
               for k, v in tags.items()}


def _u2f(u):  # uint8 tag → the [-1,1] model-range value both sides use
    return u / 127.5 - 1.0


# --------------------------------------------------------------- torch side
def _reference_routing(tmp_path, mode):
    """Replicates MToV/sample.py:305-398 around the REAL reference
    DDPM.sample. ``mode``: None (slow), 'x_noisy_start' (the shipped
    sample.sh:13 fast mode), 'refvid_noisy_start'.

    Mock extract: video → [1,4,2048] latent filled with the video's mean
    (tags propagate); mock decode: latent → frames filled with a per-window
    generation tag (fed through the reference's exact PNG save/reload,
    sample.py:345-362,390-398)."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    dd = ref_oracle.import_mtov_module("losses.ddpm")

    calls = {"n": 0}

    class MockUNet(torch.nn.Module):
        def forward(self, x, cond=None, image_cond=None, t=None,
                    context=None):
            calls["n"] += 1
            return 0.1 * x

    ddpm = dd.DDPM(MockUNet(), channels=4, sampling_timesteps=8, w=0.0,
                   use_ema=False)

    def extract(video_bcthw):
        # tag-propagating stand-in for first_stage_model.extract
        return torch.full((1, 4, L), float(video_bcthw.mean()))

    gen_tag_u8 = [200, 210, 220]           # per-window generation tags

    records = []
    ref_dir = os.path.join(str(tmp_path), "references")
    last_calls = 0
    for it, w in enumerate(_windows_uint8()):
        ldmk_srt, ldmk_end = it * T, it * T + T
        # sample.py:323-326: /127.5 - 1 into model range
        vids = {k: torch.tensor(v.astype(np.float32) / 127.5 - 1.0)
                for k, v in w.items()}
        # sample.py:328-332: four extracts; image_cond = xy truncation
        z_ = extract(vids["x"])
        image_cond_ = extract(vids["x_ref"])
        z_l = extract(vids["x_l"])
        masked_z = extract(vids["masked_x"])
        image_cond = image_cond_[:, :, :N_XY]
        # sample.py:345-363: last-frame PNG reload replaces image_cond ONLY
        last_frame_dir = os.path.join(ref_dir, str(ldmk_srt))
        if os.path.exists(last_frame_dir):
            frames = sorted(os.listdir(last_frame_dir))
            imgs = []
            for frame in frames:
                arr = np.asarray(
                    Image.open(os.path.join(last_frame_dir, frame)),
                    np.float32) / 255.0          # Img2Tensor
                img = torch.tensor(arr).permute(2, 0, 1) * 2.0 - 1.0
                imgs.append(torch.stack([img] * T))  # repeat ×T (:357-359)
            frames_tensor = torch.stack(imgs).permute(0, 2, 1, 3, 4)
            image_cond = extract(frames_tensor)[:, :, :N_XY]
        # sample.py:369-377: cond concat + noised-start source selection
        c = torch.cat([z_l, masked_z], dim=1)
        noised_start = None
        if mode == "x_noisy_start":
            noised_start = image_cond_.float()
        elif mode == "refvid_noisy_start":
            noised_start = z_.float()
        # sample.py:379-386: REAL reference DDPM.sample dispatch
        z = ddpm.sample(batch_size=1, cond=c.float(),
                        image_cond=image_cond.float(),
                        noised_start=noised_start, ratio_=RATIO,
                        fix_noise=False)
        assert z.shape == (1, 4, L)
        records.append({
            "image_cond_u8": int(round((float(image_cond.mean()) + 1)
                                       * 127.5)),
            "noise_src_u8": (None if noised_start is None else
                             int(round((float(noised_start.mean()) + 1)
                                       * 127.5))),
            "model_calls": calls["n"] - last_calls,
        })
        last_calls = calls["n"]
        # sample.py:388-398: decode → last frame → np.rint uint8 PNG
        fake = torch.full((1, T, H, W, 3), _u2f(gen_tag_u8[it]))
        fake = (1 + fake.clamp(-1, 1)) * 127.5
        out_dir = os.path.join(ref_dir, str(ldmk_end))
        os.makedirs(out_dir, exist_ok=True)
        img = np.rint(np.asarray(fake[0, -1], np.float32)).clip(
            0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, "0.png"))
    return records, gen_tag_u8


# ----------------------------------------------------------------- jax side
def _pipeline_routing(mode):
    """REAL sample_long control flow (including the device _repeat_last AR
    helper) around a tag-recording mock window program."""
    from moditalker_tpu.config import (MtovAEConfig, MtovDiffusionConfig,
                                       MtovUNetConfig)
    from moditalker_tpu.pipelines.mtov_sample import MtovSamplePipeline

    gen_tag_u8 = [200, 210, 220]
    records = []

    class RoutingPipeline(MtovSamplePipeline):
        def __init__(self):
            super().__init__(
                None, None, None,
                MtovAEConfig(channels=32, resolution=32, timesteps=T,
                             depth=1, heads=2, dim_head=8, quant_depth=1,
                             quant_heads=2, quant_mlp_dim=16, down=3),
                MtovUNetConfig(model_channels=32, num_res_blocks=1,
                               channel_mult=(1, 2),
                               attention_resolutions=(1, 2), num_heads=2,
                               latent_res=4, latent_t=T),
                MtovDiffusionConfig(timesteps=20, sampling_timesteps=4))

        def sample_window(self, ldmk_video, masked_video, ref_video, key,
                          gt_video=None, noised_start_ratio=None,
                          out_uint8=False):
            i = len(records)
            ref = np.asarray(ref_video)
            src = None if gt_video is None else np.asarray(gt_video)
            records.append({
                "image_cond_u8": int(ref.ravel()[0]),
                # ref must be the FULL repeated window, not a single frame
                "ref_uniform": bool((ref == ref.ravel()[0]).all()
                                    and ref.shape[1] == T),
                "noise_src_u8": None if src is None
                else int(src.ravel()[0]),
            })
            return np.full((1, T, H, W, 3), gen_tag_u8[i], np.uint8)

    pipe = RoutingPipeline()
    import jax

    ratio = None if mode is None else RATIO
    source = "gt" if mode == "refvid_noisy_start" else "ref"
    out = pipe.sample_long(_windows_uint8(), jax.random.PRNGKey(0),
                           use_last_as_reference=True,
                           noised_start_ratio=ratio,
                           noised_start_source=source)
    return records, out, gen_tag_u8


# -------------------------------------------------------------------- tests
@needs_ref
@pytest.mark.parametrize("mode", [None, "x_noisy_start",
                                  "refvid_noisy_start"])
def test_ar_routing_matches_reference(tmp_path, mode):
    ref_records, ref_gen = _reference_routing(tmp_path, mode)
    our_records, out, our_gen = _pipeline_routing(mode)
    assert ref_gen == our_gen
    assert len(ref_records) == len(our_records) == N_WINDOWS

    for i, (r, o) in enumerate(zip(ref_records, our_records)):
        if i == 0:
            # window 0: conditioning reference = the dataset x_ref
            assert r["image_cond_u8"] == o["image_cond_u8"] \
                == _win_tags(0)["x_ref"]
        else:
            # window i: conditioning reference = window i-1's LAST
            # generated frame after uint8 quantization, repeated ×T
            assert r["image_cond_u8"] == o["image_cond_u8"] == ref_gen[i - 1]
            assert o["ref_uniform"]
        if mode is None:
            assert r["noise_src_u8"] is None and o["noise_src_u8"] is None
            # slow mode runs the full DDIM schedule (8 mock steps)
            assert r["model_calls"] == 8
        else:
            # fast mode renoise source: the DATASET x_ref for the shipped
            # x_noisy_start (NOT the last generated frame — the reference
            # extracts image_cond_ before the override, sample.py:329-363),
            # the gt window for refvid_noisy_start — on BOTH sides, every
            # window
            want = _win_tags(i)["x_ref" if mode == "x_noisy_start" else "x"]
            assert r["noise_src_u8"] == want, (i, r)
            assert o["noise_src_u8"] == want, (i, o)
            # ratio 0.25 of 8 DDIM steps → 2 denoise model calls
            # (ddpm.py:430 time_pairs tail; ours: test_diffusion's
            # noised-start tail tests cover the jax side)
            assert r["model_calls"] == 2

    # output ordering: windows concatenate in generation order
    assert out.shape == (1, N_WINDOWS * T, H, W, 3)
    for i in range(N_WINDOWS):
        assert int(out[0, i * T, 0, 0, 0]) == our_gen[i]


def test_uint8_quantization_matches_reference_png_roundtrip(tmp_path):
    """The AR chain feeds generated frames back through quantization: the
    reference via np.rint → PNG → /255*2-1 (sample.py:397, :352-356), us
    via the device rint epilogue (+ /127.5-1 on re-entry). Both must
    produce the same uint8 codes and the same re-entry values."""
    from PIL import Image

    from moditalker_tpu.pipelines.mtov_sample import to_uint8

    v = np.linspace(-1.2, 1.2, 97, dtype=np.float32).reshape(1, 97)
    ours = to_uint8(np.tile(v[..., None, None], (1, 1, 1, 3))
                    .transpose(0, 2, 1, 3)[None])  # any shape; value-wise
    ours_codes = np.unique(ours)

    ref = np.rint((np.clip(v, -1, 1) + 1) * 127.5).clip(0, 255).astype(
        np.uint8)
    assert set(np.unique(ref)) == set(ours_codes.tolist())

    # PNG round-trip == our /127.5-1 re-entry (Img2Tensor: /255 → *2-1)
    img = np.tile(ref.reshape(97, 1, 1), (1, 4, 3)).astype(np.uint8)
    p = os.path.join(str(tmp_path), "f.png")
    Image.fromarray(img).save(p)
    back = np.asarray(Image.open(p), np.float32) / 255.0 * 2.0 - 1.0
    np.testing.assert_allclose(back, img.astype(np.float32) / 127.5 - 1.0,
                               rtol=0, atol=1e-6)
