"""Numerical parity of MToV models vs the torch reference (ported weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moditalker_tpu.config import MtovAEConfig, MtovUNetConfig
from moditalker_tpu.models.mtov import TriplaneUNet, ViTAutoencoder
from moditalker_tpu.utils.torch_port import (convert_triplane_unet,
                                             convert_vit_autoencoder)

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


@needs_ref
def test_vit_autoencoder_parity():
    """64², 16-frame AE (full architecture, reduced width): extract and
    decode_from_sample must match the torch reference."""
    torch = pytest.importorskip("torch")
    av = ref_oracle.import_mtov_module("models.autoencoder.autoencoder_vit")
    torch.manual_seed(0)

    cfg = MtovAEConfig(channels=64, resolution=64, timesteps=16, depth=2,
                       heads=4, dim_head=16, quant_depth=2, quant_heads=4,
                       quant_mlp_dim=64, embed_dim=4, down=3)
    ddconfig = dict(channels=cfg.channels, resolution=cfg.resolution,
                    timesteps=cfg.timesteps, splits=1)
    tmodel = av.ViTAutoencoder(cfg.embed_dim, ddconfig).eval()
    # reference hardcodes depth=8/heads=8 TimeSformer and depth=4 quant attn;
    # rebuild those submodules at test scale for speed
    vm = ref_oracle.import_mtov_module("models.autoencoder.vit_modules")
    tmodel.encoder = vm.TimeSformerEncoder(
        dim=cfg.channels, image_size=cfg.resolution, num_frames=cfg.timesteps,
        depth=cfg.depth, patch_size=8, heads=cfg.heads, dim_head=cfg.dim_head)
    tmodel.decoder = vm.TimeSformerDecoder(
        dim=cfg.channels, image_size=cfg.resolution, num_frames=cfg.timesteps,
        depth=cfg.depth, patch_size=8, heads=cfg.heads, dim_head=cfg.dim_head)
    tmodel.xy_quant_attn = av.Transformer(cfg.channels, cfg.quant_depth,
                                          cfg.quant_heads, cfg.channels // 8,
                                          cfg.quant_mlp_dim)
    tmodel.yt_quant_attn = av.Transformer(cfg.channels, cfg.quant_depth,
                                          cfg.quant_heads, cfg.channels // 8,
                                          cfg.quant_mlp_dim)
    tmodel.xt_quant_attn = av.Transformer(cfg.channels, cfg.quant_depth,
                                          cfg.quant_heads, cfg.channels // 8,
                                          cfg.quant_mlp_dim)
    tmodel = tmodel.eval()

    params = convert_vit_autoencoder(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        depth=cfg.depth, quant_depth=cfg.quant_depth)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 3, cfg.timesteps, cfg.resolution,
                                 cfg.resolution)).astype(np.float32)

    with torch.no_grad():
        z_ref = tmodel.extract(torch.tensor(x)).numpy()
        dec_ref = tmodel.decode_from_sample(torch.tensor(z_ref)).numpy()

    ae = ViTAutoencoder(cfg)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))  # BCTHW -> BTHWC
    z = ae.apply(params, xj, method=ae.extract)
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=1e-3, atol=2e-4)

    dec = ae.apply(params, jnp.asarray(z_ref), method=ae.decode_from_sample)
    dec_nchw = np.asarray(dec).reshape(
        1, cfg.timesteps, cfg.resolution, cfg.resolution, 3
    ).transpose(0, 4, 1, 2, 3)
    # reference decode returns (b t) grouping collapsed into batch dim:
    dec_ref5 = dec_ref.reshape(1 * cfg.timesteps, 3, cfg.resolution,
                               cfg.resolution)
    got5 = dec_nchw.transpose(0, 2, 1, 3, 4).reshape(
        cfg.timesteps, 3, cfg.resolution, cfg.resolution)
    np.testing.assert_allclose(got5, dec_ref5, rtol=1e-3, atol=2e-4)


@needs_ref
def test_triplane_unet_parity():
    """Full-architecture (reduced width) triplane UNet parity on [B,4,2048]."""
    torch = pytest.importorskip("torch")
    un = ref_oracle.import_mtov_module("models.ddpm.unet")
    torch.manual_seed(0)

    mc = 32
    cfg = MtovUNetConfig(model_channels=mc)
    tmodel = un.UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=mc,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=(1, 2, 4, 4), num_heads=8, use_scale_shift_norm=True,
        resblock_updown=True, use_spatial_transformer=False,
        cond_model=False).eval()
    # the reference pads image_cond with a tensor allocated on "cuda"
    # (unet.py:1023-1024) — run it on CPU by patching torch.zeros' device via
    # the tensor's .to; instead monkeypatch torch.Tensor.to? Simpler: patch
    # torch.zeros call result .to("cuda") by making cuda()->identity.
    orig_to = torch.Tensor.to

    def fake_to(self, *args, **kwargs):
        if args and args[0] == "cuda":
            return self
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = fake_to
    try:
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 4, 2048)).astype(np.float32)
        cond = rng.normal(size=(1, 8, 2048)).astype(np.float32)
        ic = rng.normal(size=(1, 4, 2048)).astype(np.float32)
        t = np.array([37], dtype=np.int64)
        with torch.no_grad():
            expected = tmodel(torch.tensor(x), torch.tensor(cond),
                              torch.tensor(ic), torch.tensor(t)).numpy()
    finally:
        torch.Tensor.to = orig_to

    params = convert_triplane_unet(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model_channels=mc)
    unet = TriplaneUNet(cfg)
    got = unet.apply(params, jnp.asarray(x), jnp.asarray(cond),
                     jnp.asarray(ic), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=2e-4)


def test_group_norm_one_pass_variance_at_production_scales():
    """group_norm_32's variance must hold up when |mean| ≫ std. The plain
    one-pass E[x²]−E[x]² form measured 0.24 of a std of error at mean
    500× std (this test found it, round 4); the shifted one-pass now in
    unet.py is ≤ 2.5e-4 at the same regime. Exercises the production shape
    [4, 2048, 512] in fp32 AND bf16 inputs at hostile activation statistics
    against an fp64 two-pass reference."""
    import numpy as np
    import jax.numpy as jnp

    from moditalker_tpu.models.mtov.unet import group_norm_32

    rng = np.random.default_rng(0)
    b, l, c, g = 4, 2048, 512, 32
    scale = np.ones((c,), np.float32)
    bias = np.zeros((c,), np.float32)

    for offset, std in [(0.0, 1.0), (10.0, 1.0), (100.0, 1.0),
                        (50.0, 0.1), (-30.0, 5.0)]:
        x64 = rng.normal(loc=offset, scale=std, size=(b, l, c))
        # fp64 two-pass reference per group
        xg = x64.reshape(b, l, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
        ref = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(b, l, c)

        out32 = np.asarray(group_norm_32(
            jnp.asarray(x64, jnp.float32), jnp.asarray(scale),
            jnp.asarray(bias), num_groups=g), np.float64)
        err32 = np.abs(out32 - ref).max()
        assert err32 < 1e-3, (offset, std, err32)

        # bf16 inputs quantize x itself (~0.4% relative, which at mean ≫ std
        # is already a large fraction of a std) — isolate the FORMULA from
        # the encoding by referencing the fp64 two-pass result of the
        # bf16-quantized input
        x_bf = np.asarray(jnp.asarray(x64, jnp.bfloat16).astype(jnp.float64))
        xg_bf = x_bf.reshape(b, l, g, c // g)
        mean_bf = xg_bf.mean(axis=(1, 3), keepdims=True)
        var_bf = ((xg_bf - mean_bf) ** 2).mean(axis=(1, 3), keepdims=True)
        ref_bf = ((xg_bf - mean_bf)
                  / np.sqrt(var_bf + 1e-5)).reshape(b, l, c)
        out_bf = np.asarray(group_norm_32(
            jnp.asarray(x64, jnp.bfloat16), jnp.asarray(scale),
            jnp.asarray(bias), num_groups=g).astype(jnp.float32), np.float64)
        # residual is the bf16 OUTPUT quantization (~0.39% of ±4σ values
        # ≈ 0.016), uniform across all mean/std regimes — the formula
        # itself adds nothing
        err_bf = np.abs(out_bf - ref_bf).max()
        assert err_bf < 0.03, (offset, std, err_bf)
