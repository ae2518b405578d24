"""Flax HuBERT parity vs a randomly-initialized torch HubertModel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moditalker_tpu.preprocess.hubert import (HubertConfig, HubertEncoder,
                                              convert_hubert)


def _tiny_cfgs():
    import transformers

    tcfg = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8, 8, 8), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True)
    jcfg = HubertConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        conv_dim=(8, 8, 8), conv_stride=(5, 2, 2), conv_kernel=(10, 3, 3),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    return tcfg, jcfg


def test_hubert_parity_tiny():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    tcfg, jcfg = _tiny_cfgs()
    torch.manual_seed(0)
    tmodel = transformers.HubertModel(tcfg).eval()

    wave = np.random.default_rng(0).normal(size=(2, 800)).astype(np.float32)
    with torch.no_grad():
        expected = tmodel(torch.tensor(wave)).last_hidden_state.numpy()

    params = convert_hubert(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}, jcfg)
    model = HubertEncoder(jcfg)
    got = model.apply(params, jnp.asarray(wave))
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3,
                               atol=1e-4)


def test_hubert_framecount_matches_conv_math():
    """The conv stack must reproduce T = (N - 80) // 320 for the large
    config strides (kernel 400 / stride 320 — process_audio.py:24-27)."""
    _, jcfg = _tiny_cfgs()
    # large-config strides on a tiny width
    jcfg2 = HubertConfig(hidden_size=16, num_layers=1, num_heads=2,
                         intermediate_size=32,
                         conv_dim=(4,) * 7, conv_bias=False)
    model = HubertEncoder(jcfg2)
    n = 16000
    wave = jnp.zeros((1, n))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), wave)
    out = model.apply(params, wave)
    assert out.shape[1] == (n - (400 - 320)) // 320
