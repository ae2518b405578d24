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


def test_masked_padded_forward_matches_unpadded():
    """Zero-padding the wave to a static bucket + the frame mask reproduces
    the unpadded forward exactly on the valid frames (the serving path:
    one compiled program per bucket instead of one per utterance length)."""
    _, jcfg = _tiny_cfgs()
    model = HubertEncoder(jcfg)
    rng = np.random.default_rng(0)
    n = 437
    wave = rng.normal(size=(1, n)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(wave))

    from moditalker_tpu.preprocess.audio import conv_out_frames

    t_true = conv_out_frames(n, jcfg)
    plain = np.asarray(model.apply(params, jnp.asarray(wave)))
    assert plain.shape[1] == t_true

    padded = np.pad(wave, ((0, 0), (0, 600 - n)))
    masked = np.asarray(model.apply(
        params, jnp.asarray(padded),
        n_frames=jnp.array([t_true], np.int32)))
    np.testing.assert_allclose(masked[:, :t_true], plain,
                               rtol=2e-5, atol=2e-5)


def test_flax_hubert_forward_bucketing_matches_plain():
    """The bucketed serving model_fn produces the same features as the
    per-length jit through the full reference chunking pipeline."""
    from moditalker_tpu.preprocess import audio

    # tiny model with hubert-large FRAME ARITHMETIC (total stride 320,
    # footprint ≤ 400) so extract_hubert_features' expected_T holds
    jcfg = HubertConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        conv_dim=(8, 8, 8), conv_stride=(5, 8, 8), conv_kernel=(10, 3, 3),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    model = HubertEncoder(jcfg)
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(1, 3000)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(wave))

    bucketed = audio.flax_hubert_forward(params, jcfg, bucket_samples=4000)

    def plain(w):
        return np.asarray(model.apply(params, jnp.asarray(w)))[0]

    speech = rng.normal(size=(10700,)).astype(np.float32)
    got = audio.extract_hubert_features(speech, bucketed)
    want = audio.extract_hubert_features(speech, plain)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
