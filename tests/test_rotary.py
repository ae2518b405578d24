"""Rotary embedding parity vs the reference torch implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from moditalker_tpu.ops import rotary

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


@needs_ref
def test_full_dim_rotary_matches_lucidrains():
    torch = pytest.importorskip("torch")
    ref = ref_oracle.import_atom_module("model.rotary_embedding_torch")
    dim, n = 64, 12
    emb = ref.RotaryEmbedding(dim=dim)
    x = torch.randn(2, n, dim)
    expected = emb.rotate_queries_or_keys(x).numpy()

    freqs = rotary.rotary_full_dim_freqs(n, dim)
    got = rotary.apply_rotary_full_dim(jnp.asarray(x.numpy()), jnp.asarray(freqs))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


@needs_ref
def test_time_rotary_matches_timesformer():
    torch = pytest.importorskip("torch")
    vm = ref_oracle.import_mtov_module("models.autoencoder.vit_modules")
    dim_head, f = 64, 16
    remb = vm.RotaryEmbedding(dim_head)
    sin_t, cos_t = remb(f, device=torch.device("cpu"))

    sin, cos = rotary.time_rotary_sincos(f, dim_head)
    np.testing.assert_allclose(sin, sin_t.numpy()[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cos, cos_t.numpy()[0], rtol=1e-5, atol=1e-6)

    q = torch.randn(3, f, dim_head)
    k = torch.randn(3, f, dim_head)
    eq, ek = vm.apply_rot_emb(q, k, (sin_t, cos_t))
    gq, gk = rotary.apply_rot_emb(
        jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
        jnp.asarray(sin), jnp.asarray(cos),
    )
    np.testing.assert_allclose(np.asarray(gq), eq.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), ek.numpy(), rtol=1e-5, atol=1e-5)


@needs_ref
def test_axial_rotary_matches_timesformer():
    torch = pytest.importorskip("torch")
    vm = ref_oracle.import_mtov_module("models.autoencoder.vit_modules")
    dim_head, h, w = 64, 8, 8
    aemb = vm.AxialRotaryEmbedding(dim_head)
    sin_t, cos_t = aemb(h, w, device=torch.device("cpu"))

    sin, cos = rotary.axial_rotary_sincos(h, w, dim_head)
    # torch computes its scale table in float32, ours is float64 — 1e-5 slack
    np.testing.assert_allclose(sin, sin_t.numpy()[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cos, cos_t.numpy()[0], rtol=1e-4, atol=1e-5)
