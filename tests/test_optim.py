"""Adan optimizer parity vs the reference torch implementation, and EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moditalker_tpu.core import adan as adan_mod
from moditalker_tpu.core import ema as ema_mod

from . import ref_oracle

needs_ref = pytest.mark.skipif(
    not ref_oracle.has_reference(), reason="reference checkout not available"
)


@needs_ref
def test_adan_matches_reference_trajectory():
    torch = pytest.importorskip("torch")
    ref_adan = ref_oracle.import_atom_module("model.adan")

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    target = rng.normal(size=(5, 3)).astype(np.float32)

    # torch side
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = ref_adan.Adan([tw], lr=4e-4, weight_decay=0.02)
    torch_traj = []
    for _ in range(6):
        opt.zero_grad()
        loss = ((tw - torch.tensor(target)) ** 2).sum()
        loss.backward()
        opt.step()
        torch_traj.append(tw.detach().numpy().copy())

    # jax side
    tx = adan_mod.adan(learning_rate=4e-4, weight_decay=0.02)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["w"] - jnp.asarray(target)) ** 2)

    jax_traj = []
    for _ in range(6):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        jax_traj.append(np.asarray(params["w"]))

    for i, (a, b) in enumerate(zip(jax_traj, torch_traj)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=f"step {i}")


def test_ema_update():
    ema = {"a": jnp.zeros(3)}
    p = {"a": jnp.ones(3)}
    out = ema_mod.ema_update(ema, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, atol=1e-7)


def test_ema_warmup_decay():
    assert float(ema_mod.warmup_decay(0)) == pytest.approx(0.1)
    assert float(ema_mod.warmup_decay(10**6)) == pytest.approx(0.9999)


def test_ema_update_every():
    ema = {"a": jnp.zeros(2)}
    p = {"a": jnp.ones(2)}
    same = ema_mod.ema_update_every(ema, p, 0.5, step=jnp.asarray(3), every=25)
    np.testing.assert_allclose(np.asarray(same["a"]), 0.0)
    moved = ema_mod.ema_update_every(ema, p, 0.5, step=jnp.asarray(25), every=25)
    np.testing.assert_allclose(np.asarray(moved["a"]), 0.5)
