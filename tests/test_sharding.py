"""Multi-device mesh smoke tests on the forced 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from moditalker_tpu.core import sharding


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    mesh = sharding.make_mesh()
    batch = {"x": np.ones((16, 4), np.float32)}
    sharded = sharding.shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == P("data")

    @jax.jit
    def mean_all(b):
        return jnp.mean(b["x"])

    assert float(mean_all(sharded)) == 1.0


def test_grad_psum_equivalence():
    """Jitted data-parallel grad over a sharded batch equals single-device."""
    mesh = sharding.make_mesh()
    w = jnp.ones((4, 4))
    x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_single), rtol=1e-5, atol=1e-6
    )


def test_device_prefetch_yields_all():
    mesh = sharding.make_mesh()
    batches = [{"x": np.full((8, 2), float(i), np.float32)}
               for i in range(5)]
    out = list(sharding.device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(jnp.mean(b["x"])) == float(i)
        assert b["x"].sharding.spec == P("data")


def test_background_iter_order_exceptions_and_early_exit():
    from moditalker_tpu.core.sharding import background_iter

    # order-preserving
    assert list(background_iter(iter(range(20)), depth=3)) == list(range(20))

    # exceptions propagate to the consumer
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = background_iter(boom())
    assert next(it) == 1
    import pytest

    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)

    # early consumer exit releases the producer thread (close latch)
    import threading

    n_before = threading.active_count()
    g = background_iter(iter(range(10**6)), depth=2)
    next(g)
    g.close()
    import time

    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before
