"""Tensor-parallel primitives over a 2D (data, model) mesh.

The reference has NO tensor parallelism (SURVEY.md §2.6 — its only
model-parallel code is the vendored, unused arcface PartialFC). These
primitives are the optional pjit model-sharding path for scaling the
MToV UNet / TimeSformer beyond one chip's HBM:

  * ``column_parallel_dense`` — weight sharded on the OUTPUT feature axis;
    no collective on the forward (activations end sharded);
  * ``row_parallel_dense``    — weight sharded on the INPUT feature axis;
    forward ends with a ``psum`` over the model axis;
  * ``head_parallel_attention`` — attention heads sharded over the model
    axis (embarrassingly parallel; output re-gathered by layout).

All are ``shard_map``-based so the collectives are explicit and ride the
ICI. Numerics match the unsharded ops exactly (tests/test_parallel.py runs
both on the 8-device virtual mesh).
"""

from __future__ import annotations

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.sharding import DATA_AXIS
from ..ops.attention import sdpa

MODEL_AXIS = "model"


def make_2d_mesh(data: int, model: int, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    assert len(devices) >= data * model, (len(devices), data, model)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def column_parallel_dense(mesh: Mesh):
    """y = x @ W + b with W [I, O] sharded on O. Output stays sharded on
    its feature axis (combine with a row-parallel layer to avoid gathers)."""

    @jax.jit
    def fn(x, w, b):
        def inner(x, w, b):
            return x @ w + b

        return shard_map(
            inner, mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(None, MODEL_AXIS),
                      P(MODEL_AXIS)),
            out_specs=P(DATA_AXIS, MODEL_AXIS),
        )(x, w, b)

    return fn


def row_parallel_dense(mesh: Mesh):
    """y = x @ W + b with W [I, O] sharded on I and x sharded on its
    feature axis; ends with psum over the model axis."""

    @jax.jit
    def fn(x, w, b):
        def inner(x, w, b):
            partial = x @ w
            return jax.lax.psum(partial, MODEL_AXIS) + b

        return shard_map(
            inner, mesh=mesh,
            in_specs=(P(DATA_AXIS, MODEL_AXIS), P(MODEL_AXIS, None),
                      P(None)),
            out_specs=P(DATA_AXIS, None),
        )(x, w, b)

    return fn


def head_parallel_attention(mesh: Mesh, num_heads: int):
    """Multi-head SDPA with heads sharded over the model axis.

    q/k/v: [B, N, H, D] (already projected, head axis explicit).
    Returns [B, N, H, D] with the same sharding.
    """

    @jax.jit
    def fn(q, k, v):
        def inner(q, k, v):
            # local shard: [b_local, N, h_local, D]
            d = q.shape[-1]
            qh = q.transpose(0, 2, 1, 3)
            kh = k.transpose(0, 2, 1, 3)
            vh = v.transpose(0, 2, 1, 3)
            out = sdpa(qh, kh, vh, scale=d**-0.5)
            return out.transpose(0, 2, 1, 3)

        spec = P(DATA_AXIS, None, MODEL_AXIS, None)
        return shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)

    return fn
