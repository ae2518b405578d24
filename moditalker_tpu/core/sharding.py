"""Device mesh and sharding helpers.

Replaces the reference's process-per-GPU DDP stack (``mp.spawn`` +
``init_process_group`` NCCL ``file://`` rendezvous, MToV/exps/diffusion.py:56-71;
HF Accelerate, AToM/AToM.py:42-45) with single-controller SPMD: one
``jax.sharding.Mesh``, batch sharded along the ``data`` axis, gradients
reduced by XLA-inserted collectives over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: int | None = None, axis_names: tuple[str, ...] = (DATA_AXIS,)
) -> Mesh:
    """1-D (default) or n-D mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(axis_names) == 1:
        arr = np.asarray(devices)
    else:
        raise NotImplementedError(
            "multi-axis meshes: reshape devices explicitly at the call site"
        )
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays onto the mesh, batch-sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Multi-host initialisation.

    The TPU-native analogue of the reference's NCCL rendezvous
    (``init_process_group`` with a ``file://`` store,
    MToV/exps/diffusion.py:60-67); with JAX this is a single call and all
    collectives are compiled into the program.

    Two modes:
    - no args: auto-detect (TPU pod metadata / cluster env). Soft — a
      single-process run where auto-detection fails is normal, so errors
      are swallowed and the process continues single-controller.
    - explicit ``coordinator_address``/``num_processes``/``process_id``
      (the CLI ``--coordinator/--num-processes/--process-id`` flags, or a
      2-process CPU cluster in tests): misconfiguration must NOT silently
      degrade to a single-process run training on 1/N of the data, so
      errors propagate.
    """
    # NOTE: do not call jax.process_count()/jax.devices() here — touching
    # the backend before jax.distributed.initialize() locks it to
    # single-process mode and the explicit path would always fail.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialised
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # single-process run (auto-detection found no cluster)


def background_iter(iterator, depth: int = 2):
    """Run a host-side batch iterator in a daemon thread with a bounded
    queue — the JAX analog of the reference's torch DataLoader workers
    (tools/dataloader.py num_workers=4): JPEG decode / rasterization /
    collate for batch k+1 overlap the device step on batch k. Exceptions
    re-raise in the consumer. If the consumer abandons the generator early
    (preemption, max_steps), its close/GC sets a latch the producer polls,
    so the thread exits instead of blocking on a full queue forever."""
    import queue as _q
    import threading

    q: _q.Queue = _q.Queue(maxsize=depth)
    _END = object()
    closed = threading.Event()

    def _put(item) -> bool:
        while not closed.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except _q.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # propagate into the consumer
            _put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        closed.set()  # runs on exhaustion, close(), and GC alike


def device_prefetch(batch_iterator, mesh: Mesh, depth: int = 2):
    """Double-buffered host→device staging: puts the next batch onto the
    mesh while the current step computes. The reference relies on torch
    DataLoader workers + implicit H2D copies; in JAX the put is explicit —
    without prefetch, per-step transfers serialize with compute (measured
    40x slowdown for AToM's 100 MB batches over the dev tunnel)."""
    import collections

    queue = collections.deque()
    for batch in batch_iterator:
        queue.append(shard_batch(batch, mesh))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
