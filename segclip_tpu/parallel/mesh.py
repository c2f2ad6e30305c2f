"""Device-mesh construction and sharding helpers.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.5). Here the
equivalent is a 1-D `data` mesh; the train step runs under shard_map with the
batch sharded on `data` and params replicated — gradient psum replaces DDP
hooks, `lax.all_gather` replaces diffdist. The same code scales to multi-host
(ICI within a slice, DCN across) by building the mesh over all processes'
devices; extra axes (e.g. `model` for tensor parallelism at larger widths)
can be added without touching the step function.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_data: int = -1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"need {n_data} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_data]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def prefetch_to_device(iterator, mesh: Mesh, depth: int = 2):
    """Pipeline host→device transfer ahead of consumption: a transfer
    thread shard_batch-es upcoming batches while the consumer runs the
    step, so decode, transfer, and device compute overlap (the classic TPU
    input pipeline; flax.jax_utils.prefetch_to_device equivalent for
    explicit meshes)."""
    import queue
    import threading
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if not put(shard_batch(mesh, batch)):
                    return
        except Exception as e:
            put(e)
        put(None)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()


def shard_batch(mesh: Mesh, batch):
    """Place this host's batch shard onto the mesh, sharded on axis 0.

    Single-process: the array IS the global batch → device_put. Multi-host:
    each process holds its own rows (ShardedEpochSampler hands out disjoint
    shards), so assemble the global array from per-process local data.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        batch)
