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


def warmup_collectives(mesh: Mesh) -> None:
    """Establish the cross-process communicators with one tiny all-reduce
    over every device of `mesh` — run this while all hosts are still in
    LOCKSTEP (right after bring-up, before decode workers / eval / any
    rank-skewed host work).

    Why: communicator (gloo context) creation runs a key-value rendezvous
    with a hard-coded 30 s deadline (gloo::rendezvous::Store::
    kDefaultTimeout, compiled into jaxlib — not configurable from Python),
    so if one rank reaches the run's FIRST collective >30 s after another
    (slow decode-worker spawn, a long compile, rank-0 eval), the whole job
    dies with "Gloo context initialization failed: DEADLINE_EXCEEDED".
    Once the context exists, collectives WAIT instead: a measured 60 s
    rank skew on an established context completed fine on the same gloo
    backend. TPU pods don't use gloo, but the call is harmless there (one
    scalar psum) and keeps one code path. See docs/PERF.md "Multi-host
    timeouts"."""
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp
    sharding = NamedSharding(mesh, P(mesh.axis_names))
    n = int(mesh.devices.size)
    arr = jax.make_array_from_callback(
        (n,), sharding, lambda idx: np.ones((1,), np.float32))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    got = float(total)                       # host fetch forces execution
    if got != n:
        raise RuntimeError(
            f"collective warmup over {n} devices summed to {got}")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def prefetch_to_device(iterator, mesh: Mesh, depth: int = 2,
                       pack_spec: "PackedSpec | None" = None):
    """Pipeline host→device transfer ahead of consumption: a transfer
    thread shard_batch-es upcoming batches while the consumer runs the
    step, so decode, transfer, and device compute overlap (the classic TPU
    input pipeline; flax.jax_utils.prefetch_to_device equivalent for
    explicit meshes). With `pack_spec`, each batch is packed into ONE
    (B, row_bytes) uint8 buffer before transfer (see PackedSpec) and the
    step unpacks it on device."""
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
        # Reuse a small ring of pack buffers instead of a fresh ≥8 MB
        # allocation per batch (glibc mmaps/munmaps those, so every pack
        # would pay first-touch page faults — measured 3× the memcpy cost
        # on the bench host). Ring size bounds in-flight batches: `depth`
        # queued + 1 in device_put + 1 margin. Only safe off-CPU, where
        # device_put always copies (the CPU backend may alias host memory).
        ring: list = []
        ring_n = depth + 2
        reuse = (jax.default_backend() != "cpu"
                 and not globals().get("_DISABLE_PACK_RING", False))
        n = 0
        try:
            for batch in iterator:
                if pack_spec is not None:
                    out = None
                    if reuse:
                        b = next(iter(batch.values())).shape[0]
                        shape = (b, pack_spec.row_bytes)
                        if len(ring) < ring_n:
                            ring.append(np.empty(shape, np.uint8))
                        out = ring[n % ring_n]
                        n += 1
                        if out.shape != shape:
                            out = None
                    batch = pack_spec.pack(batch, out=out)
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


class PackedSpec:
    """Layout of a batch packed into ONE (B, row_bytes) uint8 buffer.

    The tunneled host→device link pays a large per-array cost (measured
    ~50 ms/array on top of ~37 MB/s wire rate — docs/PERF.md "Host→device
    transfer"); packing the 4-6 batch arrays into a single buffer cut a
    14.6 MB batch transfer from 722 to 405 ms. Packing is bit-exact
    (bitcast round-trip) and sharding-compatible: the buffer is
    batch-major, so P('data') sharding on axis 0 is unchanged.

    Multi-byte fields come first so every field's byte offset stays
    aligned to its itemsize (bitcast_convert_type requires it
    implicitly; uint8 fields go last).
    """

    def __init__(self, fields, row_bytes: int):
        self.fields = fields          # (name, dtype_str, shape, off, nbytes)
        self.row_bytes = row_bytes

    @classmethod
    def from_batch(cls, batch) -> "PackedSpec":
        items = sorted(batch.items(),
                       key=lambda kv: (np.dtype(kv[1].dtype).itemsize == 1,
                                       kv[0]))
        fields, off = [], 0
        for k, v in items:
            itemsize = np.dtype(v.dtype).itemsize
            assert off % itemsize == 0, (k, off, itemsize)
            n = int(np.prod(v.shape[1:], dtype=np.int64)) * itemsize
            fields.append((k, str(np.dtype(v.dtype)), tuple(v.shape[1:]),
                           off, n))
            off += n
        return cls(tuple(fields), off)

    def pack(self, batch, out: "np.ndarray | None" = None) -> np.ndarray:
        """Pack into `out` when given (shape (B, row_bytes) uint8).

        Reusing one buffer across batches matters on glibc hosts: a fresh
        ≳8 MB allocation per batch goes through mmap/munmap, so every pack
        pays first-touch page faults (~100-200 ms for a 14.6 MB ViT-B/16
        batch on the bench host — measured 3× the whole memcpy)."""
        b = next(iter(batch.values())).shape[0]
        if out is None:
            out = np.empty((b, self.row_bytes), np.uint8)
        else:
            assert out.shape == (b, self.row_bytes) and out.dtype == np.uint8
        for k, _, _, off, n in self.fields:
            arr = np.ascontiguousarray(batch[k])
            out[:, off:off + n] = arr.reshape(b, -1).view(np.uint8)
        return out

    def unpack(self, buf: jax.Array) -> dict:
        """jit-side: slices + bitcasts, no data movement beyond XLA's."""
        import jax.numpy as jnp
        out = {}
        b = buf.shape[0]
        for k, dt, shp, off, n in self.fields:
            raw = buf[:, off:off + n]
            dtype = jnp.dtype(dt)
            if dtype.itemsize > 1:
                raw = jax.lax.bitcast_convert_type(
                    raw.reshape(b, n // dtype.itemsize, dtype.itemsize),
                    dtype)
            else:
                raw = raw.astype(dtype) if dtype != jnp.uint8 else raw
            out[k] = raw.reshape((b,) + shp)
        return out


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
