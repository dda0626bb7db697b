"""Device mesh + sharding: the TPU-native replacement of the reference's
distributed stack (NCCL process groups + DistributedDataParallel +
DistributedSampler + SyncBatchNorm, reference train_ae.py:68-79,100-103,
151-153 — see SURVEY.md §2.3).

Design: ONE SPMD program over a `jax.sharding.Mesh` with a `data` axis.

  * Gradient all-reduce: implicit — the loss is computed on the global
    (batch-sharded) batch under `jit`, so XLA inserts the reduction over ICI.
  * SyncBatchNorm: free — BatchNorm reduces over the global batch axis
    inside the same jitted program, so its statistics are globally exact
    (stronger than the reference, which syncs via allreduce hooks).
  * DistributedSampler: replaced by per-process host data sharding +
    `jax.make_array_from_process_local_data` in the input pipeline.
  * Multi-host: `jax.distributed.initialize` over DCN; ICI carries the
    collectives inside each slice.

An optional `points` mesh axis shards the point dimension (the analog of
sequence parallelism): decoder flow points are i.i.d. so the pointwise
compute needs no cross-point communication; only the PointNet max-pool and
BN moments reduce across it, which XLA lowers to small collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (the reference's init_process_group
    analog, train_ae.py:72-73). No-op in single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    n_devices: Optional[int] = None,
    points_parallelism: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'points') mesh over the available devices.

    `points_parallelism=1` (default) is pure data parallelism — the only
    strategy the reference implements (SURVEY.md §2.3).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % points_parallelism != 0:
        raise ValueError(
            f"{n_devices} devices not divisible by points={points_parallelism}"
        )
    grid = devices.reshape(n_devices // points_parallelism, points_parallelism)
    return Mesh(grid, axis_names=("data", "points"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0,
                   points_axis: Optional[int] = None) -> NamedSharding:
    """Sharding for a (B, 3, N) cloud batch: batch over 'data', optionally
    points over 'points'."""
    ndim = 3
    spec = [None] * ndim
    spec[batch_axis] = "data"
    if points_axis is not None:
        spec[points_axis] = "points"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh (needed e.g.
    after an orbax restore, which commits arrays to a single device)."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


_uneven_batch_warned = False


def place_batch(mesh: Optional[Mesh], batch, shard_points: bool = False):
    """Place a host batch on the mesh with explicit sharding semantics.

    * batch divisible by the data axis -> batch-sharded global arrays
      (multi-host safe via make_array_from_process_local_data);
    * not divisible, single process -> replicated placement with a loud
      one-time warning (tiny smoke runs only — data parallelism is lost);
    * not divisible, multi process -> error: a global batch cannot even be
      assembled, and silently losing parallelism in a real distributed
      run is the failure mode the reference's DistributedSampler padding
      exists to prevent (train_ae.py:77-78, 100-103).
    """
    import warnings

    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    data_size = mesh.shape.get("data", 1)
    n_proc = jax.process_count()
    local_shards = max(data_size // max(n_proc, 1), 1)
    bsz = next(iter(batch.values())).shape[0]
    if bsz % local_shards == 0:
        return shard_batch(mesh, batch, shard_points=shard_points)
    if n_proc > 1:
        raise ValueError(
            f"per-process batch {bsz} not divisible by the process's "
            f"{local_shards} shards of the 'data' axis (size {data_size}, "
            f"{n_proc} processes) — adjust batch size"
        )
    global _uneven_batch_warned
    if not _uneven_batch_warned:
        _uneven_batch_warned = True
        warnings.warn(
            f"batch size {bsz} not divisible by data-axis size "
            f"{data_size}: placing batches REPLICATED (no data "
            "parallelism). Fine for smoke tests; fix the batch size for "
            "real runs."
        )
    return {k: jnp.asarray(v) for k, v in batch.items()}


def place_batch_uneven(mesh: Optional[Mesh], batch,
                       shard_points: bool = False):
    """Eval-path placement that tolerates an uneven final batch
    (drop_last=False loaders: 'the eval protocol covers the full split').

    Pads the per-process batch by repeating its last row up to the
    process's shard multiple so a global array can always be assembled,
    and returns ``(device_batch, trim)`` where ``trim`` removes exactly
    those pad rows from any gather_global'd / gather_batch'd array
    (every process pads identically — loader shards are equal-length by
    the DistributedSampler wrap — so the gathered layout is R blocks of
    local_padded rows each, real rows first).
    """
    bsz = int(next(iter(batch.values())).shape[0])
    data_size = mesh.shape.get("data", 1) if mesh is not None else 1
    n_proc = jax.process_count()
    local_shards = max(data_size // max(n_proc, 1), 1)
    pad = (-bsz) % local_shards
    if pad:
        batch = {
            k: np.concatenate(
                [np.asarray(v), np.repeat(np.asarray(v)[-1:], pad, axis=0)]
            )
            for k, v in batch.items()
        }
    local_padded = bsz + pad

    def trim(arr):
        arr = np.asarray(arr)
        if pad == 0:
            return arr
        if arr.shape[0] % local_padded != 0:
            raise ValueError(
                f"trim expects gathered PADDED arrays (multiples of "
                f"{local_padded} rows), got {arr.shape[0]} rows — host "
                "batches are unpadded and need no trim"
            )
        n_blocks = arr.shape[0] // local_padded
        arr = arr.reshape((n_blocks, local_padded) + arr.shape[1:])
        return arr[:, :bsz].reshape((n_blocks * bsz,) + arr.shape[2:])

    return place_batch(mesh, batch, shard_points=shard_points), trim


def gather_global(x):
    """Fetch a (possibly multi-host, batch-sharded) array fully to every
    host as numpy — the device->host edge of eval/reconstruct paths.

    Single process: plain device_get. Multi process: concatenate the
    process's addressable shards (contiguous in the global batch for the
    process-major device order of make_mesh) and allgather across
    processes, so every host sees the identical full buffer — the
    reference instead evals only each rank's shard (training.py:103-183).

    Only batch-axis (axis 0) sharding is supported: shards that slice
    any OTHER axis (e.g. a 'points'-sharded array) would be silently
    dropped by the replica dedup below, so they are rejected loudly.
    """
    if jax.process_count() <= 1:
        return np.asarray(x)
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    def _start(s):
        return (s.index[0].start or 0) if s.index else 0

    for s in x.addressable_shards:
        if tuple(s.data.shape[1:]) != tuple(x.shape[1:]):
            raise ValueError(
                "gather_global supports batch-axis sharding only; got a "
                f"shard of shape {s.data.shape} for a global {x.shape}. "
                "Reshard (e.g. drop 'points' sharding) before gathering."
            )
    shards = sorted(x.addressable_shards, key=_start)
    seen = set()
    parts = []
    for s in shards:
        start = _start(s)
        if start in seen:  # replicated over a non-data axis
            continue
        seen.add(start)
        parts.append(np.asarray(s.data))
    local = np.concatenate(parts, axis=0)
    return np.asarray(multihost_utils.process_allgather(local, tiled=True))


def gather_batch(batch):
    """gather_global over a dict of host-local numpy arrays: returns the
    global batch (concatenated over processes) on every host."""
    if jax.process_count() <= 1:
        return {k: np.asarray(v) for k, v in batch.items()}
    from jax.experimental import multihost_utils

    return {
        k: np.asarray(
            multihost_utils.process_allgather(np.asarray(v), tiled=True)
        )
        for k, v in batch.items()
    }


def shard_batch(mesh: Mesh, batch, shard_points: bool = False):
    """Device-put a host batch dict of (B, ...) arrays with the batch axis
    sharded over 'data' (and, optionally, the trailing point axis over
    'points')."""

    def put(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[0] = "data"
        if shard_points and x.ndim == 3:
            spec[2] = "points"
        sharding = NamedSharding(mesh, P(*spec))
        if jax.process_count() > 1:
            # each process holds its shard of the global batch
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
