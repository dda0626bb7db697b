"""Checkpointing via orbax.

TPU-native equivalent of the reference's torch.save payload
{'epoch', 'iter', 'model_state', 'optimizer_state'} (utils.py:25-27) with
the same cadence and best-model logic (training.py:71-100, 169-183):
params + batch_stats + opt_state + step, plus epoch/iter metadata.

Multi-process semantics (the reference's rank-0 torch.save under DDP,
train_ae.py:63 + utils.py:25-27): EVERY process must call save/restore at
the same program points. State is first fetched to host numpy on every
process — a local read for fully-addressable or fully-replicated leaves
(the data-parallel case: free), a `process_allgather` collective only for
leaves actually sharded across processes — then process 0 alone writes the
checkpoint and all processes meet at a barrier. Restore is rank-0 read +
`broadcast_one_to_all`, so neither path requires a shared filesystem
(matching torch.load + DDP broadcast). A naive "return early on non-zero
ranks" around orbax deadlocks instead: with global (non-addressable)
arrays orbax's save is itself a collective.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _ckpt_dir(logging_path: str, model_name: str) -> str:
    # reference saves <logging_path>/<model_name>.pkl; we use a directory
    name = model_name.replace(".pkl", ".ckpt")
    return os.path.abspath(os.path.join(logging_path, name))


def _rank0_checkpointer() -> ocp.Checkpointer:
    """A synchronous checkpointer whose internal barriers involve ONLY
    process 0 — in multi-process runs the payload is already host numpy
    on process 0 and the other processes never enter orbax, so orbax's
    own global sync (e.g. '_Checkpointer:save_start') must not wait on
    them."""
    kwargs = {}
    if jax.process_count() > 1:
        kwargs["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0}
        )
    return ocp.Checkpointer(ocp.StandardCheckpointHandler(), **kwargs)


def _to_host(tree):
    """Fetch a state pytree fully to host numpy on every process.

    Fully-addressable (single-process) and fully-replicated (data-parallel
    multi-host) leaves are read from local shards — no communication.
    Leaves sharded ACROSS processes are allgathered (a collective: every
    process must reach this call, in the same tree order — guaranteed by
    all processes calling save_checkpoint at the same program point).
    """
    from jax.experimental import multihost_utils

    def fetch(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_addressable:
            return np.asarray(x)
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        return np.asarray(multihost_utils.process_allgather(x))

    return jax.tree.map(fetch, tree)


def save_checkpoint(
    logging_path: str,
    model_name: str,
    state: TrainState,
    epoch: int,
    iteration: int,
) -> None:
    """Collective in multi-process runs: every process must call this (the
    gather of sharded leaves and the trailing barrier are collectives).
    Only process 0 touches the filesystem."""
    path = _ckpt_dir(logging_path, model_name)
    multi = jax.process_count() > 1
    if multi:
        state = _to_host(state)
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "iter": np.asarray(iteration, np.int32),
        },
    }
    if jax.process_index() == 0:
        _rank0_checkpointer().save(path, payload, force=True)
    if multi:
        from jax.experimental import multihost_utils

        # no process may proceed (e.g. into a restore, or exit) before the
        # write is durable on process 0
        multihost_utils.sync_global_devices(f"ckpt_saved:{path}")


def _host_template(tree):
    """Numpy zeros with the shapes/dtypes of a state pytree (shards may
    live on devices of other processes; only shape/dtype are read)."""

    def zero(x):
        return np.zeros(np.shape(x), np.dtype(getattr(x, "dtype", None)
                                              or np.asarray(x).dtype))

    return jax.tree.map(zero, tree)


def restore_checkpoint(
    logging_path: str,
    model_name: str,
    template_state: TrainState,
    restore_optimizer: bool = True,
) -> Tuple[TrainState, int, int]:
    """Restore (state, epoch, iter). With restore_optimizer=False the
    optimizer state keeps its fresh template values (the reference's
    --resume without --resume_optimizer, train_ae.py:144-146).

    Collective in multi-process runs (rank-0 read + broadcast): every
    process must call it. Returned leaves are host values; callers
    re-place them on the mesh (parallel.mesh.replicate) as train_ae.py
    does."""
    path = _ckpt_dir(logging_path, model_name)
    template = {
        "state": template_state,
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "iter": np.asarray(0, np.int32),
        },
    }
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_template = _host_template(template)
        err = None
        payload = host_template
        if jax.process_index() == 0:
            try:
                payload = _rank0_checkpointer().restore(path,
                                                        host_template)
                payload = jax.tree.map(np.asarray, payload)
            except Exception as e:  # noqa: BLE001 — re-raised below
                err = e
        # a rank-0 failure must fail EVERY rank loudly — raising on
        # rank 0 alone would leave the others hanging in the broadcast
        ok = multihost_utils.broadcast_one_to_all(
            np.asarray(0 if err is not None else 1, np.int32)
        )
        if int(ok) == 0:
            if err is not None:
                raise err
            raise FileNotFoundError(
                f"rank 0 failed to restore checkpoint {path}"
            )
        payload = multihost_utils.broadcast_one_to_all(payload)
    else:
        payload = _rank0_checkpointer().restore(path, template)
    state = payload["state"]
    if not restore_optimizer:
        state = TrainState(
            step=state.step,
            params=state.params,
            batch_stats=state.batch_stats,
            opt_state=template_state.opt_state,
        )
    return state, int(payload["meta"]["epoch"]), int(payload["meta"]["iter"])


def checkpoint_exists(logging_path: str, model_name: str) -> bool:
    """Process-uniform existence check: on multi-process runs the answer
    is process 0's (the writer's — other hosts may not share its
    filesystem), broadcast so resume control flow cannot diverge. A
    collective in multi-process runs: every process must call it."""
    exists = os.path.isdir(_ckpt_dir(logging_path, model_name))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        exists = bool(
            multihost_utils.broadcast_one_to_all(np.asarray(exists))
        )
    return exists
