"""Checkpointing via orbax.

TPU-native equivalent of the reference's torch.save payload
{'epoch', 'iter', 'model_state', 'optimizer_state'} (utils.py:25-27) with
the same cadence and best-model logic (training.py:71-100, 169-183):
params + batch_stats + opt_state + step, plus epoch/iter metadata.
Writes happen on process 0 only (the reference's rank-0 gating,
train_ae.py:63).
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


def save_checkpoint(
    logging_path: str,
    model_name: str,
    state: TrainState,
    epoch: int,
    iteration: int,
) -> None:
    if jax.process_index() != 0:
        return
    path = _ckpt_dir(logging_path, model_name)
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "iter": np.asarray(iteration, np.int32),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(
    logging_path: str,
    model_name: str,
    template_state: TrainState,
    restore_optimizer: bool = True,
) -> Tuple[TrainState, int, int]:
    """Restore (state, epoch, iter). With restore_optimizer=False the
    optimizer state keeps its fresh template values (the reference's
    --resume without --resume_optimizer, train_ae.py:144-146)."""
    path = _ckpt_dir(logging_path, model_name)
    template = {
        "state": template_state,
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "iter": np.asarray(0, np.int32),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path, template)
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
    return os.path.isdir(_ckpt_dir(logging_path, model_name))
