"""Train state: params + BatchNorm running stats + optimizer state + step.

The reference's checkpoint payload is {'epoch', 'iter', 'model_state',
'optimizer_state'} (utils.py:25-27, training.py:71-81); epoch/iter map to
`step` given the epoch length, model_state to (params, batch_stats), and
optimizer_state to opt_state.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch: dict,
    optimizer: optax.GradientTransformation,
    svr: bool = False,
) -> TrainState:
    """Initialize model variables from one example batch and build state."""
    import jax.numpy as jnp

    init_rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1)}
    # jit the init: eager init dispatches thousands of tiny ops (slow over
    # a TPU tunnel); one compiled program initializes in seconds
    if svr:
        init_fn = jax.jit(
            lambda r, g, p, im: model.init(
                r, g, p, images=im, mode="training"
            )
        )
        variables = init_fn(
            init_rngs,
            jnp.asarray(sample_batch["cloud"]),
            jnp.asarray(sample_batch["eval_cloud"]),
            jnp.asarray(sample_batch["image"]),
        )
    else:
        init_fn = jax.jit(
            lambda r, g, p: model.init(r, g, p, mode="training")
        )
        variables = init_fn(
            init_rngs,
            jnp.asarray(sample_batch["cloud"]),
            jnp.asarray(sample_batch["eval_cloud"]),
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )
