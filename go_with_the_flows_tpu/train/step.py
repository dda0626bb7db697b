"""Jitted train / eval steps.

One fused XLA program per step: forward (training path), loss, backward,
optimizer update, BN running-stat update. Under a sharded batch this is the
complete data-parallel step — gradient reduction is XLA-inserted
(the reference needs DDP hooks + SyncBN for the same semantics,
train_ae.py:151-153).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import flow_mixture_loss
from .state import TrainState


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
    svr: bool = False,
) -> Callable:
    """Build the jitted training step.

    step(state, g_clouds, p_clouds, rng, [images,] warmup) ->
        (new_state, metrics dict of scalars)

    The per-step RNG is folded with the step counter so resume reproduces
    the same sample stream.
    """

    @functools.partial(
        jax.jit, static_argnames=("warmup",), donate_argnums=(0,)
    )
    def train_step(state: TrainState, g_clouds, p_clouds, rng,
                   images=None, warmup: bool = False):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            kwargs = dict(mode="training", warmup=warmup)
            if svr:
                out, mutated = model.apply(
                    variables, g_clouds, p_clouds, images=images,
                    rngs={"sample": step_rng}, mutable=["batch_stats"],
                    **kwargs,
                )
            else:
                out, mutated = model.apply(
                    variables, g_clouds, p_clouds,
                    rngs={"sample": step_rng}, mutable=["batch_stats"],
                    **kwargs,
                )
            loss, metrics = flow_mixture_loss(
                out, pnll_weight, gnll_weight, gent_weight
            )
            return loss, (mutated["batch_stats"], metrics)

        grads, (batch_stats, metrics) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        deltas, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, deltas)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
    svr: bool = False,
) -> Callable:
    """Validation loss step: the training forward path with BatchNorm in
    inference mode — exactly the reference's eval() semantics
    (model.eval() but util_mode still 'training', training.py:110-118).
    """

    @functools.partial(jax.jit, static_argnames=("warmup",))
    def eval_step(state: TrainState, g_clouds, p_clouds, rng,
                  images=None, warmup: bool = False):
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        kwargs = dict(mode="training", train=False, warmup=warmup)
        if svr:
            out = model.apply(
                variables, g_clouds, p_clouds, images=images,
                rngs={"sample": rng}, **kwargs,
            )
        else:
            out = model.apply(
                variables, g_clouds, p_clouds,
                rngs={"sample": rng}, **kwargs,
            )
        _, metrics = flow_mixture_loss(
            out, pnll_weight, gnll_weight, gent_weight
        )
        return metrics

    return eval_step


def make_sample_step(model, n_sampled_points: int, mode: str = "generating",
                     svr: bool = False) -> Callable:
    """Jitted labeled sampling step for evaluation / reconstruction.
    Returns (samples (B,3,N), labels (B,N), logits (B,K))."""

    @jax.jit
    def sample_step(state: TrainState, g_clouds, rng, images=None):
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        kwargs = dict(mode=mode, n_sampled_points=n_sampled_points)
        if svr:
            _, samples, labels, logits = model.apply(
                variables, g_clouds, images=images,
                rngs={"sample": rng}, **kwargs,
            )
        else:
            _, samples, labels, logits = model.apply(
                variables, g_clouds,
                rngs={"sample": rng}, **kwargs,
            )
        return samples, labels, logits

    return sample_step
