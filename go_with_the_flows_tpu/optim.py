"""Optimizer: AMSGrad Adam with decoupled weight decay + cosine-cycled
learning rate AND beta2.

Exact-math re-implementation of the reference's custom optimizer
(`lib/networks/optimizers.py`):

  * Adam with amsgrad and AdamW-style decoupled weight decay applied inside
    the update, NOT scaled by lr (optimizers.py:69-72:
    p <- p - (wd * p + lr * m_hat / denom_hat)).
  * Bias corrections: m_hat = m / (1 - b1^t); denom_hat =
    sqrt(max_v) / sqrt(1 - b2^t) + eps (optimizers.py:63-67).
  * LRUpdater (optimizers.py:79-98): cosine cycle over `cycle_length`
    epochs modulating BOTH lr and beta2 between (min, max), re-evaluated
    every step.

Parity details:
  * torch skips params whose .grad is None — in the reference that happens
    for the globally-unused parameter sets (global mixture logits under
    learned_weights after warmup, and vice versa; DDP uses
    find_unused_parameters=True, train_ae.py:153). JAX instead produces
    exact-zero gradients for unused params. We replicate torch by gating
    each leaf's update (including its moment/step state) on
    `any(grad != 0)`, so unused params are neither decayed nor stepped.
  * Like torch, the per-parameter step count `t` used in bias correction
    only advances on steps where the param received a gradient.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


def cosine_cycle_schedule(
    epoch_length: int,
    cycle_length: int,
    min_value: float,
    max_value: float,
) -> Callable[[jax.Array], jax.Array]:
    """Reference LRUpdater.__call__ (optimizers.py:89-98) as a pure
    function of the global step: rel_epoch = epoch % cycle_length;
    s = (rel_epoch * epoch_length + iter) / (cycle_length * epoch_length);
    v = min + 0.5 * (max - min) * (1 + cos(pi * s))."""

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // epoch_length
        iteration = step % epoch_length
        rel_epoch = epoch % cycle_length
        s = (rel_epoch * epoch_length + iteration) / (
            cycle_length * epoch_length
        )
        return min_value + 0.5 * (max_value - min_value) * (
            1.0 + jnp.cos(jnp.pi * s)
        )

    return schedule


class AmsgradWDState(NamedTuple):
    step: jax.Array  # global step (drives the schedules)
    count: chex.ArrayTree  # per-leaf step count (drives bias correction)
    mu: chex.ArrayTree
    nu: chex.ArrayTree
    nu_max: chex.ArrayTree


def adam_amsgrad_decoupled_wd(
    lr: float | Callable,
    b1: float = 0.9,
    b2: float | Callable = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """The reference's Adam (optimizers.py:8-76) as an optax transform.

    `lr` and `b2` may be schedules (functions of the global step); the
    schedule is evaluated with the pre-increment step, matching the
    reference's scheduler call before optimizer.step (training.py:34).
    Returns parameter DELTAS (apply with optax.apply_updates).
    """
    lr_fn = lr if callable(lr) else (lambda _: jnp.asarray(lr))
    b2_fn = b2 if callable(b2) else (lambda _: jnp.asarray(b2))

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        counts = jax.tree.map(
            lambda p: jnp.zeros((), jnp.int32), params
        )
        return AmsgradWDState(
            step=jnp.zeros((), jnp.int32),
            count=counts,
            mu=zeros(),
            nu=zeros(),
            nu_max=zeros(),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adam_amsgrad_decoupled_wd requires params")
        cur_lr = lr_fn(state.step)
        cur_b2 = b2_fn(state.step)

        def leaf(g, c, m, v, vmax, p):
            used = jnp.any(g != 0)
            c1 = jnp.where(used, c + 1, c)
            m1 = jnp.where(used, b1 * m + (1.0 - b1) * g, m)
            v1 = jnp.where(used, cur_b2 * v + (1.0 - cur_b2) * g * g, v)
            vmax1 = jnp.maximum(vmax, v1)
            t = jnp.maximum(c1, 1).astype(g.dtype)
            bc1 = 1.0 - b1 ** t
            bc2 = jnp.sqrt(1.0 - cur_b2 ** t)
            m_hat = m1 / bc1
            denom = jnp.sqrt(vmax1) / bc2 + eps
            delta = -(weight_decay * p + cur_lr * m_hat / denom)
            delta = jnp.where(used, delta, jnp.zeros_like(delta))
            return delta, c1, m1, v1, vmax1

        flat_g, treedef = jax.tree.flatten(grads)
        flat_c = treedef.flatten_up_to(state.count)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_vm = treedef.flatten_up_to(state.nu_max)
        flat_p = treedef.flatten_up_to(params)

        results = [
            leaf(g, c, m, v, vm, p)
            for g, c, m, v, vm, p in zip(
                flat_g, flat_c, flat_m, flat_v, flat_vm, flat_p
            )
        ]
        deltas = treedef.unflatten([r[0] for r in results])
        new_state = AmsgradWDState(
            step=state.step + 1,
            count=treedef.unflatten([r[1] for r in results]),
            mu=treedef.unflatten([r[2] for r in results]),
            nu=treedef.unflatten([r[3] for r in results]),
            nu_max=treedef.unflatten([r[4] for r in results]),
        )
        return deltas, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    epoch_length: int,
    cycle_length: int,
    min_lr: float,
    max_lr: float,
    beta1: float,
    min_beta2: float,
    max_beta2: float,
    wd: float,
    eps: float = 1e-8,
    **_unused,
) -> optax.GradientTransformation:
    """Build the training optimizer from reference config keys
    (train_ae.py:133-135: Adam(lr=max_lr, wd, betas=(beta1, max_beta2),
    amsgrad=True) + LRUpdater(epoch_length, **config))."""
    return adam_amsgrad_decoupled_wd(
        lr=cosine_cycle_schedule(epoch_length, cycle_length, min_lr, max_lr),
        b1=beta1,
        b2=cosine_cycle_schedule(
            epoch_length, cycle_length, min_beta2, max_beta2
        ),
        eps=eps,
        weight_decay=wd,
    )
