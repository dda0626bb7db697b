"""Optimizer tests: the AMSGrad/decoupled-WD update must match a numpy
oracle implementing the reference update rule (optimizers.py:8-76), and the
cosine cycle schedule must match LRUpdater (optimizers.py:89-98)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from go_with_the_flows_tpu.optim import (
    adam_amsgrad_decoupled_wd,
    cosine_cycle_schedule,
)


def _numpy_reference_step(p, g, state, lr, b1, b2, eps, wd):
    """One step of the reference Adam (amsgrad=True, decoupled wd)."""
    m, v, vmax, t = state
    t = t + 1
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    vmax = np.maximum(vmax, v)
    bc1 = 1 - b1 ** t
    bc2 = math.sqrt(1 - b2 ** t)
    m_hat = m / bc1
    denom = np.sqrt(vmax) / bc2 + eps
    p_new = p - (wd * p + lr * m_hat / denom)
    return p_new, (m, v, vmax, t)


def test_update_matches_reference_math():
    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype(np.float32)
    lr, b1, b2, eps, wd = 1e-2, 0.9, 0.99, 1e-8, 1e-3

    opt = adam_amsgrad_decoupled_wd(lr=lr, b1=b1, b2=b2, eps=eps,
                                    weight_decay=wd)
    params = {"w": jnp.array(p0)}
    state = opt.init(params)

    p_np = p0.copy()
    np_state = (np.zeros(7), np.zeros(7), np.zeros(7), 0)
    for step in range(5):
        g = rng.randn(7).astype(np.float32)
        deltas, state = opt.update({"w": jnp.array(g)}, state, params)
        params = optax.apply_updates(params, deltas)
        p_np, np_state = _numpy_reference_step(
            p_np, g, np_state, lr, b1, b2, eps, wd
        )
        np.testing.assert_allclose(
            np.asarray(params["w"]), p_np, rtol=1e-5, atol=1e-7,
            err_msg=f"step {step}",
        )


def test_unused_param_is_skipped():
    """torch skips params with grad=None (reference optimizers.py:22-23);
    our analog: an all-zero gradient leaf must not be decayed or stepped."""
    opt = adam_amsgrad_decoupled_wd(lr=1e-2, weight_decay=1e-2)
    params = {"used": jnp.ones(3), "unused": jnp.ones(3) * 5.0}
    state = opt.init(params)
    grads = {"used": jnp.ones(3), "unused": jnp.zeros(3)}
    deltas, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, deltas)
    np.testing.assert_allclose(np.asarray(params["unused"]), 5.0)
    assert float(jnp.abs(params["used"] - 1.0).max()) > 0
    assert int(state.count["unused"]) == 0
    assert int(state.count["used"]) == 1


def test_cosine_cycle_schedule():
    """Matches LRUpdater: s = (epoch % cycle * L + it) / (cycle * L)."""
    L, cycle, lo, hi = 10, 4, 0.1, 0.5
    sched = cosine_cycle_schedule(L, cycle, lo, hi)

    def want(epoch, it):
        s = ((epoch % cycle) * L + it) / (cycle * L)
        return lo + 0.5 * (hi - lo) * (1 + math.cos(math.pi * s))

    for step in [0, 1, 9, 10, 25, 39, 40, 41, 95]:
        epoch, it = divmod(step, L)
        np.testing.assert_allclose(
            float(sched(step)), want(epoch, it), rtol=1e-6,
            err_msg=f"step {step}",
        )
    # start of each cycle is max, end approaches min
    np.testing.assert_allclose(float(sched(0)), hi)
    np.testing.assert_allclose(float(sched(40)), hi)
    assert float(sched(39)) < hi * 0.6 + lo


def test_scheduled_b2_and_lr():
    """Schedules must be evaluated at the pre-increment global step."""
    L = 2
    lr_sched = cosine_cycle_schedule(L, 2, 0.0, 1.0)
    opt = adam_amsgrad_decoupled_wd(lr=lr_sched, b2=0.99)
    params = {"w": jnp.zeros(1)}
    state = opt.init(params)
    # step 0: lr = max -> delta = -lr * ghat/denom = -1.0 (g=1, m_hat/denom ~ 1)
    deltas, state = opt.update({"w": jnp.ones(1)}, state, params)
    got = float(-deltas["w"][0])
    # m_hat/denom at t=1: m=0.1g/0.1=g=1; denom=sqrt(v)/sqrt(1-b2)+eps=1
    np.testing.assert_allclose(got, float(lr_sched(0)), rtol=1e-4)
    assert int(state.step) == 1
