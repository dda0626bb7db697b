"""Flagship training-step time decomposition on the current device.

Splits the train step (reference training.py:30-55 semantics: forward,
loss, backward, optimizer, BN-stat update) into separately jitted
programs to locate the time:

  * fwd        — training-mode forward + loss only (with BN batch stats)
  * grad       — fwd + backward (jax.grad), no optimizer
  * step       — the full make_train_step program (grad + adam + stats)
  * evalfwd    — inference-mode forward + loss (BN running stats)

across matmul precision modes and batch sizes. All timings are
fetch-synced (see bench.py timed(): over the tunneled chip
block_until_ready can resolve early, so we fetch a scalar after the
loop; state is donated/carried so nothing hoists).

Usage: python tools/train_breakdown.py [--b 64 256] [--modes highest high fast]
Prints one JSON line per (mode, B) with ms per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.tpu_drift_audit import FLAGSHIP_CONFIG, N  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[64])
    ap.add_argument("--modes", nargs="+", default=["highest", "high", "fast"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )

    import jax.numpy as jnp

    from go_with_the_flows_tpu.losses import flow_mixture_loss
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_eval_step,
        make_train_step,
    )
    from go_with_the_flows_tpu.utils.config import model_config_kwargs

    def timed(fn, *fetch_from, iters=args.iters):
        out = fn()
        jax.tree.map(
            lambda x: float(np.asarray(x).ravel()[0]),
            fetch_from[0](out) if fetch_from else out,
        )
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.tree.map(
            lambda x: float(np.asarray(x).ravel()[0]),
            fetch_from[0](out) if fetch_from else out,
        )
        return (time.perf_counter() - t0) / iters * 1e3

    for mode in args.modes:
        for B in args.b:
            rng = np.random.RandomState(0)
            batch = {
                "cloud": (rng.randn(B, 3, N) * 0.2).astype(np.float32),
                "eval_cloud": (rng.randn(B, 3, N) * 0.2).astype(
                    np.float32),
            }
            with matmul_precision_scope(mode):
                model = FlowMixtureModel(
                    **model_config_kwargs(FLAGSHIP_CONFIG))
                opt = make_optimizer(
                    epoch_length=10, cycle_length=4, min_lr=1e-4,
                    max_lr=2.56e-4, beta1=0.9, min_beta2=0.99,
                    max_beta2=0.99, wd=1e-6,
                )
                state = create_train_state(
                    model, jax.random.PRNGKey(0), batch, opt)
                step = make_train_step(model, opt)
                eval_step = make_eval_step(model)
                g = jnp.asarray(batch["cloud"])
                p = jnp.asarray(batch["eval_cloud"])
                key = jax.random.PRNGKey(1)

                @jax.jit
                def fwd_loss(st, g, p, k):
                    out, _ = model.apply(
                        {"params": st.params,
                         "batch_stats": st.batch_stats},
                        g, p, rngs={"sample": k}, mode="training",
                        warmup=False, mutable=["batch_stats"],
                    )
                    return flow_mixture_loss(out, 1.0, 1.0, 1.0)[0]

                @jax.jit
                def grad_only(st, g, p, k):
                    def lf(params):
                        out, _ = model.apply(
                            {"params": params,
                             "batch_stats": st.batch_stats},
                            g, p, rngs={"sample": k}, mode="training",
                            warmup=False, mutable=["batch_stats"],
                        )
                        return flow_mixture_loss(out, 1.0, 1.0, 1.0)[0]

                    return jax.grad(lf)(st.params)

                res = {"mode": mode, "B": B}
                res["fwd_ms"] = round(timed(
                    lambda: fwd_loss(state, g, p, key)), 2)
                res["grad_ms"] = round(timed(
                    lambda: grad_only(state, g, p, key),
                    lambda gr: jax.tree.leaves(gr)[0]), 2)
                res["evalfwd_ms"] = round(timed(
                    lambda: eval_step(state, g, p, key),
                    lambda m: m["loss"]), 2)

                def run_step():
                    nonlocal state
                    state, m = step(state, g, p, key, warmup=False)
                    return m

                res["step_ms"] = round(timed(
                    run_step, lambda m: m["loss"]), 2)
                res["clouds_per_sec"] = round(
                    B / (res["step_ms"] / 1e3), 1)
                print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
