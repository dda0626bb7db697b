"""Flagship train-step throughput: fused Pallas training decoder vs the
XLA path, on the current device (honest fetch-synced fori_loop timing,
same protocol as bench.py).

Usage: python tools/train_fused_bench.py [--b 64] [--mode highest]
           [--iters 10]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--mode", default="highest")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="xla,fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP, N
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step

    assert jax.default_backend() == "tpu", jax.default_backend()
    B = args.b
    model = FlowMixtureModel(**FLAGSHIP)
    rng = np.random.RandomState(0)
    batch = {
        "cloud": (rng.randn(B, 3, N) * 0.2).astype(np.float32),
        "eval_cloud": (rng.randn(B, 3, N) * 0.2).astype(np.float32),
    }
    n_iters = args.iters

    with matmul_precision_scope(args.mode):
        opt = make_optimizer(
            epoch_length=100, cycle_length=4, min_lr=1e-4, max_lr=2.56e-4,
            beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
        )
        g = jnp.asarray(batch["cloud"])
        p = jnp.asarray(batch["eval_cloud"])

        for variant in args.variants.split(","):
            fused = variant == "fused"
            state = create_train_state(
                model, jax.random.PRNGKey(0), batch, opt
            )
            step = make_train_step(model, opt, fused_decoder=fused)

            @jax.jit
            def run(state, key, g, p):
                def body(i, carry):
                    st, acc = carry
                    st, m = step(st, g, p, jax.random.fold_in(key, i),
                                 warmup=False)
                    return st, acc + m["loss"]

                return jax.lax.fori_loop(
                    0, n_iters, body, (state, jnp.float32(0.0))
                )

            t0 = time.perf_counter()
            st, chk = run(state, jax.random.PRNGKey(2), g, p)
            loss0 = float(chk) / n_iters
            compile_s = time.perf_counter() - t0
            start = time.perf_counter()
            _, chk = run(st, jax.random.PRNGKey(3), g, p)
            loss1 = float(chk) / n_iters
            dt = (time.perf_counter() - start) / n_iters
            print(json.dumps({
                "variant": variant, "mode": args.mode, "b": B,
                "step_ms": round(dt * 1e3, 2),
                "clouds_per_sec": round(B / dt, 1),
                "compile_s": round(compile_s, 1),
                "mean_loss_warm": round(loss1, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
