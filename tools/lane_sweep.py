"""Sweep the fused-coupling-kernel lane cap per precision mode on the
current device.

The cap bounds clouds-per-program (tb) in the fused sampling kernel
(ops/pallas/coupling_kernel.py). Wider segments widen the MXU dots but
cost VMEM; with the raised vmem limit the old 16MB-derived caps are no
longer forced, so this measures what actually runs fastest.

Usage: python tools/lane_sweep.py [--modes high,fast,highest]
           [--caps 8192,16384,32768] [--inverse]
Prints one JSON line per (mode, cap): flagship sample-only clouds/sec
(or eval-decode for --inverse) with the honest fetch-synced protocol
from bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="high,fast,highest")
    ap.add_argument("--caps", default="8192,16384,32768")
    ap.add_argument("--inverse", action="store_true")
    ap.add_argument("--b", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP, N
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.ops.pallas import coupling_kernel as ck
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope

    B = args.b
    model = FlowMixtureModel(**FLAGSHIP)
    rng = jax.random.PRNGKey(0)
    g_in = jax.random.normal(rng, (B, 3, N)) * 0.2
    variables = model.init(
        {"params": rng, "sample": rng}, g_in, g_in, mode="training"
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    mode_kw = "autoencoding" if args.inverse else "generating"

    def sample(params, batch_stats, key):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_in, g_in if args.inverse else None,
            mode=mode_kw, n_sampled_points=N,
            rngs={"sample": key},
        )
        return out[1]

    n_iters = 20

    def timed():
        @jax.jit
        def run(params, batch_stats, key):
            def body(i, acc):
                out = sample(params, batch_stats, jax.random.fold_in(key, i))
                return acc + jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        float(run(params, batch_stats, jax.random.PRNGKey(2)))
        start = time.perf_counter()
        float(run(params, batch_stats, jax.random.PRNGKey(3)))
        return B * n_iters / (time.perf_counter() - start)

    orig = ck._lane_cap
    for mode in args.modes.split(","):
        for cap in (int(c) for c in args.caps.split(",")):
            ck._lane_cap = lambda m, inv, _c=cap: _c
            jax.clear_caches()
            try:
                with matmul_precision_scope(mode):
                    rate = timed()
                print(json.dumps({
                    "mode": mode, "cap": cap, "inverse": args.inverse,
                    "clouds_per_sec": round(rate, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "mode": mode, "cap": cap, "inverse": args.inverse,
                    "error": str(e).split("\n")[0][:160],
                }), flush=True)
    ck._lane_cap = orig


if __name__ == "__main__":
    main()
