"""Generative-eval precision A/B at flagship scale: does bf16 ('fast')
sampling change the reported protocol numbers?

Round 2 measured an identical protocol table for 'fast' vs 'highest' on
a small (K=2, 256-pt) model; the eval default was still promoted only to
'high' (3-pass bf16-split). This tool re-runs the question at FLAGSHIP
scale (K=4, 2048-pt clouds, reduced 21-flow decoders) with the full
metric set (MMD/COV/1-NNA over CD and EMD, plus JSD), paired seeds:

  1. train the flagship model for --steps steps on synthetic mixture
     clouds at the TRAINING default precision ('high');
  2. per precision mode (highest / high / fast): sample S labeled clouds
     per rep with the SAME rng keys, evaluate against a shared reference
     set — the metric kernels pin HIGHEST internally in all modes, so
     the only difference is the model's sampling matmuls;
  3. print per-mode metric tables + max per-point sample drift vs
     'highest'.

Usage: python tools/eval_precision_ab.py [--steps 400] [--s 128]
       [--reps 3]
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
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--s", type=int, default=128,
                    help="sample / reference set size per rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--modes", default="highest,high,fast")
    ap.add_argument("--state_cache", default="/tmp/eval_ab_state.pkl",
                    help="pickle of the trained (params, batch_stats); "
                         "reused if present so metric-side reruns skip "
                         "the training phase")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP, N
    from go_with_the_flows_tpu.metrics.evaluation import (
        compute_all_metrics,
        jsd_between_point_cloud_sets,
    )
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_sample_step,
        make_train_step,
    )

    B = args.b
    model = FlowMixtureModel(**FLAGSHIP)
    rng = np.random.RandomState(0)
    centers = np.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0],
                        [0.0, 0.6, 0.0], [0.0, 0.0, -0.6]])

    def make_clouds(n_clouds, rstate):
        which = rstate.randint(0, len(centers), size=(n_clouds, N))
        scale = 0.1 + 0.1 * rstate.rand(n_clouds, 1, 1)
        pts = centers[which] + rstate.randn(n_clouds, N, 3) * scale
        return pts.transpose(0, 2, 1).astype(np.float32)

    # ---- train once at the training default ('high') ----
    import pickle

    opt = make_optimizer(
        epoch_length=args.steps, cycle_length=4, min_lr=2e-4,
        max_lr=5e-4, beta1=0.9, min_beta2=0.99, max_beta2=0.99,
        wd=1e-6,
    )
    first = make_clouds(B, rng)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        {"cloud": first, "eval_cloud": first}, opt,
    )
    if args.state_cache and os.path.exists(args.state_cache):
        with open(args.state_cache, "rb") as fh:
            params, batch_stats = pickle.load(fh)
        state = state.replace(params=params, batch_stats=batch_stats)
        print(f"# loaded trained state from {args.state_cache}")
    else:
        with matmul_precision_scope("high"):
            step = make_train_step(model, opt)
            t0 = time.perf_counter()
            for i in range(args.steps):
                c = jnp.asarray(make_clouds(B, rng))
                state, m = step(state, c, c, jax.random.PRNGKey(1),
                                warmup=i < 10)
                if (i + 1) % 100 == 0:
                    print(f"# step {i + 1}: loss {float(m['loss']):.2f}",
                          flush=True)
            print(f"# trained {args.steps} steps in "
                  f"{time.perf_counter() - t0:.1f}s")
        if args.state_cache:
            payload = jax.tree.map(
                np.asarray, (state.params, state.batch_stats)
            )
            with open(args.state_cache, "wb") as fh:
                pickle.dump(payload, fh)

    ref = make_clouds(args.s, np.random.RandomState(123))
    ref_nc3 = np.ascontiguousarray(ref.transpose(0, 2, 1))  # (S, N, 3)
    g_in = jnp.asarray(make_clouds(args.s, np.random.RandomState(7)))

    results = {}
    baseline_samples = {}
    for mode in args.modes.split(","):
        with matmul_precision_scope(mode):
            sample_step = make_sample_step(model, N)
            per_rep = []
            for rep in range(args.reps):
                key = jax.random.PRNGKey(1000 + rep)  # PAIRED across modes
                samples, labels, _ = sample_step(state, g_in, key)
                s_nc3 = np.asarray(
                    jnp.transpose(samples, (0, 2, 1)), np.float32
                )
                if mode == args.modes.split(",")[0]:
                    baseline_samples[rep] = s_nc3
                drift = float(np.max(np.abs(
                    s_nc3 - baseline_samples[rep]
                )))
                res = compute_all_metrics(
                    s_nc3, ref_nc3, batch_size=min(args.s, 64),
                    cd_option=True, emd_option=True,
                )
                res = {k: float(v) for k, v in res.items()
                       if np.size(v) == 1}
                res["JSD"] = float(
                    jsd_between_point_cloud_sets(s_nc3, ref_nc3)
                )
                res["max_point_drift_vs_first_mode"] = drift
                per_rep.append(res)
            agg = {
                k: (float(np.mean([r[k] for r in per_rep])),
                    float(np.std([r[k] for r in per_rep])))
                for k in per_rep[0]
            }
            # ---- autoencoding: PAIRED reconstruction metrics ----
            # the generative metrics above are distributional (immune to
            # per-point drift); the AE/SVR protocol pairs reconstruction
            # i with gt i (reference evaluating.py:167-189) — check the
            # paired CD/EMD/F1 table under the same mode
            from go_with_the_flows_tpu.metrics.evaluation import (
                EMD_CD_F1,
            )

            ae_step = make_sample_step(model, N, mode="autoencoding")
            recon, _, _ = ae_step(state, g_in, jax.random.PRNGKey(7))
            r_nc3 = np.asarray(
                jnp.transpose(recon, (0, 2, 1)), np.float32
            )
            ae = EMD_CD_F1(
                r_nc3, np.asarray(g_in.transpose(0, 2, 1), np.float32),
                batch_size=min(args.s, 64), cd_option=True,
                emd_option=True, f1_option=True, f1_threshold=1e-4,
            )
            agg["AE-CD_x1e4"] = (float(ae["CD"]) * 1e4, 0.0)
            agg["AE-EMD_x1e2"] = (float(ae["EMD"]) * 1e2, 0.0)
            agg["AE-F1"] = (float(ae["F1"]), 0.0)

            results[mode] = agg
            print(f"## mode={mode}")
            for k, (mu, sd) in sorted(agg.items()):
                print(f"  {k}: {mu:.6g} +/- {sd:.2g}")
            sys.stdout.flush()

    print(json.dumps(results))


if __name__ == "__main__":
    main()
