"""FULL-training end-metric A/B: train the flagship generative model to
convergence under each training variant, then evaluate the complete
protocol (MMD/COV/1-NNA over CD and EMD, JSD, paired reps) per variant.

This is the promotion gate VERDICT r3 item 3 asks for: round 3 promoted
'high' on the EVAL path with an end-metric A/B (tools/eval_precision_ab.py)
but only ran a 300-step loss A/B on the TRAINING axis
(tools/train_convergence_ab.py). Here each variant trains its OWN model
start-to-finish — so precision effects on optimization (not just on a
frozen forward) are measured — and the final models are compared on the
reported table numbers, sampled at the shipped eval default ('high') with
PAIRED rng keys.

Variants (training path only; eval path identical for all):
  xla-highest  — plain XLA decoder inverse, float32 'highest' matmuls
  fused-high   — fused Pallas train kernel, 3-pass bf16-split matmuls
  fused-fast   — fused Pallas train kernel, bf16 matmuls

Reference recipe being modeled: the staged multi-epoch training of
/root/reference/scripts/train_airplane_gen.sh (staged lr 1e-3..1e-4),
compressed to --steps fresh-batch steps with a cosine lr cycle.

Usage:
  python tools/train_quality_ab.py [--steps 3000] [--b 64] [--s 128]
      [--reps 3] [--out /tmp/train_quality_ab.json]
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
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--s", type=int, default=128,
                    help="sample / reference set size per rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants",
                    default="xla-highest,fused-high,fused-fast")
    ap.add_argument("--eval_mode", default="high",
                    help="matmul precision for the SAMPLING side "
                         "(shipped eval default)")
    ap.add_argument("--out", default="/tmp/train_quality_ab.json")
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
    centers = np.array([[-0.5, 0.0, 0.0], [0.5, 0.0, 0.0],
                        [0.0, 0.6, 0.0], [0.0, 0.0, -0.6]])

    def make_clouds(n_clouds, rstate):
        which = rstate.randint(0, len(centers), size=(n_clouds, N))
        scale = 0.1 + 0.1 * rstate.rand(n_clouds, 1, 1)
        pts = centers[which] + rstate.randn(n_clouds, N, 3) * scale
        return pts.transpose(0, 2, 1).astype(np.float32)

    # Shared eval-side fixtures (identical across variants).
    ref = make_clouds(args.s, np.random.RandomState(123))
    ref_nc3 = np.ascontiguousarray(ref.transpose(0, 2, 1))
    g_in = jnp.asarray(make_clouds(args.s, np.random.RandomState(7)))

    results = {}
    for variant in args.variants.split(","):
        path, mode = variant.split("-")
        fused = path == "fused"

        # ---- train this variant's model from scratch ----
        # Fresh identical data stream per variant (same seed).
        rng = np.random.RandomState(0)
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
        losses = []
        with matmul_precision_scope(mode):
            step = make_train_step(model, opt, fused_decoder=fused)
            t0 = time.perf_counter()
            for i in range(args.steps):
                c = jnp.asarray(make_clouds(B, rng))
                state, m = step(state, c, c, jax.random.PRNGKey(1),
                                warmup=i < 10)
                if (i + 1) % max(1, args.steps // 10) == 0 or i == 0:
                    losses.append((i + 1, round(float(m["loss"]), 3)))
                    print(f"# [{variant}] step {i + 1}: "
                          f"loss {float(m['loss']):.2f}", flush=True)
            train_s = time.perf_counter() - t0

        # ---- evaluate the full protocol at the shipped eval default ----
        with matmul_precision_scope(args.eval_mode):
            sample_step = make_sample_step(model, N)
            per_rep = []
            for rep in range(args.reps):
                key = jax.random.PRNGKey(1000 + rep)  # PAIRED across variants
                samples, labels, _ = sample_step(state, g_in, key)
                s_nc3 = np.asarray(
                    jnp.transpose(samples, (0, 2, 1)), np.float32
                )
                res = compute_all_metrics(
                    s_nc3, ref_nc3, batch_size=min(args.s, 64),
                    cd_option=True, emd_option=True,
                )
                res = {k: float(v) for k, v in res.items()
                       if np.size(v) == 1}
                res["JSD"] = float(
                    jsd_between_point_cloud_sets(s_nc3, ref_nc3)
                )
                per_rep.append(res)
        agg = {
            k: (float(np.mean([r[k] for r in per_rep])),
                float(np.std([r[k] for r in per_rep])))
            for k in per_rep[0]
        }
        results[variant] = {
            "train_wall_s": round(train_s, 1),
            "steps_per_s": round(args.steps / train_s, 1),
            "final_loss": losses[-1][1],
            "loss_curve": losses,
            "metrics": agg,
        }
        print(f"## variant={variant}  train {train_s:.0f}s "
              f"({args.steps / train_s:.1f} steps/s)  "
              f"final loss {losses[-1][1]}")
        for k, (mu, sd) in sorted(agg.items()):
            print(f"  {k}: {mu:.6g} +/- {sd:.2g}")
        sys.stdout.flush()

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps({v: r["metrics"] for v, r in results.items()}))
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
