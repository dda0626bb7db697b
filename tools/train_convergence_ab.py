"""Training-quality A/B: does the fused Pallas training decoder (and
reduced matmul precision) change convergence?

Trains the flagship model for --steps optimizer steps on synthetic
two-blob clouds (fresh batch per step, shared data stream across
variants) and prints the loss trajectory per variant. Variants:
  xla-highest  — the parity-first default path
  fused-high   — fused kernel, 3-pass bf16-split matmuls
  fused-fast   — fused kernel, bf16 matmuls

Usage: python tools/train_convergence_ab.py [--steps 300] [--b 64]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--variants",
                    default="xla-highest,fused-high,fused-fast")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP, N
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step

    B = args.b
    model = FlowMixtureModel(**FLAGSHIP)
    rng = np.random.RandomState(0)
    centers = np.array([[-0.5, 0, 0], [0.5, 0, 0]])

    def make_batch():
        which = rng.randint(0, 2, size=(B, N))
        pts = centers[which] + rng.randn(B, N, 3) * 0.15
        cloud = pts.transpose(0, 2, 1).astype(np.float32)
        return cloud

    # one shared data stream so every variant sees identical batches
    stream = [make_batch() for _ in range(args.steps)]

    for variant in args.variants.split(","):
        path, mode = variant.split("-")
        fused = path == "fused"
        with matmul_precision_scope(mode):
            opt = make_optimizer(
                epoch_length=args.steps, cycle_length=4, min_lr=5e-4,
                max_lr=1e-3, beta1=0.9, min_beta2=0.99, max_beta2=0.99,
                wd=1e-6,
            )
            batch = {"cloud": stream[0], "eval_cloud": stream[0]}
            state = create_train_state(
                model, jax.random.PRNGKey(0), batch, opt
            )
            step = make_train_step(model, opt, fused_decoder=fused)
            t0 = time.perf_counter()
            curve = []
            for i, cloud in enumerate(stream):
                c = jnp.asarray(cloud)
                state, m = step(state, c, c, jax.random.PRNGKey(1),
                                warmup=i < 10)
                if (i + 1) % args.log_every == 0 or i == 0:
                    curve.append((i + 1, round(float(m["loss"]), 3)))
            dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": variant, "steps": args.steps,
            "losses": curve, "wall_s": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
