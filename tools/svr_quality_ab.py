"""SVR training-precision A/B: does the 'fast' (bf16) training default
hold for the single-view-reconstruction model family?

The round-4 full-training end-metric A/B (tools/train_quality_ab.py)
covers the GENERATIVE flagship; the SVR model adds a ResNet-18 image
encoder whose convolutions also run bf16 under 'fast'. This tool trains
the SVR model from scratch under each precision on a synthetic
image->cloud task with REAL signal (the image is a 2-D occupancy
rendering of the cloud, so reconstruction must route information
through the conv encoder), with identical data streams, and compares:

  * the loss trajectory (PNLL+GNLL+GENT, every 10% of steps)
  * final paired reconstruction CD/EMD vs ground truth (eval at 'high',
    paired rng) — the SVR protocol's reported quantities

Usage: python tools/svr_quality_ab.py [--steps 400] [--b 16]
           [--modes highest,fast]
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
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--hw", type=int, default=137)
    ap.add_argument("--modes", default="highest,fast")
    ap.add_argument("--eval_s", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from go_with_the_flows_tpu.metrics.evaluation import EMD_CD_F1
    from go_with_the_flows_tpu.models.mixture import FlowMixtureSVRModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_sample_step,
        make_train_step,
    )

    N, HW = args.n, args.hw
    model = FlowMixtureSVRModel(
        n_components=2, params_reduce_mode="none",
        weights_type="learned_weights", g_latent_space_size=64,
        g_prior_n_flows=3, g_prior_n_features=64,
        p_decoder_n_flows=6, p_decoder_n_features=32,
        pc_enc_init_n_features=32, pc_enc_n_features=(64, 128),
    )

    def make_batch(rstate, b):
        """Clouds of 2 blobs whose centers vary per shape; images are
        coarse 2-D occupancy renders of the SAME cloud (xy plane)."""
        c1 = rstate.uniform(-0.6, 0.6, size=(b, 1, 3))
        c2 = rstate.uniform(-0.6, 0.6, size=(b, 1, 3))
        which = rstate.randint(0, 2, size=(b, N, 1))
        pts = np.where(which == 0, c1, c2) + \
            rstate.randn(b, N, 3) * 0.08
        clouds = pts.transpose(0, 2, 1).astype(np.float32)
        ij = np.clip(((pts[..., :2] + 1.0) * 0.5 * (HW - 1)).astype(int),
                     0, HW - 1)
        imgs = np.zeros((b, HW, HW, 4), np.float32)
        for k in range(b):  # host-side render, tiny b
            imgs[k, ij[k, :, 1], ij[k, :, 0], :3] = 1.0
        imgs[..., 3] = 1.0
        return clouds, imgs

    opt = make_optimizer(
        epoch_length=args.steps, cycle_length=4, min_lr=2e-4,
        max_lr=5e-4, beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng0 = np.random.RandomState(0)
    first_c, first_i = make_batch(rng0, args.b)
    init_batch = {"cloud": first_c, "eval_cloud": first_c,
                  "image": first_i}

    # shared eval fixtures
    ec, ei = make_batch(np.random.RandomState(123), args.eval_s)
    ec_j, ei_j = jnp.asarray(ec), jnp.asarray(ei)

    results = {}
    for mode in args.modes.split(","):
        rng = np.random.RandomState(1)  # identical stream per mode
        state = create_train_state(
            model, jax.random.PRNGKey(0), init_batch, opt, svr=True,
        )
        losses = []
        with matmul_precision_scope(mode):
            step = make_train_step(model, opt, svr=True)
            t0 = time.perf_counter()
            for i in range(args.steps):
                c, im = make_batch(rng, args.b)
                state, m = step(
                    state, jnp.asarray(c), jnp.asarray(c),
                    jax.random.PRNGKey(1), images=jnp.asarray(im),
                    warmup=i < 10,
                )
                if (i + 1) % max(1, args.steps // 10) == 0 or i == 0:
                    losses.append((i + 1, round(float(m["loss"]), 3)))
                    print(f"# [{mode}] step {i + 1}: "
                          f"loss {float(m['loss']):.2f}", flush=True)
            wall = time.perf_counter() - t0

        # paired reconstruction eval at the shipped AE/SVR default
        with matmul_precision_scope("high"):
            rec_step = make_sample_step(
                model, N, mode="reconstruction", svr=True,
            )
            recon, _, _ = rec_step(
                state, ec_j, jax.random.PRNGKey(7), images=ei_j,
            )
            r_nc3 = np.asarray(jnp.transpose(recon, (0, 2, 1)))
            tab = EMD_CD_F1(
                r_nc3, np.ascontiguousarray(ec.transpose(0, 2, 1)),
                batch_size=32, cd_option=True, emd_option=True,
                f1_option=True, f1_threshold=1e-3,
            )
        results[mode] = {
            "wall_s": round(wall, 1),
            "final_loss": losses[-1][1],
            "loss_curve": losses,
            "recon_CD_x1e4": round(float(tab["CD"]) * 1e4, 2),
            "recon_EMD_x1e2": round(float(tab["EMD"]) * 1e2, 3),
            "recon_F1": round(float(tab["F1"]), 3),
        }
        print(f"## mode={mode}: final loss {losses[-1][1]}, "
              f"CD {results[mode]['recon_CD_x1e4']} "
              f"EMD {results[mode]['recon_EMD_x1e2']} "
              f"F1 {results[mode]['recon_F1']} "
              f"({wall:.0f}s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
