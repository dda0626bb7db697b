"""Protocol-scale generative-eval benchmark.

Times the FULL airplane-protocol metric computation — the rs/rr/ss
pairwise matrices behind MMD/COV/1-NNA (reference
evaluation_metrics.py:232-309; airplane test split is 405 clouds of
2048 points, scripts/run_evaluate_gen.sh) — on the current device, via
the on-chip pairwise grid kernels (ops/pallas/pairwise_kernel.py) on
TPU or the XLA path elsewhere.

Prints one JSON line:
  {"s": S, "r": R, "n": N, "cd_matrix_sec": ..., "emd_matrix_sec": ...,
   "protocol_sec": ..., "protocol_min_10rep": ...}

where protocol_sec covers rs+rr+ss with CD(+F1) and, with --emd, EMD.

Usage: python tools/protocol_bench.py [--s 405] [--r 405] [--n 2048]
           [--no-emd]
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
    ap.add_argument("--s", type=int, default=405)
    ap.add_argument("--r", type=int, default=405)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--no-emd", action="store_true")
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

    from go_with_the_flows_tpu.metrics.evaluation import (
        compute_all_metrics, pairwise_EMD_CD_F1,
    )

    rng = np.random.RandomState(0)
    gen = (rng.randn(args.s, args.n, 3) * 0.2).astype(np.float32)
    ref = (rng.randn(args.r, args.n, 3) * 0.2).astype(np.float32)

    # warm the kernels on a small matrix (compile excluded from timing)
    pairwise_EMD_CD_F1(gen[:2], ref[:3], batch_size=60,
                       emd_option=not args.no_emd, f1_option=True)

    t0 = time.perf_counter()
    pairwise_EMD_CD_F1(gen, ref, batch_size=60, emd_option=False,
                       f1_option=True)
    cd_matrix_sec = time.perf_counter() - t0

    emd_matrix_sec = None
    if not args.no_emd:
        t0 = time.perf_counter()
        pairwise_EMD_CD_F1(gen, ref, batch_size=60, emd_option=True,
                           f1_option=True)
        emd_matrix_sec = time.perf_counter() - t0

    # the full protocol: rs + rr + ss matrices, CD(+EMD)+F1, then the
    # (cheap, host-side) MMD/COV/1-NNA reductions. Rep 1 computes rr;
    # reps 2..10 reuse it through the evaluate_ae.py ref_cache (round 4)
    ref_cache = {}
    t0 = time.perf_counter()
    res = compute_all_metrics(
        gen, ref, batch_size=60, cd_option=True,
        emd_option=not args.no_emd, f1_option=True, ref_cache=ref_cache,
    )
    protocol_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    compute_all_metrics(
        gen, ref, batch_size=60, cd_option=True,
        emd_option=not args.no_emd, f1_option=True, ref_cache=ref_cache,
    )
    warm_rep_sec = time.perf_counter() - t0

    print(json.dumps({
        "s": args.s, "r": args.r, "n": args.n,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "cd_matrix_sec": round(cd_matrix_sec, 2),
        "emd_matrix_sec": (round(emd_matrix_sec, 2)
                           if emd_matrix_sec is not None else None),
        "protocol_sec": round(protocol_sec, 2),
        "warm_rep_sec": round(warm_rep_sec, 2),
        "protocol_min_10rep": round(
            (protocol_sec + 9 * warm_rep_sec) / 60.0, 1
        ),
        "mmd_cd": float(res["lgan_mmd-CD"]),
        "nna_cd": float(res["1-NN-CD-acc"]),
    }))


if __name__ == "__main__":
    main()
