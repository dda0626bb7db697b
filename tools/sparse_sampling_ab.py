"""Real-TPU A/B of the sparse (component-partitioned) sampling decode
(ops/pallas/sparse_decode.py) vs the dense fused path at flagship scale.

The sparse path decodes each point through ITS OWN component's flow only
(~1/K the decoder FLOPs); its pointwise correctness vs the dense decode
is already asserted in interpret mode
(tests/test_sparse_decode.py::test_sparse_kernel_matches_dense_decode_pointwise).
This tool supplies the real-hardware evidence the auto-enable gate
(models/mixture.py::_use_sparse_sampling) is waiting on:

  1. throughput: sample-only and sample+CD clouds/sec, dense vs sparse,
     at the eval-path default precision ('high'), fetch-synced
     fori_loop timing (bench.py's honest protocol);
  2. distribution match: per-component centroid/spread of the labeled
     samples, dense vs sparse over the same trained-ish params and
     matched seeds, plus the CD-MMD of each sample set against a shared
     reference set (the two sample sets are i.i.d. draws from the SAME
     mixture, so their statistics must agree within sampling spread).

Usage: JAX_PLATFORMS='' python tools/sparse_sampling_ab.py [--b 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")

from go_with_the_flows_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from go_with_the_flows_tpu.models.mixture import FlowMixtureModel  # noqa: E402
from go_with_the_flows_tpu.ops.pallas.chamfer_kernel import (  # noqa: E402
    chamfer_pallas,
)
from go_with_the_flows_tpu.ops.precision import (  # noqa: E402
    matmul_precision_scope,
)

FLAGSHIP = dict(
    n_components=4,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    g_latent_space_size=128,
    g_prior_n_flows=7,
    g_prior_n_features=128,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=21,
    p_decoder_n_features=64,
    p_decoder_base_type="free",
    pc_enc_init_n_features=64,
    pc_enc_n_features=(128, 256, 512),
)
N = 2048


def timed(fn, params, batch_stats, batch, n_iters=20):
    @jax.jit
    def run(params, batch_stats, key):
        def body(i, acc):
            out = fn(params, batch_stats, jax.random.fold_in(key, i))
            return acc + sum(
                jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)
            )

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    float(run(params, batch_stats, jax.random.PRNGKey(2)))
    start = time.perf_counter()
    float(run(params, batch_stats, jax.random.PRNGKey(3)))
    return batch * n_iters / (time.perf_counter() - start)


def per_component_stats(samples, labels, K):
    """(K, 4): centroid xyz + mean radius about it, pooled over clouds."""
    rows = []
    s = np.asarray(samples)  # (B, 3, N)
    lab = np.asarray(labels)
    for k in range(1, K + 1):
        pts = np.concatenate(
            [s[b][:, lab[b] == k].T for b in range(s.shape[0])], axis=0
        )
        # a component that drew zero points across the whole batch would
        # make every downstream max_dev NaN — fail loudly instead
        assert pts.shape[0] > 0, (
            f"component {k} drew no points over the batch; "
            "distribution check would be uninformative"
        )
        c = pts.mean(0)
        rows.append([*c, np.linalg.norm(pts - c, axis=1).mean()])
    return np.array(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    backend = jax.default_backend()
    print(f"# backend={backend} device={jax.devices()[0].device_kind}")
    if os.environ.get("GWTF_REQUIRE_BACKEND") and backend != os.environ[
        "GWTF_REQUIRE_BACKEND"
    ]:
        sys.exit(42)

    B = args.b
    rng = jax.random.PRNGKey(0)
    g_in = jax.random.normal(rng, (B, 3, N)) * 0.2

    dense = FlowMixtureModel(**FLAGSHIP)
    sparse = FlowMixtureModel(**FLAGSHIP, sparse_sampling=True)
    variables = dense.init(
        {"params": rng, "sample": rng}, g_in, g_in, mode="training"
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    ref = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)) * 0.2

    def make_sample(model):
        def fn(params, batch_stats, key):
            _, samples, labels, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                g_in, mode="generating", n_sampled_points=N,
                rngs={"sample": key},
            )
            return samples, labels

        return fn

    def make_sample_cd(model):
        sample = make_sample(model)

        def fn(params, batch_stats, key):
            samples, labels = sample(params, batch_stats, key)
            gen = jnp.transpose(samples, (0, 2, 1))
            dl, dr = chamfer_pallas(gen, ref)
            return samples, labels, jnp.mean(dl, 1) + jnp.mean(dr, 1)

        return fn

    results = {}
    with matmul_precision_scope("high"):
        for name, model in (("dense", dense), ("sparse", sparse)):
            results[f"{name}_sample_only"] = timed(
                make_sample(model), params, batch_stats, B, args.iters
            )
            results[f"{name}_sample_cd"] = timed(
                make_sample_cd(model), params, batch_stats, B, args.iters
            )

        # distribution match on a fresh draw each (different keys: the
        # two paths consume the rng stream differently by design)
        sd, ld = jax.jit(make_sample(dense))(
            params, batch_stats, jax.random.PRNGKey(11)
        )
        ss, ls = jax.jit(make_sample(sparse))(
            params, batch_stats, jax.random.PRNGKey(12)
        )

    K = FLAGSHIP["n_components"]
    st_d = per_component_stats(sd, ld, K)
    st_s = per_component_stats(ss, ls, K)
    print("# per-component centroid+spread (dense / sparse):")
    for k in range(K):
        print(f"#   k={k + 1} dense={np.round(st_d[k], 4).tolist()} "
              f"sparse={np.round(st_s[k], 4).tolist()}")
    max_dev = float(np.abs(st_d - st_s).max())

    # CD of each sample set vs the shared reference set: the mean CD is
    # a distribution-level statistic; dense and sparse draws must agree
    with matmul_precision_scope("high"):
        def mean_cd(s):
            gen = jnp.transpose(s, (0, 2, 1))
            dl, dr = chamfer_pallas(gen, ref)
            return float(jnp.mean(jnp.mean(dl, 1) + jnp.mean(dr, 1)))

        cd_d, cd_s = mean_cd(sd), mean_cd(ss)

    for key in sorted(results):
        print(f"{key}: {results[key]:.1f} clouds/sec")
    print(f"speedup sample_only: "
          f"{results['sparse_sample_only'] / results['dense_sample_only']:.2f}x")
    print(f"speedup sample+CD:   "
          f"{results['sparse_sample_cd'] / results['dense_sample_cd']:.2f}x")
    print(f"mean CD vs ref: dense={cd_d:.6f} sparse={cd_s:.6f} "
          f"rel_diff={abs(cd_d - cd_s) / cd_d:.2e}")
    print(f"max component-stat deviation: {max_dev:.5f}")
    labels_ok = (np.asarray(ls).min() >= 1 and np.asarray(ls).max() <= K
                 and np.isfinite(np.asarray(ss)).all())
    print(f"labels/finite ok: {labels_ok}")


if __name__ == "__main__":
    main()
