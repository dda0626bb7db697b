"""Benchmark: 2048-pt cloud sampling + eval throughput per chip.

Measures the BASELINE.json north-star metric — clouds/sec/chip for the
flagship airplane generative model: sample a batch of labeled 2048-point
clouds (prior flow forward + K vmapped decoder flows + categorical gather)
AND evaluate each against a reference batch (bidirectional Chamfer), all
in one jitted program on the current default device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clouds/sec/chip", "vs_baseline": N}

vs_baseline is the speedup over the CPU baseline measured on the dev box
(1-core CPU, same program, see CPU_BASELINE_CLOUDS_PER_SEC provenance);
the BASELINE.md target is >= 20x.
"""

import json
import time

import numpy as np
import jax

# The session env sometimes pins JAX_PLATFORMS to a plugin alias ('axon')
# that the backend registry rejects; fall back to auto-selection.
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "")
import jax.numpy as jnp

from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
from go_with_the_flows_tpu.ops.chamfer import chamfer
from go_with_the_flows_tpu.ops.pallas.chamfer_kernel import chamfer_pallas

# Measured with `python bench.py --cpu` on the round-1 dev box
# (1-core CPU, same jitted program with the scan decoder, B=64, N=2048).
CPU_BASELINE_CLOUDS_PER_SEC = 2.95

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

# B=1024 saturates the chip (the sampling program is dispatch-latency
# bound below ~512); the Pallas chamfer keeps eval memory flat so the
# large batch fits. CPU fallback uses the XLA chamfer and a small batch.
B = 1024
N = 2048


def main(measure_only: bool = False):
    on_tpu = jax.default_backend() == "tpu"
    batch = B if on_tpu else 64
    model = FlowMixtureModel(**FLAGSHIP)
    rng = jax.random.PRNGKey(0)
    g_in = jax.random.normal(rng, (batch, 3, N)) * 0.2
    variables = model.init(
        {"params": rng, "sample": rng}, g_in, g_in, mode="training"
    )
    ref = jax.random.normal(jax.random.PRNGKey(1), (batch, N, 3)) * 0.2

    @jax.jit
    def sample_and_eval(params, batch_stats, key, ref_clouds):
        _, samples, labels, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_in, mode="generating", n_sampled_points=N,
            rngs={"sample": key},
        )
        gen = jnp.transpose(samples, (0, 2, 1))  # (B, N, 3)
        cd_fn = chamfer_pallas if on_tpu else chamfer
        dl, dr = cd_fn(gen, ref_clouds)
        cd = jnp.mean(dl, axis=1) + jnp.mean(dr, axis=1)
        return samples, labels, cd

    params, batch_stats = variables["params"], variables["batch_stats"]

    # warmup / compile
    out = sample_and_eval(params, batch_stats, jax.random.PRNGKey(2), ref)
    jax.block_until_ready(out)

    n_iters = 3 if jax.default_backend() == "cpu" else 20
    start = time.perf_counter()
    for i in range(n_iters):
        out = sample_and_eval(
            params, batch_stats, jax.random.PRNGKey(3 + i), ref
        )
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    clouds_per_sec = batch * n_iters / elapsed
    if measure_only:
        print(f"# measured {clouds_per_sec:.3f} clouds/sec on "
              f"{jax.default_backend()}")
        return
    print(json.dumps({
        "metric": "2048-pt clouds/sec/chip (sample + eval)",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / CPU_BASELINE_CLOUDS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    import sys

    main(measure_only="--cpu" in sys.argv)
