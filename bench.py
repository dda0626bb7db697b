"""Benchmark: 2048-pt cloud sampling + eval throughput per chip, plus
training-step throughput.

Measures the BASELINE.json north-star metric — clouds/sec/chip for the
flagship airplane generative model: sample a batch of labeled 2048-point
clouds (prior flow forward + K vmapped decoder flows + categorical gather)
AND evaluate each against a reference batch (bidirectional Chamfer), all
in one jitted program on the current default device.

The headline runs at the GENERATING-eval default matmul precision,
'fast' (bf16 — promoted in round 4 after the flagship paired A/B showed
every generative metric, MMD/COV/1-NNA over CD and EMD plus JSD,
statistically identical to fp32-'highest' sampling; the AE /
reconstruction eval default stays 'high' because the PAIRED F1@1e-4
moves ~2% relative under bf16 drift; see RESULTS.md round 4).
Training runs its own 'fast' default; its throughput is reported
separately.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clouds/sec/chip",
   "vs_baseline": N, ...}
with FLOPs/MFU accounting fields:
  - model_tflops_per_cloud: ANALYTIC decoder FLOPs per cloud (XLA's
    cost analysis counts a scan body once, not times its trip count,
    undercounting the scanned stack ~3.4x);
  - chamfer_tflops_per_cloud: analytic FLOPs of the fused Pallas Chamfer
    (8 * N * M per pair: 3 sub + 3 mul + 2 add for the squared distance,
    min folded into the reduction — the Pallas custom call is invisible
    to XLA's cost analysis, so it is accounted analytically);
  - sustained_tflops: (model + chamfer) FLOPs / measured second;
  - mfu: sustained_tflops / chip peak (bf16 peak from the device-kind
    table below);
  - sample_frac: fraction of step time in sampling (vs Chamfer eval),
    measured with a sample-only program;
  - emd_clouds_per_sec: the sample + CD + EMD variant (9-level auction
    EMD is ~35x the Chamfer arithmetic, so this is the expensive eval);
  - highest_clouds_per_sec: sample + CD at fp32 'highest' (the old
    parity-first default, kept for comparability with BENCH_r01/r02);
  - high_mode_clouds_per_sec: sample + CD with 'high' (3-pass ~f32)
    model matmuls — the AE/reconstruction eval default (the headline
    measures the GENERATING default, 'fast'; metric kernels stay
    HIGHEST in every mode);
  - train_clouds_per_sec / train_step_ms / train_mfu: jitted flagship
    training step (B=64, fwd+bwd+adam) at the SHIPPED training default
    ('fast': bf16 matmuls in the fused Pallas training kernel —
    train_ae.py), fori_loop-timed with the same honest fetch sync.
    train_mfu counts decoder fwd+bwd FLOPs only (3x forward;
    encoder/prior/optimizer excluded), so it UNDERSTATES utilization
    slightly.
  - train_highest_clouds_per_sec / train_high_clouds_per_sec: the same
    step at 'highest' (strict-parity opt-in, XLA path) / 'high' (3-pass
    ~f32 fused kernel) — the FULL-training end-metric A/B
    (tools/train_quality_ab.py) measured statistically identical
    MMD/COV/1-NNA/JSD and loss curves for all three variants.
  - svr_train_clouds_per_sec / svr_recon_clouds_per_sec: the flagship
    SVR family (config_SVR.yaml scale: ResNet-18 over 224x224x4 images
    conditioning the K=4 mixture, N=2500) — image-conditioned train
    step at the shipped 'fast' default and reconstruction-mode
    labeled sampling at the AE eval default 'high'.
  - pairwise_{cd,emd}_pairs_per_sec / protocol_min_10rep_est: the
    on-chip pairwise metric-matrix rates (TPU only; the generative
    MMD/COV/1-NNA hot path) and the extrapolated 10-rep airplane
    protocol wall time (tools/protocol_bench.py measures it for real).

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

# The TPU tunnel FLAPS: libtpu init can fail transiently, silently
# dropping jax to CPU — which would record meaningless CPU numbers as
# the chip benchmark. Retry the backend init for a bounded window
# before accepting whatever is available.
import sys as _sys

if jax.default_backend() != "tpu" and "--cpu" not in _sys.argv:
    import time as _time

    from jax.extend.backend import clear_backends as _clear_backends

    for _try in range(10):
        print(f"# backend is {jax.default_backend()}, retrying TPU init "
              f"({_try + 1}/10)...", file=_sys.stderr)
        _time.sleep(60)
        _clear_backends()
        if jax.default_backend() == "tpu":
            break
import os as _os

# persistent compilation cache: the bench compiles ~5 full-scale programs;
# warm runs are exec-only (compiles over the tunnel are minutes-scale)
jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                  ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
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

# Per-chip peak dense-matmul FLOP/s (bf16), by device kind.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for key, peak in PEAK_FLOPS.items():
        if kind.startswith(key):
            return peak
    return 197e12  # default: v5e-class


TRAIN_B = 64  # flagship per-chip training batch (scripts/train_*.sh)


def _train_bench(model, mode: str = "highest"):
    """Flagship jitted train-step throughput (clouds/sec, ms/step) at the
    given matmul precision, fori_loop-timed with a fetch sync — the same
    honest protocol as `timed` below. At 'high'/'fast' on TPU the fused
    Pallas training kernel auto-engages (train/step.py)."""
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step

    batch_b = TRAIN_B if jax.default_backend() == "tpu" else 8
    rng = np.random.RandomState(0)
    batch = {
        "cloud": (rng.randn(batch_b, 3, N) * 0.2).astype(np.float32),
        "eval_cloud": (rng.randn(batch_b, 3, N) * 0.2).astype(np.float32),
    }
    n_iters = 2 if jax.default_backend() == "cpu" else 10
    with matmul_precision_scope(mode):
        opt = make_optimizer(
            epoch_length=100, cycle_length=4, min_lr=1e-4, max_lr=2.56e-4,
            beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
        )
        state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
        step = make_train_step(model, opt)
        g = jnp.asarray(batch["cloud"])
        p = jnp.asarray(batch["eval_cloud"])

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

        _, chk = run(state, jax.random.PRNGKey(2), g, p)
        float(chk)  # compile + fetch sync
        start = time.perf_counter()
        _, chk = run(state, jax.random.PRNGKey(3), g, p)
        float(chk)
        dt = (time.perf_counter() - start) / n_iters
    return batch_b / dt, dt * 1e3


SVR_FLAGSHIP = dict(
    n_components=4,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    g_latent_space_size=512,
    g_prior_n_flows=7,
    g_prior_n_features=128,
    g_posterior_n_layers=1,
    g_prior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=21,
    p_decoder_n_features=64,
    p_decoder_base_type="freevar",
    p_decoder_base_var=0.0,
    pc_enc_init_n_features=64,
    pc_enc_n_features=(128, 256, 512),
)
SVR_B = 32      # per-chip SVR train batch (config_SVR.yaml: 128 global)
SVR_N = 2500    # SVR cloud size (config_SVR.yaml cloud_size)
SVR_HW = 224    # image side (config_SVR.yaml image_size), 4 channels


def _svr_bench():
    """Flagship SVR-family throughput (VERDICT r4 missing #4): the
    image-conditioned train step (ResNet-18 encoder + mixture decoder,
    train_svr.py's default 'fast') and the reconstruction-eval sampling
    rate (evaluate_ae.py reconstruction mode at the AE default 'high').
    Same fori_loop + fetch-sync protocol as the generative numbers."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureSVRModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_sample_step,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    b = SVR_B if on_tpu else 4
    n = SVR_N if on_tpu else 128
    hw = SVR_HW if on_tpu else 64
    rng = np.random.RandomState(0)
    batch = {
        "cloud": (rng.randn(b, 3, n) * 0.2).astype(np.float32),
        "eval_cloud": (rng.randn(b, 3, n) * 0.2).astype(np.float32),
        "image": rng.rand(b, hw, hw, 4).astype(np.float32),
    }
    model = FlowMixtureSVRModel(**SVR_FLAGSHIP)
    opt = make_optimizer(
        epoch_length=100, cycle_length=20, min_lr=2.56e-4, max_lr=2.56e-4,
        beta1=0.9, min_beta2=0.995, max_beta2=0.995, wd=1e-6,
    )
    n_iters = 2 if not on_tpu else 10
    g = jnp.asarray(batch["cloud"])
    p = jnp.asarray(batch["eval_cloud"])
    im = jnp.asarray(batch["image"])

    with matmul_precision_scope("fast"):  # train_svr.py default
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   opt, svr=True)
        step = make_train_step(model, opt, svr=True)

        @jax.jit
        def run_train(state, key, g, p, im):
            def body(i, carry):
                st, acc = carry
                st, m = step(st, g, p, jax.random.fold_in(key, i),
                             images=im, warmup=False)
                return st, acc + m["loss"]

            return jax.lax.fori_loop(
                0, n_iters, body, (state, jnp.float32(0.0))
            )

        _, chk = run_train(state, jax.random.PRNGKey(2), g, p, im)
        float(chk)
        start = time.perf_counter()
        _, chk = run_train(state, jax.random.PRNGKey(3), g, p, im)
        float(chk)
        train_rate = b * n_iters / (time.perf_counter() - start)

    with matmul_precision_scope("high"):  # AE/reconstruction eval default
        rec_step = make_sample_step(model, n_sampled_points=n,
                                    mode="reconstruction", svr=True)

        @jax.jit
        def run_rec(state, key, g, im):
            def body(i, acc):
                samples, labels, _ = rec_step(
                    state, g, jax.random.fold_in(key, i), images=im
                )
                return (acc + jnp.sum(samples).astype(jnp.float32)
                        + jnp.sum(labels).astype(jnp.float32))

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        float(run_rec(state, jax.random.PRNGKey(4), g, im))
        start = time.perf_counter()
        float(run_rec(state, jax.random.PRNGKey(5), g, im))
        rec_rate = b * n_iters / (time.perf_counter() - start)

    return {
        "svr_train_clouds_per_sec": round(train_rate, 2),
        "svr_recon_clouds_per_sec": round(rec_rate, 2),
    }


def _pairwise_bench(s: int = 64, r: int = 64):
    """Pairwise metric-matrix rates (the generative-protocol hot path,
    ops/pallas/pairwise_kernel.py) on a small (s, r) grid, plus the
    extrapolated 10-rep airplane-protocol wall time (405x405 matrices,
    rs+rr+ss, CD+EMD+F1 — tools/protocol_bench.py measures it for
    real)."""
    from go_with_the_flows_tpu.ops.pallas.pairwise_kernel import (
        pairwise_cd_stats_pallas,
        pairwise_emd_pallas,
    )

    rng = np.random.RandomState(0)
    a = jnp.asarray((rng.randn(s, N, 3) * 0.2).astype(np.float32))
    b = jnp.asarray((rng.randn(r, N, 3) * 0.2).astype(np.float32))

    def timed_pairs(fn):
        float(jnp.sum(fn(a, b)[0]))  # compile + fetch
        start = time.perf_counter()
        float(jnp.sum(fn(a, b)[0]))
        return s * r / (time.perf_counter() - start)

    cd_rate = timed_pairs(
        lambda x, y: pairwise_cd_stats_pallas(x, y, f1_threshold=1e-3)
    )
    emd_rate = timed_pairs(lambda x, y: (pairwise_emd_pallas(x, y),))
    # rep 1 computes rs+rr+ss; reps 2..10 reuse the rr matrices through
    # evaluate_ae.py's ref_cache (round 4) -> 3 + 9*2 matrix units
    matrix_units = 3 + 9 * 2
    protocol_pairs = 405 * 405
    protocol_min = (
        matrix_units * protocol_pairs
        * (1.0 / cd_rate + 1.0 / emd_rate) / 60.0
    )
    return {
        "pairwise_cd_pairs_per_sec": round(cd_rate, 1),
        "pairwise_emd_pairs_per_sec": round(emd_rate, 1),
        "protocol_min_10rep_est": round(protocol_min, 1),
    }


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

    def sample(params, batch_stats, key):
        _, samples, labels, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g_in, mode="generating", n_sampled_points=N,
            rngs={"sample": key},
        )
        return samples, labels

    @jax.jit
    def sample_only(params, batch_stats, key):
        return sample(params, batch_stats, key)

    @jax.jit
    def sample_and_eval(params, batch_stats, key, ref_clouds):
        samples, labels = sample(params, batch_stats, key)
        gen = jnp.transpose(samples, (0, 2, 1))  # (B, N, 3)
        cd_fn = chamfer_pallas if on_tpu else chamfer
        dl, dr = cd_fn(gen, ref_clouds)
        cd = jnp.mean(dl, axis=1) + jnp.mean(dr, axis=1)
        return samples, labels, cd

    @jax.jit
    def sample_and_eval_emd(params, batch_stats, key, ref_clouds):
        from go_with_the_flows_tpu.ops.emd import match_cost
        from go_with_the_flows_tpu.ops.pallas.emd_kernel import (
            emd_cost_pallas,
        )

        samples, labels, cd = sample_and_eval(
            params, batch_stats, key, ref_clouds
        )
        gen = jnp.transpose(samples, (0, 2, 1))
        emd_fn = emd_cost_pallas if on_tpu else match_cost
        emd = emd_fn(gen, ref_clouds) / N
        return samples, labels, cd, emd

    params, batch_stats = variables["params"], variables["batch_stats"]

    n_iters = 3 if jax.default_backend() == "cpu" else 20

    def timed(fn, *args):
        """Honest device-side timing.

        1. The iteration loop runs INSIDE one jitted program (fori_loop;
           all outputs are reduced into a carried checksum so no
           iteration can be DCE'd/CSE'd — keys differ per iteration):
           per-dispatch wall timing over a tunneled chip measures
           transport, not compute.
        2. The sync is a device->host FETCH of the checksum (float()),
           not block_until_ready — the tunneled runtime's ready-event can
           resolve before execution, which inflated the round-1 number;
           a transferred value cannot exist before the compute does.
        """

        @jax.jit
        def run(params, batch_stats, key, *args):
            def body(i, acc):
                out = fn(params, batch_stats, jax.random.fold_in(key, i),
                         *args)
                return acc + sum(
                    jnp.sum(o).astype(jnp.float32)
                    for o in jax.tree.leaves(out)
                )

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        float(run(params, batch_stats, jax.random.PRNGKey(2), *args))
        start = time.perf_counter()
        float(run(params, batch_stats, jax.random.PRNGKey(3), *args))
        return batch * n_iters / (time.perf_counter() - start)

    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope

    # the model precision is read at TRACE time (first call), so both
    # the jit construction AND the timed first call sit inside the scope.
    # Headline = the GENERATING eval default ('fast' since round 4 —
    # flagship paired A/B showed every generative metric identical to
    # 'highest' sampling, tools/eval_precision_ab.py / RESULTS.md)
    with matmul_precision_scope("fast"):
        clouds_per_sec = timed(sample_and_eval, ref)
        if measure_only:
            print(f"# measured {clouds_per_sec:.3f} clouds/sec on "
                  f"{jax.default_backend()}")
            return
        sample_per_sec = timed(sample_only)
        emd_per_sec = timed(sample_and_eval_emd, ref)

    def cd_variant():
        @jax.jit
        def sample_and_eval_v(params, batch_stats, key, ref_clouds):
            samples, labels = sample(params, batch_stats, key)
            gen = jnp.transpose(samples, (0, 2, 1))
            cd_fn = chamfer_pallas if on_tpu else chamfer
            dl, dr = cd_fn(gen, ref_clouds)
            return samples, labels, jnp.mean(dl, 1) + jnp.mean(dr, 1)

        return sample_and_eval_v

    # fp32 'highest' (parity-first; comparable with BENCH_r01/r02) and
    # 'high' (3-pass ~f32, the AE/reconstruction eval default); metric
    # kernels pin HIGHEST in all modes
    with matmul_precision_scope("highest"):
        highest_per_sec = timed(cd_variant(), ref)
    with matmul_precision_scope("high"):
        high_per_sec = timed(cd_variant(), ref)

    # (The sparse component-partitioned sampling decode was RETIRED in
    # round 4 — measured 2.8x slower than the dense fused kernel; spec +
    # numbers in ROADMAP.md.)

    # headline train number measures the SHIPPED training default
    # ('fast' — train_ae.py; bf16 matmuls in the fused Pallas training
    # kernel, promoted by the full-training end-metric A/B,
    # tools/train_quality_ab.py), with 'highest' (strict-parity opt-in)
    # and 'high' (3-pass ~f32) reported alongside
    train_per_sec, train_step_ms = _train_bench(model, "fast")
    train_highest_per_sec, _ = _train_bench(model, "highest")
    train_high_per_sec, _ = _train_bench(model, "high")
    svr = _svr_bench()
    pairwise = _pairwise_bench() if on_tpu else {}

    # FLOPs accounting (see module docstring). The decoder flops are
    # ANALYTIC: XLA's cost analysis counts a while/scan body once, not
    # times its trip count, so it undercounts the scanned coupling stack
    # ~3.4x. Per coupling per point, per head: (3 x f) + (f x f) + (f x 3)
    # MACs; 2 heads; K components decode all N points.
    from go_with_the_flows_tpu.models.mixture import reduce_decoder_params

    depth, feats = reduce_decoder_params(
        FLAGSHIP["n_components"], FLAGSHIP["params_reduce_mode"],
        FLAGSHIP["p_decoder_n_flows"], FLAGSHIP["p_decoder_n_features"],
        FLAGSHIP["g_latent_space_size"],
    )
    per_coupling = 4.0 * (3 * feats + feats * feats + feats * 3)
    model_flops = (
        FLAGSHIP["n_components"] * N * (3 * depth) * per_coupling
    )
    chamfer_flops = 8.0 * N * N  # per cloud pair, analytic
    per_cloud = model_flops + chamfer_flops
    sustained = per_cloud * clouds_per_sec
    peak = _chip_peak_flops()

    # training MFU: decoder fwd+bwd ~ 3x forward FLOPs per cloud (the
    # standard fwd/bwd accounting), encoder/prior/optimizer excluded
    train_flops_per_cloud = 3.0 * model_flops
    train_sustained = train_flops_per_cloud * train_per_sec

    print(json.dumps({
        "metric": "2048-pt clouds/sec/chip (sample + CD eval)",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / CPU_BASELINE_CLOUDS_PER_SEC, 2),
        "emd_clouds_per_sec": round(emd_per_sec, 2),
        "highest_clouds_per_sec": round(highest_per_sec, 2),
        "high_mode_clouds_per_sec": round(high_per_sec, 2),
        "sample_only_clouds_per_sec": round(sample_per_sec, 2),
        "sample_frac": round(clouds_per_sec / max(sample_per_sec, 1e-9), 4),
        "model_tflops_per_cloud": round(model_flops / 1e12, 6),
        "chamfer_tflops_per_cloud": round(chamfer_flops / 1e12, 6),
        "sustained_tflops": round(sustained / 1e12, 2),
        "chip_peak_bf16_tflops": round(peak / 1e12, 1),
        "mfu": round(sustained / peak, 4),
        "train_clouds_per_sec": round(train_per_sec, 2),
        "train_step_ms": round(train_step_ms, 2),
        "train_mfu": round(train_sustained / peak, 4),
        "train_highest_clouds_per_sec": round(train_highest_per_sec, 2),
        "train_high_clouds_per_sec": round(train_high_per_sec, 2),
        **svr,
        **pairwise,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    import sys

    main(measure_only="--cpu" in sys.argv)
