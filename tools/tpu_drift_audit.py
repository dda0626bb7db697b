"""On-TPU numerical parity audit vs the reference PyTorch oracle.

Measures, at FLAGSHIP scale, the drift of the flax model running on the
real TPU against the weight-synced reference torch model on CPU
(the fp32 oracle, /root/reference), for every matmul-precision mode of
ops/precision.py — plus the training-step throughput cost of each mode.

Protocol (deterministic paths only, so drift is attributable to
arithmetic, not RNG):
  * encode in autoencoding mode (posterior MEAN, reference
    models.py:132-133) -> g_sample, prior-flow inverse logvar sum;
  * decode_training (every component inverts the full cloud,
    flow_mixture.py:142-143) -> p0_samples, flow logvar sums, logits;
  * the full loss pieces (PNLL/GNLL/GENT) computed by each side's own
    loss implementation on its own outputs.

Run:  JAX_PLATFORMS='' python tools/tpu_drift_audit.py [--skip-throughput]
Writes a markdown table to stdout (paste into RESULTS.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np


FLAGSHIP_CONFIG = dict(
    train_mode="p_rnvp_mc_g_rnvp_vae",
    util_mode="training",
    deterministic=False,
    n_components=4,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    pc_enc_init_n_channels=3,
    pc_enc_init_n_features=64,
    pc_enc_n_features=[128, 256, 512],
    g_latent_space_size=128,
    g_prior_n_flows=7,
    g_prior_n_features=128,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=21,
    p_decoder_n_features=64,
    p_decoder_base_type="free",
    p_decoder_base_var=-3.9551,
)

B, N = 8, 2048
BENCH_B = 64


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def build_reference():
    import torch
    from lib.networks.flow_mixture import Flow_Mixture_Model

    torch.manual_seed(20260816)
    ref = Flow_Mixture_Model(**FLAGSHIP_CONFIG)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()
    return ref


def torch_oracle(ref, g_in, p_in):
    import torch
    from lib.networks.losses import (
        FlowMixtureNLL, GaussianFlowNLL, GaussianEntropy,
    )

    ref.mode = "autoencoding"
    with torch.no_grad():
        enc = ref.encode(torch.from_numpy(g_in))
        g_sample = enc["g_posterior_samples"]
        ref.mode = "training"
        dec, logits = ref.decode(
            torch.from_numpy(p_in), g_sample, n_sampled_points=N
        )
        pnll = FlowMixtureNLL()(dec, logits)
        gnll = GaussianFlowNLL()(
            enc["g_prior_samples"], enc["g_prior_mus"],
            enc["g_prior_logvars"],
        )
        gent = GaussianEntropy()(enc["g_posterior_logvars"])
    return {
        "g_sample": t2n(g_sample),
        "g_prior_logvar_sum": t2n(sum(enc["g_prior_logvars"])),
        "p0_samples": np.stack(
            [t2n(d["p_prior_samples"][0]) for d in dec]
        ),
        "p_logvar_sums": np.stack(
            [t2n(sum(d["p_prior_logvars"][1:])) for d in dec]
        ),
        "logits": t2n(logits),
        "pnll": float(pnll),
        "gnll": float(gnll),
        "gent": float(gent),
    }


def flax_outputs(model, variables, g_in, p_in, device):
    import jax
    import jax.numpy as jnp

    from go_with_the_flows_tpu.losses import flow_mixture_loss

    @jax.jit
    def run(variables, g_in, p_in):
        enc = model.apply(variables, g_in, "autoencoding", train=False,
                          method="encode")
        dec = model.apply(variables, p_in, enc["g_sample"], False, False,
                          method="decode_training")
        out = {**enc, **dec}
        _, parts = flow_mixture_loss(out)
        return {
            "g_sample": enc["g_sample"],
            "g_prior_logvar_sum": enc["g_prior_logvar_sum"],
            "p0_samples": jnp.stack(list(dec["p0_samples"])),
            "p_logvar_sums": jnp.stack(list(dec["p_logvar_sums"])),
            "logits": dec["mixture_weights_logits"],
            "pnll": parts["pnll"],
            "gnll": parts["gnll"],
            "gent": parts["gent"],
        }

    with jax.default_device(device):
        args = jax.device_put((variables, jnp.asarray(g_in),
                               jnp.asarray(p_in)), device)
        out = run(*args)
    return {k: np.asarray(v) for k, v in jax.device_get(out).items()}


def drift(a, b):
    """(max abs diff, max rel diff) with a tiny-denominator floor."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    rel = d / np.maximum(np.abs(b), 1e-3)
    return float(d.max()), float(rel.max())


def throughput(precision_mode):
    import jax
    import jax.numpy as jnp

    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step
    from go_with_the_flows_tpu.utils.config import model_config_kwargs

    rng = np.random.RandomState(0)
    batch = {
        "cloud": (rng.randn(BENCH_B, 3, N) * 0.2).astype(np.float32),
        "eval_cloud": (rng.randn(BENCH_B, 3, N) * 0.2).astype(np.float32),
    }
    with matmul_precision_scope(precision_mode):
        model = FlowMixtureModel(**model_config_kwargs(FLAGSHIP_CONFIG))
        opt = make_optimizer(epoch_length=10, cycle_length=4, min_lr=1e-4,
                             max_lr=2.56e-4, beta1=0.9, min_beta2=0.99,
                             max_beta2=0.99, wd=1e-6)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
        step = make_train_step(model, opt)
        g = jnp.asarray(batch["cloud"])
        p = jnp.asarray(batch["eval_cloud"])
        key = jax.random.PRNGKey(1)
        state, m = step(state, g, p, key, warmup=False)
        float(m["loss"])  # compile + warmup (fetch-synced: over the
        # tunneled chip block_until_ready can resolve before execution)
        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, m = step(state, g, p, key, warmup=False)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n_iters
    return BENCH_B / dt, dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-throughput", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
    import jax.numpy as jnp  # noqa: F401

    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
    from go_with_the_flows_tpu.utils.config import model_config_kwargs
    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )

    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    cpu = jax.devices("cpu")
    assert tpu, "run with a TPU visible (JAX_PLATFORMS='')"
    print(f"# TPU drift audit — {tpu[0].device_kind}, flagship config, "
          f"B={B}, N={N}", flush=True)

    ref = build_reference()
    rng = np.random.RandomState(7)
    g_in = (rng.randn(B, 3, N) * 0.3).astype(np.float32)
    p_in = (rng.randn(B, 3, N) * 0.3).astype(np.float32)

    t0 = time.time()
    oracle = torch_oracle(ref, g_in, p_in)
    print(f"# torch oracle forward: {time.time() - t0:.0f}s", flush=True)

    variables = mixture_variables_from_state_dict(
        ref.state_dict(), FLAGSHIP_CONFIG, scan_couplings=True
    )
    model = FlowMixtureModel(**model_config_kwargs(FLAGSHIP_CONFIG))

    tensor_rows = ["g_sample", "g_prior_logvar_sum", "p0_samples",
                   "p_logvar_sums", "logits"]
    scalar_rows = ["pnll", "gnll", "gent"]
    configs = [("cpu-f32", cpu[0], "highest"),
               ("tpu-highest", tpu[0], "highest"),
               ("tpu-high", tpu[0], "high"),
               ("tpu-fast", tpu[0], "fast")]
    results = {}
    for name, device, prec in configs:
        with matmul_precision_scope(prec):
            t0 = time.time()
            results[name] = flax_outputs(model, variables, g_in, p_in,
                                         device)
            print(f"# {name}: {time.time() - t0:.0f}s", flush=True)

    print("\n## On-TPU drift vs torch-CPU oracle (max |abs| / max rel)\n")
    header = "| output | " + " | ".join(n for n, _, _ in configs) + " |"
    print(header)
    print("|---" * (len(configs) + 1) + "|")
    for row in tensor_rows:
        cells = []
        for name, _, _ in configs:
            a, r = drift(results[name][row], oracle[row])
            cells.append(f"{a:.2e} / {r:.2e}")
        print(f"| {row} | " + " | ".join(cells) + " |")
    for row in scalar_rows:
        cells = []
        for name, _, _ in configs:
            got = results[name][row]
            want = oracle[row]
            cells.append(f"{abs(got - want) / max(abs(want), 1e-9):.2e}")
        print(f"| {row} (rel) | " + " | ".join(cells) + " |")
    print(f"\noracle: pnll={oracle['pnll']:.4f} gnll={oracle['gnll']:.4f} "
          f"gent={oracle['gent']:.4f}")

    if not args.skip_throughput:
        print("\n## Training-step throughput by precision "
              f"(B={BENCH_B}, N={N}, flagship, one chip)\n")
        print("| precision | clouds/sec | ms/step |")
        print("|---|---|---|")
        for prec in ("highest", "high", "fast"):
            cps, ms = throughput(prec)
            print(f"| {prec} | {cps:.0f} | {ms:.1f} |", flush=True)


if __name__ == "__main__":
    main()
