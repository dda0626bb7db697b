"""Full-model torch->flax checkpoint conversion parity.

Builds a randomly initialized reference Flow_Mixture_Model (torch, CPU),
converts its state_dict with utils.torch_import, and checks the converted
FlowMixtureModel reproduces the reference's deterministic paths exactly:
autoencoding encode (posterior mean -> prior inverse) and the training
decode (all K components invert the full cloud). Also round-trips the
tools/import_torch_ckpt.py CLI through orbax.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REFERENCE, "lib"))
try:
    import torch  # noqa: F401

    HAVE_TORCH = True
except Exception:
    HAVE_TORCH = False

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (HAVE_REF and HAVE_TORCH),
    reason="reference repo or torch unavailable",
)]

if HAVE_REF:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp

TINY_CONFIG = dict(
    train_mode="p_rnvp_mc_g_rnvp_vae",
    util_mode="training",
    deterministic=False,
    n_components=2,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    pc_enc_init_n_channels=3,
    pc_enc_init_n_features=8,
    pc_enc_n_features=[8, 16],
    g_latent_space_size=16,
    g_prior_n_flows=2,
    g_prior_n_features=8,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=3,
    p_decoder_n_features=8,
    p_decoder_base_type="free",
    p_decoder_base_var=-3.9551,
)


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy())


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from lib.networks.flow_mixture import Flow_Mixture_Model

    torch.manual_seed(100)
    ref = Flow_Mixture_Model(**TINY_CONFIG)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()
    return ref


def _flax_model(scan):
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.utils.config import model_config_kwargs

    kwargs = model_config_kwargs(TINY_CONFIG)
    kwargs["scan_couplings"] = scan
    return FlowMixtureModel(**kwargs)


@pytest.mark.parametrize("scan", [False, True])
def test_converted_model_matches_reference(ref_model, scan):
    import torch

    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )

    variables = mixture_variables_from_state_dict(
        ref_model.state_dict(), TINY_CONFIG, scan_couplings=scan
    )
    variables = jax.tree.map(jnp.asarray, variables)
    model = _flax_model(scan)

    rng = np.random.RandomState(101)
    B, N = 3, 32
    g_in = rng.randn(B, 3, N).astype(np.float32)
    p_in = rng.randn(B, 3, N).astype(np.float32)

    # --- encode, autoencoding mode (deterministic: posterior mean) ------
    ref_model.mode = "autoencoding"
    with torch.no_grad():
        ref_enc = ref_model.encode(torch.from_numpy(g_in))
    got_enc = model.apply(
        variables, jnp.asarray(g_in), "autoencoding", train=False,
        method="encode",
    )
    np.testing.assert_allclose(
        np.asarray(got_enc["g_sample"]),
        _t2n(ref_enc["g_posterior_samples"]), rtol=5e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_enc["g0_sample"]),
        _t2n(ref_enc["g_prior_samples"][0]), rtol=5e-5, atol=1e-5,
    )
    ref_lv_sum = _t2n(sum(ref_enc["g_prior_logvars"]))
    np.testing.assert_allclose(
        np.asarray(got_enc["g_prior_logvar_sum"]), ref_lv_sum,
        rtol=5e-5, atol=1e-5,
    )

    # --- training decode (deterministic: every component inverts p) -----
    g_sample = _t2n(ref_enc["g_posterior_samples"])
    ref_model.mode = "training"
    with torch.no_grad():
        ref_dec, ref_logits = ref_model.decode(
            torch.from_numpy(p_in), torch.from_numpy(g_sample),
            n_sampled_points=N,
        )
    got_dec = model.apply(
        variables, jnp.asarray(p_in), jnp.asarray(g_sample), False,
        False, method="decode_training",
    )
    np.testing.assert_allclose(
        np.asarray(got_dec["mixture_weights_logits"]), _t2n(ref_logits),
        rtol=5e-5, atol=1e-5,
    )
    for k in range(TINY_CONFIG["n_components"]):
        np.testing.assert_allclose(
            np.asarray(got_dec["p0_samples"][k]),
            _t2n(ref_dec[k]["p_prior_samples"][0]),
            rtol=5e-5, atol=1e-5, err_msg=f"component {k}",
        )
        ref_flow_lv = _t2n(sum(ref_dec[k]["p_prior_logvars"][1:]))
        np.testing.assert_allclose(
            np.asarray(got_dec["p_logvar_sums"][k]), ref_flow_lv,
            rtol=5e-5, atol=1e-5, err_msg=f"component {k}",
        )
        np.testing.assert_allclose(
            np.asarray(got_dec["p_base_mus"]),
            _t2n(ref_dec[k]["p_prior_mus"][0])[:, :, :1],
            rtol=5e-5, atol=1e-5,
        )


def test_import_cli_roundtrip(ref_model, tmp_path):
    """torch.save payload -> import CLI -> orbax restore -> same forward."""
    import torch
    import yaml

    sys.path.insert(0, "/root/repo")
    from tools.import_torch_ckpt import main as import_main
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.checkpoints import restore_checkpoint
    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )

    ckpt = tmp_path / "ref_model.pkl"
    torch.save(
        {
            "epoch": 7,
            "iter": 13,
            "model_state": ref_model.state_dict(),
            "optimizer_state": {},
        },
        str(ckpt), pickle_protocol=4,
    )
    cfg_path = tmp_path / "config.yaml"
    config = dict(
        TINY_CONFIG, cloud_size=32,
        cycle_length=1, min_lr=1e-4, max_lr=1e-3, beta1=0.9,
        min_beta2=0.99, max_beta2=0.99, wd=0.0,
    )
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    out_dir = tmp_path / "exp"
    import_main([str(ckpt), str(cfg_path), str(out_dir)])

    model = _flax_model(scan=True)
    rng = np.random.RandomState(0)
    batch = {
        "cloud": rng.randn(2, 3, 32).astype(np.float32),
        "eval_cloud": rng.randn(2, 3, 32).astype(np.float32),
    }
    optimizer = make_optimizer(
        epoch_length=100, cycle_length=1, min_lr=1e-4, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=0.0,
    )
    template = create_train_state(
        model, jax.random.PRNGKey(0), batch, optimizer
    )
    state, epoch, iteration = restore_checkpoint(
        str(out_dir), "model.ckpt", template
    )
    assert (epoch, iteration) == (7, 13)

    want = mixture_variables_from_state_dict(
        ref_model.state_dict(), TINY_CONFIG, scan_couplings=True
    )
    got_leaves = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    want_leaves = jax.tree.leaves(want["params"])
    assert len(got_leaves) == len(want_leaves)
    for a, b in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_pretrained_checkpoint_to_metrics_e2e(ref_model, tmp_path):
    """The published-pretrained-model user path, end to end: a checkpoint
    written by the REFERENCE'S OWN save_model (lib/networks/utils.py:25-27)
    -> tools/import_torch_ckpt.py -> our restore -> autoencoding
    reconstructions -> CD/EMD at metric level vs the torch model itself.

    The mixture's eval decode draws per-point component assignments and
    base noise (different RNG streams in torch vs JAX), so the comparison
    is statistical: the torch side runs twice with independent seeds to
    calibrate the natural rep-to-rep spread, and the JAX numbers must sit
    within 3x that spread (floor 2%)."""
    import torch
    import yaml

    # lib/networks/utils.py imports the compiled CUDA extension at module
    # scope (StructuralLosses); stub it so save_model (a pure torch.save,
    # utils.py:25-27) is importable on this CUDA-less host
    import types

    if "lib.metrics.StructuralLosses.nn_distance" not in sys.modules:
        stub = types.ModuleType("lib.metrics.StructuralLosses.nn_distance")
        stub.nn_distance = None
        sys.modules.setdefault("lib.metrics.StructuralLosses",
                               types.ModuleType(
                                   "lib.metrics.StructuralLosses"))
        sys.modules["lib.metrics.StructuralLosses.nn_distance"] = stub
    from lib.networks.utils import save_model  # the reference's writer

    sys.path.insert(0, "/root/repo")
    from tools.import_torch_ckpt import main as import_main
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.ops.chamfer import chamfer
    from go_with_the_flows_tpu.ops.emd import match_cost
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.checkpoints import restore_checkpoint
    from go_with_the_flows_tpu.train.step import make_sample_step
    from go_with_the_flows_tpu.utils.config import model_config_kwargs

    B, N = 4, 512
    rng = np.random.RandomState(7)
    g_in = (rng.randn(B, 3, N) * 0.3).astype(np.float32)
    p_in = (rng.randn(B, 3, N) * 0.3).astype(np.float32)

    # 1. checkpoint via the reference's own save_model ------------------
    ckpt = str(tmp_path / "published.pkl")
    save_model(
        {"epoch": 3, "iter": 0, "model_state": ref_model.state_dict(),
         "optimizer_state": {}},
        ckpt,
    )

    # 2. import into an experiment dir ----------------------------------
    exp_dir = tmp_path / "exp"
    cfg = dict(
        TINY_CONFIG, cloud_size=N, cycle_length=1, min_lr=1e-4,
        max_lr=1e-3, beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=0.0,
    )
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    import_main([ckpt, str(cfg_path), str(exp_dir)])

    # 3. torch-side reconstructions, twice (spread calibration) ---------
    def torch_metrics(seed):
        torch.manual_seed(seed)
        ref_model.mode = "autoencoding"
        outs = []
        with torch.no_grad():  # eval decode asserts batch == 1
            for b in range(B):
                _, samples, _, _ = ref_model(
                    torch.from_numpy(g_in[b:b + 1]),
                    torch.from_numpy(p_in[b:b + 1]),
                    n_sampled_points=N, labeled_samples=True,
                )
                outs.append(_t2n(samples))
        recon = np.concatenate(outs).transpose(0, 2, 1)  # (B, N, 3)
        ref_pts = p_in.transpose(0, 2, 1)
        dl, dr = chamfer(jnp.asarray(recon), jnp.asarray(ref_pts))
        cd = float((jnp.mean(dl, 1) + jnp.mean(dr, 1)).mean())
        emd = float(
            (match_cost(jnp.asarray(recon), jnp.asarray(ref_pts)) / N)
            .mean()
        )
        return cd, emd

    cd_a, emd_a = torch_metrics(11)
    cd_b, emd_b = torch_metrics(23)

    # 4. JAX side from the imported checkpoint --------------------------
    kwargs = model_config_kwargs(TINY_CONFIG)
    kwargs["scan_couplings"] = True
    model = FlowMixtureModel(**kwargs)
    optimizer = make_optimizer(
        epoch_length=100, cycle_length=1, min_lr=1e-4, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=0.0,
    )
    template = create_train_state(
        model, jax.random.PRNGKey(0),
        {"cloud": g_in, "eval_cloud": p_in}, optimizer,
    )
    state, _, _ = restore_checkpoint(str(exp_dir), "model.ckpt", template)
    sample_step = make_sample_step(model, n_sampled_points=N,
                                   mode="autoencoding")
    samples, _, _ = sample_step(state, jnp.asarray(g_in),
                                jax.random.PRNGKey(5))
    recon = np.asarray(samples).transpose(0, 2, 1)
    ref_pts = p_in.transpose(0, 2, 1)
    dl, dr = chamfer(jnp.asarray(recon), jnp.asarray(ref_pts))
    cd_j = float((jnp.mean(dl, 1) + jnp.mean(dr, 1)).mean())
    emd_j = float(
        (match_cost(jnp.asarray(recon), jnp.asarray(ref_pts)) / N).mean()
    )

    for name, a, b, j in (("CD", cd_a, cd_b, cd_j),
                          ("EMD", emd_a, emd_b, emd_j)):
        mid = 0.5 * (a + b)
        spread = abs(a - b)
        tol = max(3.0 * spread, 0.02 * mid)
        assert abs(j - mid) <= tol, (
            f"{name}: jax {j} vs torch {a}/{b} (tol {tol})"
        )
