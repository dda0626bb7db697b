"""Numerical parity against the reference PyTorch implementation.

The upstream repo (mounted read-only at /root/reference) runs on CPU
torch, so it serves as an executable oracle: weights are synchronized
from the torch modules into the flax params and outputs are compared
bitwise-tight. Skipped automatically when the reference tree or torch is
unavailable.

Covered: point coupling (direct+inverse, train+eval BN), latent coupling,
full prior/decoder stacks, the mixture NLL / prior NLL / entropy losses,
the Adam-AMSGrad update, the LR/beta2 schedule, the Chamfer fallback, and
the parameter-budget arithmetic.
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


# ---------------------------------------------------------------------- #
# weight sync helpers                                                    #
# ---------------------------------------------------------------------- #

def _t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def _bn_vars(bn, affine=True):
    out = {}
    params = {}
    if affine:
        params["scale"] = _t2n(bn.weight)
        params["bias"] = _t2n(bn.bias)
    out["params"] = params
    out["batch_stats"] = {
        "mean": _t2n(bn.running_mean),
        "var": _t2n(bn.running_var),
    }
    return out


def _film_vars(seq):
    """Reference FiLM MLP: [Linear no-bias, BN, Swish, Linear]."""
    lin0, bn, _, lin1 = seq[0], seq[1], seq[2], seq[3]
    bn_v = _bn_vars(bn)
    return (
        {
            "film0": {"kernel": _t2n(lin0.weight).T},
            "film0_bn": bn_v["params"],
            "film1": {"kernel": _t2n(lin1.weight).T,
                      "bias": _t2n(lin1.bias)},
        },
        {"film0_bn": bn_v["batch_stats"]},
    )


def _conditioner_vars(ref, prefix):
    """One mu/logvar conditioner head of CondRealNVPFlow3D."""
    t0 = getattr(ref, f"T_{prefix}_0")
    cw = getattr(ref, f"T_{prefix}_0_cond_w")
    cb = getattr(ref, f"T_{prefix}_0_cond_b")
    t1 = getattr(ref, f"T_{prefix}_1")
    bn0 = _bn_vars(t0[1])
    bn1 = _bn_vars(t0[4], affine=False)
    cw_p, cw_s = _film_vars(cw)
    cb_p, cb_s = _film_vars(cb)
    params = {
        "sd0": {"kernel": _t2n(t0[0].weight)[0]},
        "sd0_bn": bn0["params"],
        "sd1": {"kernel": _t2n(t0[3].weight)[0]},
        "sd1_bn": bn1["params"],
        "cond_w": cw_p,
        "cond_b": cb_p,
        "sd2": {"kernel": _t2n(t1[1].weight)[0],
                "bias": _t2n(t1[1].bias)[0]},
    }
    stats = {
        "sd0_bn": bn0["batch_stats"],
        "sd1_bn": bn1["batch_stats"],
        "cond_w": cw_s,
        "cond_b": cb_s,
    }
    return params, stats


def point_coupling_vars(ref):
    mu_p, mu_s = _conditioner_vars(ref, "mu")
    lv_p, lv_s = _conditioner_vars(ref, "logvar")
    return {
        "params": {"T_mu": mu_p, "T_logvar": lv_p},
        "batch_stats": {"T_mu": mu_s, "T_logvar": lv_s},
    }


def latent_coupling_vars(ref):
    def net(seq):
        lin0, bn, _, lin1 = seq[0], seq[1], seq[2], seq[3]
        bn_v = _bn_vars(bn)
        return (
            {
                "mlp0": {"kernel": _t2n(lin0.weight).T},
                "mlp0_bn": bn_v["params"],
                "mlp1": {"kernel": _t2n(lin1.weight).T,
                         "bias": _t2n(lin1.bias)},
            },
            {"mlp0_bn": bn_v["batch_stats"]},
        )

    mu_p, mu_s = net(ref.T_mu_0)
    lv_p, lv_s = net(ref.T_logvar_0)
    return {
        "params": {"T_mu": mu_p, "T_logvar": lv_p},
        "batch_stats": {"T_mu": mu_s, "T_logvar": lv_s},
    }


# ---------------------------------------------------------------------- #
# coupling-level parity                                                  #
# ---------------------------------------------------------------------- #

@pytest.mark.parametrize("mode", ["direct", "inverse"])
@pytest.mark.parametrize("warp", [(0,), (1, 2)])
def test_point_coupling_parity(mode, warp):
    import torch
    from lib.networks.flows import CondRealNVPFlow3D

    from go_with_the_flows_tpu.models.flows import CondAffineCoupling3D

    torch.manual_seed(0)
    F, G, B, N = 8, 12, 4, 16
    ref = CondRealNVPFlow3D(F, G, warp_inds=list(warp))
    # randomize BN running stats so eval mode is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.RandomState(1)
    p = rng.randn(B, 3, N).astype(np.float32)
    g = rng.randn(B, G).astype(np.float32)

    with torch.no_grad():
        p_ref, mu_ref, lv_ref = ref(
            torch.from_numpy(p), torch.from_numpy(g), mode=mode
        )

    mine = CondAffineCoupling3D(warp_inds=warp, f_features=F)
    variables = point_coupling_vars(ref)
    p_out, lv = mine.apply(
        variables, jnp.asarray(p), jnp.asarray(g), mode=mode, train=False
    )
    np.testing.assert_allclose(
        np.asarray(p_out), _t2n(p_ref), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(lv), _t2n(lv_ref), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("mode", ["direct", "inverse"])
def test_point_coupling_parity_train_bn(mode):
    """Train-mode BN (batch statistics) parity — the semantically
    load-bearing case (SURVEY.md §7 hard parts)."""
    import torch
    from lib.networks.flows import CondRealNVPFlow3D

    from go_with_the_flows_tpu.models.flows import CondAffineCoupling3D

    torch.manual_seed(2)
    F, G, B, N = 8, 12, 4, 16
    ref = CondRealNVPFlow3D(F, G, warp_inds=[1])
    ref.train()

    rng = np.random.RandomState(3)
    p = rng.randn(B, 3, N).astype(np.float32)
    g = rng.randn(B, G).astype(np.float32)
    with torch.no_grad():
        p_ref, _, lv_ref = ref(
            torch.from_numpy(p), torch.from_numpy(g), mode=mode
        )

    mine = CondAffineCoupling3D(warp_inds=(1,), f_features=F)
    variables = point_coupling_vars(ref)
    (p_out, lv), _ = mine.apply(
        variables, jnp.asarray(p), jnp.asarray(g), mode=mode, train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(p_out), _t2n(p_ref), rtol=5e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(lv), _t2n(lv_ref), rtol=5e-5, atol=1e-5
    )


@pytest.mark.parametrize("mode", ["direct", "inverse"])
def test_latent_coupling_parity(mode):
    import torch
    from lib.networks.flows import RealNVPFlow

    from go_with_the_flows_tpu.models.flows import LatentAffineCoupling

    torch.manual_seed(4)
    G, F, B = 10, 8, 5
    warp = list(range(0, G, 2))
    ref = RealNVPFlow(F, G, warp_inds=warp)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    rng = np.random.RandomState(5)
    g = rng.randn(B, G).astype(np.float32)
    with torch.no_grad():
        g_ref, _, lv_ref = ref(torch.from_numpy(g), mode=mode)

    mine = LatentAffineCoupling(
        g_features=G, n_features=F, warp_inds=tuple(warp)
    )
    variables = latent_coupling_vars(ref)
    g_out, lv = mine.apply(
        variables, jnp.asarray(g), mode=mode, train=False
    )
    np.testing.assert_allclose(
        np.asarray(g_out), _t2n(g_ref), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(lv), _t2n(lv_ref), rtol=2e-5, atol=2e-6
    )


# ---------------------------------------------------------------------- #
# stack-level parity                                                     #
# ---------------------------------------------------------------------- #

def test_decoder_stack_parity():
    """Full LocalCondRNVPDecoder vs PointDecoderFlow: final sample and the
    summed logvars (the log-det the loss consumes)."""
    import torch
    from lib.networks.decoders import LocalCondRNVPDecoder

    from go_with_the_flows_tpu.models.flows import PointDecoderFlow

    torch.manual_seed(6)
    n_flows, F, G, B, N = 3, 8, 12, 2, 16
    ref = LocalCondRNVPDecoder(n_flows, F, G)
    ref.eval()

    mine = PointDecoderFlow(n_flows=n_flows, f_features=F, g_features=G)
    params, stats = {}, {}
    for i in range(n_flows):
        triple = ref.flows[i]
        for j, nvp in enumerate([triple.nvp1, triple.nvp2, triple.nvp3]):
            v = point_coupling_vars(nvp)
            params[f"flow{i}_nvp{j + 1}"] = v["params"]
            stats[f"flow{i}_nvp{j + 1}"] = v["batch_stats"]
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(7)
    p = rng.randn(B, 3, N).astype(np.float32)
    g = rng.randn(B, G).astype(np.float32)

    for mode in ["direct", "inverse"]:
        with torch.no_grad():
            ps, mus, lvs = ref(
                torch.from_numpy(p), torch.from_numpy(g), mode=mode
            )
        ref_final = ps[-1] if mode == "direct" else ps[0]
        ref_lv_sum = sum(lvs)
        p_out, lv_sum = mine.apply(
            variables, jnp.asarray(p), jnp.asarray(g), mode=mode,
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(p_out), _t2n(ref_final), rtol=1e-4, atol=1e-5,
            err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(lv_sum), _t2n(ref_lv_sum), rtol=1e-4, atol=1e-5,
            err_msg=mode,
        )


def test_prior_stack_parity():
    import torch
    from lib.networks.decoders import GlobalRNVPDecoder

    from go_with_the_flows_tpu.models.flows import LatentPriorFlow

    torch.manual_seed(8)
    n_flows, F, G, B = 3, 8, 12, 4
    ref = GlobalRNVPDecoder(n_flows, F, G)
    ref.eval()

    mine = LatentPriorFlow(n_flows=n_flows, n_features=F, g_features=G)
    params, stats = {}, {}
    for i in range(n_flows):
        couple = ref.flows[i]
        for j, nvp in enumerate([couple.nvp1, couple.nvp2]):
            v = latent_coupling_vars(nvp)
            params[f"flow{i}_nvp{j + 1}"] = v["params"]
            stats[f"flow{i}_nvp{j + 1}"] = v["batch_stats"]
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(9)
    g = rng.randn(B, G).astype(np.float32)
    for mode in ["direct", "inverse"]:
        with torch.no_grad():
            gs, mus, lvs = ref(torch.from_numpy(g), mode=mode)
        ref_final = gs[-1] if mode == "direct" else gs[0]
        g_out, lv_sum = mine.apply(
            variables, jnp.asarray(g), mode=mode, train=False
        )
        np.testing.assert_allclose(
            np.asarray(g_out), _t2n(ref_final), rtol=1e-4, atol=1e-5,
            err_msg=mode,
        )
        np.testing.assert_allclose(
            np.asarray(lv_sum), _t2n(sum(lvs)), rtol=1e-4, atol=1e-5,
            err_msg=mode,
        )


# ---------------------------------------------------------------------- #
# loss parity                                                            #
# ---------------------------------------------------------------------- #

def test_mixture_nll_parity():
    """FlowMixtureNLL on random inputs: my vectorized (K,B,N) logsumexp vs
    the reference's python-loop implementation (losses.py:88-137)."""
    import torch
    from lib.networks.losses import FlowMixtureNLL

    from go_with_the_flows_tpu.losses import flow_mixture_nll

    rng = np.random.RandomState(10)
    K, B, C, N = 3, 4, 3, 17
    p0 = rng.randn(K, B, C, N).astype(np.float32)
    lv_layers = rng.randn(K, 2, B, C, N).astype(np.float32) * 0.1
    base_mu = rng.randn(B, C, 1).astype(np.float32)
    base_lv = rng.randn(B, C, 1).astype(np.float32) * 0.3
    logits = rng.randn(B, K).astype(np.float32)

    output_decoder = []
    for k in range(K):
        base_mu_full = np.broadcast_to(base_mu, (B, C, N))
        base_lv_full = np.broadcast_to(base_lv, (B, C, N))
        output_decoder.append({
            "p_prior_samples": [torch.from_numpy(p0[k])],
            "p_prior_mus": [torch.from_numpy(base_mu_full.copy())],
            "p_prior_logvars": [
                torch.from_numpy(base_lv_full.copy()),
                torch.from_numpy(lv_layers[k, 0]),
                torch.from_numpy(lv_layers[k, 1]),
            ],
        })
    with torch.no_grad():
        ref_val = FlowMixtureNLL()(
            output_decoder, torch.from_numpy(logits)
        )

    got = flow_mixture_nll(
        jnp.asarray(p0),
        jnp.asarray(lv_layers.sum(axis=1)),
        jnp.asarray(base_mu),
        jnp.asarray(base_lv),
        jnp.asarray(logits),
    )
    np.testing.assert_allclose(float(got), float(ref_val), rtol=1e-5)


def test_gaussian_losses_parity():
    import torch
    from lib.networks.losses import GaussianFlowNLL, GaussianEntropy

    from go_with_the_flows_tpu.losses import (
        gaussian_flow_nll, gaussian_entropy,
    )

    rng = np.random.RandomState(11)
    B, D = 5, 8
    s0 = rng.randn(B, D).astype(np.float32)
    mu0 = rng.randn(B, D).astype(np.float32)
    lv0 = rng.randn(B, D).astype(np.float32) * 0.2
    lv1 = rng.randn(B, D).astype(np.float32) * 0.2

    with torch.no_grad():
        ref_gnll = GaussianFlowNLL()(
            [torch.from_numpy(s0), torch.from_numpy(s0)],
            [torch.from_numpy(mu0)],
            [torch.from_numpy(lv0), torch.from_numpy(lv1)],
        )
        ref_gent = GaussianEntropy()(torch.from_numpy(lv0))

    got_gnll = gaussian_flow_nll(
        jnp.asarray(s0), jnp.asarray(mu0), jnp.asarray(lv0),
        jnp.asarray(lv0 + lv1),
    )
    got_gent = gaussian_entropy(jnp.asarray(lv0))
    np.testing.assert_allclose(float(got_gnll), float(ref_gnll), rtol=1e-5)
    np.testing.assert_allclose(float(got_gent), float(ref_gent), rtol=1e-5)


# ---------------------------------------------------------------------- #
# optimizer / schedule / metric / budget parity                          #
# ---------------------------------------------------------------------- #

def test_optimizer_parity():
    import torch
    from lib.networks.optimizers import Adam as RefAdam

    import optax
    from go_with_the_flows_tpu.optim import adam_amsgrad_decoupled_wd

    rng = np.random.RandomState(12)
    w0 = rng.randn(7).astype(np.float32)
    lr, wd = 1e-2, 1e-3

    ref_p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    ref_opt = RefAdam([ref_p], lr=lr, betas=(0.9, 0.99), eps=1e-8,
                      weight_decay=wd, amsgrad=True)

    opt = adam_amsgrad_decoupled_wd(lr=lr, b1=0.9, b2=0.99, eps=1e-8,
                                    weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)

    for step in range(5):
        g = rng.randn(7).astype(np.float32)
        ref_p.grad = torch.from_numpy(g.copy())
        ref_opt.step()
        deltas, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, deltas)
        np.testing.assert_allclose(
            np.asarray(params["w"]), _t2n(ref_p), rtol=1e-5, atol=1e-7,
            err_msg=f"step {step}",
        )


def test_schedule_parity():
    from lib.networks.optimizers import LRUpdater

    from go_with_the_flows_tpu.optim import cosine_cycle_schedule

    cfg = dict(cycle_length=7, min_lr=1e-4, max_lr=3e-3, beta1=0.9,
               min_beta2=0.9, max_beta2=0.99)
    L = 13
    ref = LRUpdater(L, **cfg)

    class FakeOpt:
        param_groups = [{"lr": 0.0, "betas": (0.0, 0.0)}]

    lr_sched = cosine_cycle_schedule(L, 7, 1e-4, 3e-3)
    b2_sched = cosine_cycle_schedule(L, 7, 0.9, 0.99)
    opt = FakeOpt()
    for step in [0, 1, 12, 13, 50, 90, 91]:
        epoch, it = divmod(step, L)
        ref(opt, epoch, it)
        np.testing.assert_allclose(
            float(lr_sched(step)), opt.param_groups[0]["lr"], rtol=1e-6
        )
        np.testing.assert_allclose(
            float(b2_sched(step)), opt.param_groups[0]["betas"][1],
            rtol=1e-6,
        )


def test_chamfer_parity_vs_torch_oracle():
    """Our Chamfer vs an independent torch cdist oracle (the reference's
    pure-torch distChamfer module can't be imported without its CUDA
    extension; evaluation_metrics.py:9 imports StructuralLosses at module
    scope)."""
    import torch

    from go_with_the_flows_tpu.ops.chamfer import chamfer

    rng = np.random.RandomState(13)
    a = rng.rand(3, 32, 3).astype(np.float32)
    b = rng.rand(3, 24, 3).astype(np.float32)
    with torch.no_grad():
        d = torch.cdist(torch.from_numpy(a), torch.from_numpy(b)) ** 2
        dl_ref = d.min(2).values
        dr_ref = d.min(1).values
    dl, dr = chamfer(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(dl), _t2n(dl_ref), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dr), _t2n(dr_ref), rtol=1e-4,
                               atol=1e-5)


def test_param_budget_parity():
    """reduce_decoder_params vs the reference's _get_decoder_params on a
    real Flow_Mixture_Model instance for every reduce mode."""
    import torch
    from lib.networks.flow_mixture import Flow_Mixture_Model

    from go_with_the_flows_tpu.models.mixture import reduce_decoder_params

    base = dict(
        train_mode="p_rnvp_mc_g_rnvp_vae", util_mode="training",
        deterministic=False, pc_enc_init_n_channels=3,
        pc_enc_init_n_features=16, pc_enc_n_features=[16, 32],
        g_latent_space_size=128, g_prior_n_flows=2,
        g_prior_n_features=16, g_posterior_n_layers=1,
        p_latent_space_size=3, p_prior_n_layers=1,
        p_decoder_n_flows=21, p_decoder_n_features=64,
        p_decoder_base_type="free", p_decoder_base_var=-3.9551,
        weights_type="learned_weights",
    )
    for mode in ["none", "depth_first", "feature_first",
                 "depth_and_feature"]:
        for k in [1, 2, 4]:
            ref = Flow_Mixture_Model(
                n_components=k, params_reduce_mode=mode, **base
            )
            got = reduce_decoder_params(k, mode, 21, 64, 128)
            want = ref._get_decoder_params()
            assert got == tuple(want), (mode, k, got, want)


def test_pointnet_encoder_parity():
    import torch
    from lib.networks.encoders import PointNetCloudEncoder as RefEnc

    from go_with_the_flows_tpu.models.encoders import PointNetCloudEncoder

    torch.manual_seed(14)
    ref = RefEnc(3, 8, [8, 16])
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    feats = ref.features
    # layout: [init_sd, init_sd_bn, relu, sd0, sd0_bn, relu, sd1, ...]
    def sd(mod):
        return {"kernel": _t2n(mod.weight)[0]}

    params = {
        "init_sd": sd(feats.init_sd),
        "init_sd_bn": _bn_vars(feats.init_sd_bn)["params"],
        "sd0": sd(feats.sd0),
        "sd0_bn": _bn_vars(feats.sd0_bn)["params"],
        "sd1": sd(feats.sd1),
        "sd1_bn": _bn_vars(feats.sd1_bn)["params"],
    }
    stats = {
        "init_sd_bn": _bn_vars(feats.init_sd_bn)["batch_stats"],
        "sd0_bn": _bn_vars(feats.sd0_bn)["batch_stats"],
        "sd1_bn": _bn_vars(feats.sd1_bn)["batch_stats"],
    }
    mine = PointNetCloudEncoder(8, (8, 16))

    rng = np.random.RandomState(15)
    x = rng.randn(3, 3, 24).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = mine.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), _t2n(want), rtol=2e-5,
                               atol=1e-5)


def test_feature_encoder_parity():
    import torch
    from lib.networks.encoders import FeatureEncoder as RefEnc

    from go_with_the_flows_tpu.models.encoders import FeatureEncoder

    torch.manual_seed(16)
    ref = RefEnc(2, 12, 6, deterministic=False)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    params = {
        "mlp0": {"kernel": _t2n(ref.features.mlp0.weight).T},
        "mlp0_bn": _bn_vars(ref.features.mlp0_bn)["params"],
        "mlp1": {"kernel": _t2n(ref.features.mlp1.weight).T},
        "mlp1_bn": _bn_vars(ref.features.mlp1_bn)["params"],
        "mu_head": {"kernel": _t2n(ref.mus.mu_mlp0.weight).T,
                    "bias": _t2n(ref.mus.mu_mlp0.bias)},
        "logvar_head": {"kernel": _t2n(ref.logvars.logvar_mlp0.weight).T,
                        "bias": _t2n(ref.logvars.logvar_mlp0.bias)},
    }
    stats = {
        "mlp0_bn": _bn_vars(ref.features.mlp0_bn)["batch_stats"],
        "mlp1_bn": _bn_vars(ref.features.mlp1_bn)["batch_stats"],
    }
    mine = FeatureEncoder(n_layers=2, latent_space_size=6,
                          deterministic=False)

    rng = np.random.RandomState(17)
    x = rng.randn(5, 12).astype(np.float32)
    with torch.no_grad():
        mu_ref, lv_ref = ref(torch.from_numpy(x))
    mu, lv = mine.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(mu), _t2n(mu_ref), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv), _t2n(lv_ref), rtol=2e-5,
                               atol=1e-6)


def test_weights_encoder_parity():
    import torch
    from lib.networks.encoders import WeightsEncoder as RefEnc

    from go_with_the_flows_tpu.models.encoders import WeightsEncoder

    torch.manual_seed(18)
    ref = RefEnc(1, 12, 4, deterministic=True)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    params = {"features": {
        "mlp0": {"kernel": _t2n(ref.features.mlp0.weight).T},
        "mlp0_bn": _bn_vars(ref.features.mlp0_bn)["params"],
        "mu_head": {"kernel": _t2n(ref.mus.mu_mlp0.weight).T,
                    "bias": _t2n(ref.mus.mu_mlp0.bias)},
    }}
    stats = {"features": {
        "mlp0_bn": _bn_vars(ref.features.mlp0_bn)["batch_stats"],
    }}
    mine = WeightsEncoder(n_layers=1, n_components=4)

    rng = np.random.RandomState(19)
    x = rng.randn(5, 12).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = mine.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), _t2n(want), rtol=2e-5,
                               atol=1e-6)
