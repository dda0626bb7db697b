"""Convert reference PyTorch checkpoints into flax variable trees.

The reference saves ``torch.save({'epoch','iter','model_state',
'optimizer_state'}, path, pickle_protocol=4)`` (reference
lib/networks/utils.py:25-27). ``model_state`` is a flat state_dict whose
dotted key structure follows the module tree of
``Flow_Mixture_Model`` / ``Flow_Mixture_SVR_Model``
(lib/networks/flow_mixture.py:27-42,188-195 and lib/networks/models.py:62-97).
This module maps that state_dict, key by key, onto the flax
``{"params", "batch_stats"}`` trees of
:class:`~go_with_the_flows_tpu.models.mixture.FlowMixtureModel`.

Used by ``tools/import_torch_ckpt.py`` (CLI) and the on-TPU parity audit;
the weight-synced parity tests (tests/test_reference_parity.py) provide
the per-component ground truth for these mappings.

All functions take a *getter* ``g(name) -> np.ndarray`` over state_dict
keys, so they work with torch tensors and numpy alike.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

Getter = Callable[[str], np.ndarray]


def make_getter(state_dict) -> Getter:
    """Getter over a torch state_dict (tensors or numpy arrays)."""

    def g(name: str) -> np.ndarray:
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    g.keys = lambda: state_dict.keys()
    return g


def _bn(g: Getter, prefix: str, affine: bool = True):
    params = {}
    if affine:
        params = {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}
    stats = {
        "mean": g(f"{prefix}.running_mean"),
        "var": g(f"{prefix}.running_var"),
    }
    return params, stats


def _film(g: Getter, prefix: str, short: str):
    """FiLM MLP: Sequential({short}0 Linear no-bias, {short}0_bn BN,
    swish, {short}1 Linear) — reference flows.py:33-45."""
    bn_p, bn_s = _bn(g, f"{prefix}.{short}0_bn")
    params = {
        "film0": {"kernel": g(f"{prefix}.{short}0.weight").T},
        "film0_bn": bn_p,
        "film1": {
            "kernel": g(f"{prefix}.{short}1.weight").T,
            "bias": g(f"{prefix}.{short}1.bias"),
        },
    }
    return params, {"film0_bn": bn_s}


def _point_conditioner(g: Getter, prefix: str, head: str):
    """One mu/logvar conditioner of CondRealNVPFlow3D
    (reference flows.py:25-58)."""
    t0 = f"{prefix}.T_{head}_0"
    bn0_p, bn0_s = _bn(g, f"{t0}.{head}_sd0_bn")
    _, bn1_s = _bn(g, f"{t0}.{head}_sd1_bn", affine=False)
    cw_p, cw_s = _film(g, f"{prefix}.T_{head}_0_cond_w", f"{head}_sd1_film_w")
    cb_p, cb_s = _film(g, f"{prefix}.T_{head}_0_cond_b", f"{head}_sd1_film_b")
    # sd1_bn is affine=False: it owns batch_stats but no params
    params = {
        "sd0": {"kernel": g(f"{t0}.{head}_sd0.weight")[0]},
        "sd0_bn": bn0_p,
        "sd1": {"kernel": g(f"{t0}.{head}_sd1.weight")[0]},
        "cond_w": cw_p,
        "cond_b": cb_p,
        "sd2": {
            "kernel": g(f"{prefix}.T_{head}_1.{head}_sd2.weight")[0],
            "bias": g(f"{prefix}.T_{head}_1.{head}_sd2.bias")[0],
        },
    }
    stats = {
        "sd0_bn": bn0_s,
        "sd1_bn": bn1_s,
        "cond_w": cw_s,
        "cond_b": cb_s,
    }
    return params, stats


def point_coupling_from_sd(g: Getter, prefix: str):
    """CondRealNVPFlow3D at `prefix` -> CondAffineCoupling3D variables."""
    mu_p, mu_s = _point_conditioner(g, prefix, "mu")
    lv_p, lv_s = _point_conditioner(g, prefix, "logvar")
    return (
        {"T_mu": mu_p, "T_logvar": lv_p},
        {"T_mu": mu_s, "T_logvar": lv_s},
    )


def latent_coupling_from_sd(g: Getter, prefix: str):
    """RealNVPFlow at `prefix` -> LatentAffineCoupling variables
    (reference flows.py:175-193)."""

    def head(h):
        t0 = f"{prefix}.T_{h}_0"
        bn_p, bn_s = _bn(g, f"{t0}.{h}_mlp0_bn")
        params = {
            "mlp0": {"kernel": g(f"{t0}.{h}_mlp0.weight").T},
            "mlp0_bn": bn_p,
            "mlp1": {
                "kernel": g(f"{t0}.{h}_mlp1.weight").T,
                "bias": g(f"{t0}.{h}_mlp1.bias"),
            },
        }
        return params, {"mlp0_bn": bn_s}

    mu_p, mu_s = head("mu")
    lv_p, lv_s = head("logvar")
    return (
        {"T_mu": mu_p, "T_logvar": lv_p},
        {"T_mu": mu_s, "T_logvar": lv_s},
    )


def point_decoder_from_sd(g: Getter, prefix: str, n_flows: int):
    """LocalCondRNVPDecoder at `prefix` -> PointDecoderFlow (unrolled
    layout: flow{i}_nvp{1..3} — reference decoders.py:49-52)."""
    params, stats = {}, {}
    for i in range(n_flows):
        for j in (1, 2, 3):
            p, s = point_coupling_from_sd(g, f"{prefix}.flows.{i}.nvp{j}")
            params[f"flow{i}_nvp{j}"] = p
            stats[f"flow{i}_nvp{j}"] = s
    return params, stats


def latent_prior_from_sd(g: Getter, prefix: str, n_flows: int):
    """GlobalRNVPDecoder at `prefix` -> LatentPriorFlow
    (reference decoders.py:15-18)."""
    params, stats = {}, {}
    for i in range(n_flows):
        for j in (1, 2):
            p, s = latent_coupling_from_sd(g, f"{prefix}.flows.{i}.nvp{j}")
            params[f"flow{i}_nvp{j}"] = p
            stats[f"flow{i}_nvp{j}"] = s
    return params, stats


def feature_encoder_from_sd(
    g: Getter, prefix: str, n_layers: int, deterministic: bool
):
    """FeatureEncoder at `prefix` (reference encoders.py:31-83)."""
    params, stats = {}, {}
    for i in range(n_layers):
        params[f"mlp{i}"] = {
            "kernel": g(f"{prefix}.features.mlp{i}.weight").T
        }
        bn_p, bn_s = _bn(g, f"{prefix}.features.mlp{i}_bn")
        params[f"mlp{i}_bn"] = bn_p
        stats[f"mlp{i}_bn"] = bn_s
    params["mu_head"] = {
        "kernel": g(f"{prefix}.mus.mu_mlp0.weight").T,
        "bias": g(f"{prefix}.mus.mu_mlp0.bias"),
    }
    if not deterministic:
        params["logvar_head"] = {
            "kernel": g(f"{prefix}.logvars.logvar_mlp0.weight").T,
            "bias": g(f"{prefix}.logvars.logvar_mlp0.bias"),
        }
    return params, stats


def weights_encoder_from_sd(g: Getter, prefix: str, n_layers: int = 3):
    """WeightsEncoder at `prefix` (reference encoders.py:85-89; a
    deterministic FeatureEncoder wrapped under flax name 'features')."""
    p, s = feature_encoder_from_sd(g, prefix, n_layers, deterministic=True)
    return {"features": p}, {"features": s}


def pointnet_from_sd(g: Getter, prefix: str, n_stages: int):
    """PointNetCloudEncoder at `prefix` (reference encoders.py:9-28)."""
    params, stats = {}, {}

    def sd_bn(name):
        params[name] = {"kernel": g(f"{prefix}.features.{name}.weight")[0]}
        bn_p, bn_s = _bn(g, f"{prefix}.features.{name}_bn")
        params[f"{name}_bn"] = bn_p
        stats[f"{name}_bn"] = bn_s

    sd_bn("init_sd")
    for i in range(n_stages):
        sd_bn(f"sd{i}")
    return params, stats


def resnet18_from_sd(g: Getter, prefix: str):
    """torchvision-style ResNet-18 with 4-ch input + fc_bn head
    (reference resnet.py:118-224)."""
    pre = f"{prefix}." if prefix else ""

    def conv(name):
        return {"kernel": np.transpose(g(f"{pre}{name}.weight"), (2, 3, 1, 0))}

    params, stats = {}, {}
    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = _bn(g, f"{pre}bn1")
    # stage sizes of resnet18: 2 blocks per layer
    for li in range(1, 5):
        for bi in range(2):
            bpre = f"{pre}layer{li}.{bi}"
            p = {
                "conv1": conv(f"layer{li}.{bi}.conv1"),
                "conv2": conv(f"layer{li}.{bi}.conv2"),
            }
            s = {}
            p["bn1"], s["bn1"] = _bn(g, f"{bpre}.bn1")
            p["bn2"], s["bn2"] = _bn(g, f"{bpre}.bn2")
            if f"{bpre}.downsample.0.weight" in g.keys():
                p["downsample_conv"] = conv(f"layer{li}.{bi}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _bn(
                    g, f"{bpre}.downsample.1"
                )
            params[f"layer{li}_{bi}"] = p
            stats[f"layer{li}_{bi}"] = s
    params["fc"] = {
        "kernel": g(f"{pre}fc.weight").T,
        "bias": g(f"{pre}fc.bias"),
    }
    params["fc_bn"], stats["fc_bn"] = _bn(g, f"{pre}fc_bn")
    return params, stats


def _stack_trees(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def mixture_variables_from_state_dict(
    state_dict,
    config: Dict,
    svr: bool = False,
    scan_couplings: bool = True,
) -> Dict:
    """Full Flow_Mixture_Model / Flow_Mixture_SVR_Model state_dict ->
    FlowMixtureModel variables {'params', 'batch_stats'}.

    `config` needs the reference YAML model keys (n_components,
    params_reduce_mode, *_n_flows/features/layers, p_decoder_base_type,
    pc_enc_n_features, g_latent_space_size).
    """
    from ..models.mixture import reduce_decoder_params
    from ..models.flows import unrolled_to_scanned_params

    g = make_getter(state_dict)
    depth, _ = reduce_decoder_params(
        config["n_components"],
        config["params_reduce_mode"],
        config["p_decoder_n_flows"],
        config["p_decoder_n_features"],
        config["g_latent_space_size"],
    )

    params: Dict = {}
    stats: Dict = {}

    params["pc_encoder"], stats["pc_encoder"] = pointnet_from_sd(
        g, "pc_encoder", len(config["pc_enc_n_features"])
    )
    params["g0_prior_mus"] = g("g0_prior_mus")
    params["g0_prior_logvars"] = g("g0_prior_logvars")
    params["g_prior"], stats["g_prior"] = latent_prior_from_sd(
        g, "g_prior", config["g_prior_n_flows"]
    )
    params["g_posterior"], stats["g_posterior"] = feature_encoder_from_sd(
        g, "g_posterior", config["g_posterior_n_layers"], deterministic=False
    )
    base_type = config.get("p_decoder_base_type", "free")
    if base_type in ("free", "freevar"):
        params["p_prior"], stats["p_prior"] = feature_encoder_from_sd(
            g, "p_prior", config["p_prior_n_layers"],
            deterministic=(base_type == "freevar"),
        )

    K = config["n_components"]
    dec_p, dec_s = [], []
    for k in range(K):
        p, s = point_decoder_from_sd(g, f"pc_decoder.{k}", depth)
        if scan_couplings:
            p = unrolled_to_scanned_params(p, depth)
            s = unrolled_to_scanned_params(s, depth)
        dec_p.append(p)
        dec_s.append(s)
    params["pc_decoder"] = _stack_trees(dec_p)
    stats["pc_decoder"] = _stack_trees(dec_s)

    params["mixture_weights_logits"] = g("mixture_weights_logits")
    (
        params["mixture_weights_encoder"],
        stats["mixture_weights_encoder"],
    ) = weights_encoder_from_sd(g, "mixture_weights_encoder", n_layers=3)

    if svr:
        params["img_encoder"], stats["img_encoder"] = resnet18_from_sd(
            g, "img_encoder"
        )
        params["g0_prior"], stats["g0_prior"] = feature_encoder_from_sd(
            g, "g0_prior", config.get("g_prior_n_layers", 1),
            deterministic=False,
        )

    return {"params": params, "batch_stats": stats}
