"""Losses for the flow-mixture VAE.

Vectorized TPU-native re-implementation of the reference's
`lib/networks/losses.py`. The reference computes the mixture NLL with a
host-side Python loop over batch elements and components
(losses.py:107-135); here it is one (K, B, N) logsumexp. The formulas are
numerically identical (same sums, same constants, same reductions).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_flow_nll(
    g0_sample: jax.Array,
    g_prior_mus0: jax.Array,
    g_prior_logvars0: jax.Array,
    g_prior_logvar_sum: jax.Array,
) -> jax.Array:
    """Prior-flow NLL (reference losses.py:23-31, GaussianFlowNLL):

        0.5 * [ sum_{b,d}(logvar_sum + (s0-mu0)^2 / exp(logvar0)) / B
                + D * log(2*pi) ]

    where logvar_sum is the sum of the base logvars and every coupling's
    logvars (the reference's `sum(logvars)` over its list).
    """
    B, D = g0_sample.shape
    quad = (g0_sample - g_prior_mus0) ** 2 / jnp.exp(g_prior_logvars0)
    return 0.5 * (jnp.sum(g_prior_logvar_sum + quad) / B + D * _LOG_2PI)


def gaussian_entropy(posterior_logvars: jax.Array) -> jax.Array:
    """Posterior Gaussian entropy (reference losses.py:34-39):
    0.5 * (D * (1 + log 2pi) + mean_b sum_d logvars)."""
    D = posterior_logvars.shape[1]
    return 0.5 * (
        D * (1.0 + _LOG_2PI) + jnp.mean(jnp.sum(posterior_logvars, axis=1))
    )


def flow_mixture_nll(
    p0_samples: jax.Array,  # (K, B, C, N) inverse-decoded base-level points
    p_logvar_sums: jax.Array,  # (K, B, C, N) per-component flow logvar sums
    p_base_mus: jax.Array,  # (B, C, 1) shared base mean
    p_base_logvars: jax.Array,  # (B, C, 1) shared base logvar
    mixture_weights_logits: jax.Array,  # (B, K)
) -> jax.Array:
    """Mixture decoder NLL (reference losses.py:81-137, FlowMixtureNLL),
    vectorized:

      log p_k(x_n) = -0.5 * ( sum_c [ logdet_sum + (s - mu)^2/exp(logvar0) ]
                              + C * log 2pi )
      NLL = -mean_b sum_n logsumexp_k( log_w[b,k] + log p_k(x_n) )

    where logdet_sum per component includes the base logvar
    (the reference's `sum(p_prior_logvars)` list sums base + couplings,
    models.py:198-205 + losses.py:115).
    """
    K, B, C, N = p0_samples.shape
    log_w = jax.nn.log_softmax(mixture_weights_logits, axis=-1)  # (B, K)

    logdet = p_logvar_sums + p_base_logvars[None]  # (K, B, C, N)
    quad = (p0_samples - p_base_mus[None]) ** 2 / jnp.exp(
        p_base_logvars[None]
    )
    comp_logp = -0.5 * (
        jnp.sum(logdet + quad, axis=2) + C * _LOG_2PI
    )  # (K, B, N)

    weighted = comp_logp + jnp.transpose(log_w)[:, :, None]  # (K, B, N)
    logp = jax.scipy.special.logsumexp(weighted, axis=0)  # (B, N)
    return -jnp.mean(jnp.sum(logp, axis=1))


def flow_mixture_loss(
    outputs: Dict[str, jax.Array],
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss (reference losses.py:140-173, Flow_Mixture_Loss):
    pnll_w * PNLL + gnll_w * GNLL - gent_w * GENT.

    `outputs` is the training-mode output dict of FlowMixtureModel.
    """
    pnll = flow_mixture_nll(
        outputs["p0_samples"],
        outputs["p_logvar_sums"],
        outputs["p_base_mus"],
        outputs["p_base_logvars"],
        outputs["mixture_weights_logits"],
    )
    gnll = gaussian_flow_nll(
        outputs["g0_sample"],
        outputs["g_prior_mus0"],
        outputs["g_prior_logvars0"],
        outputs["g_prior_logvar_sum"],
    )
    gent = gaussian_entropy(outputs["g_posterior_logvars"])
    loss = pnll_weight * pnll + gnll_weight * gnll - gent_weight * gent
    return loss, {"loss": loss, "pnll": pnll, "gnll": gnll, "gent": gent}


def point_flow_nll(
    p0_sample: jax.Array,  # (B, C, N) base-level points of ONE flow
    p_logvar_sum: jax.Array,  # (B, C, N) flow logvar sum incl. base
    p_base_mus: jax.Array,  # (B, C, 1)
    p_base_logvars: jax.Array,  # (B, C, 1)
) -> jax.Array:
    """Legacy single-flow per-point NLL (reference losses.py:7-20,
    PointFlowNLL) — the DPF loss the mixture generalizes. Returns the
    per-point (B, 1, N) negative log-likelihoods (reference keeps the
    keepdim=1 channel axis)."""
    quad = (p0_sample - p_base_mus) ** 2 / jnp.exp(p_base_logvars)
    C = p0_sample.shape[1]
    return 0.5 * (
        jnp.sum(p_logvar_sum + quad, axis=1, keepdims=True)
        + C * _LOG_2PI
    )


def single_flow_vae_loss(
    outputs: Dict[str, jax.Array],
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Legacy DPF loss (reference losses.py:42-56,
    Local_Cond_RNVP_MC_Global_RNVP_VAE_Loss): summed single-flow PNLL +
    GNLL - GENT. Works on the K=1 mixture output dict."""
    pnll = jnp.sum(
        point_flow_nll(
            outputs["p0_samples"][0],
            outputs["p_logvar_sums"][0],
            outputs["p_base_mus"],
            outputs["p_base_logvars"],
        )
    )
    gnll = gaussian_flow_nll(
        outputs["g0_sample"], outputs["g_prior_mus0"],
        outputs["g_prior_logvars0"], outputs["g_prior_logvar_sum"],
    )
    gent = gaussian_entropy(outputs["g_posterior_logvars"])
    loss = pnll_weight * pnll + gnll_weight * gnll - gent_weight * gent
    return loss, {"loss": loss, "pnll": pnll, "gnll": gnll, "gent": gent}
