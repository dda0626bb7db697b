"""Loss tests: the vectorized mixture NLL must match a naive per-batch,
per-component numpy loop implementing the reference formulas
(losses.py:88-137) verbatim."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from go_with_the_flows_tpu.losses import (
    flow_mixture_nll,
    gaussian_flow_nll,
    gaussian_entropy,
)

LOG2PI = math.log(2.0 * math.pi)


def _naive_mixture_nll(p0, lv_sums, base_mu, base_lv, logits):
    """Direct transcription of the reference math (losses.py:100-137):
    python loops over batch and components."""
    K, B, C, N = p0.shape
    # log weights: logits - logsumexp (== log_softmax)
    log_w = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    total = []
    for b in range(B):
        comp = []  # (K, N) log prob of each point under each component
        for k in range(K):
            logdet = lv_sums[k, b] + base_lv[b]  # (C, N)
            quad = (p0[k, b] - base_mu[b]) ** 2 / np.exp(base_lv[b])
            part1 = -(logdet + quad).sum(axis=0)  # (N,)
            part2 = -LOG2PI * C
            comp.append(0.5 * (part1 + part2))
        comp = np.stack(comp, axis=0)  # (K, N)
        weighted = comp + log_w[b][:, None]
        m = weighted.max(axis=0)
        lse = m + np.log(np.exp(weighted - m).sum(axis=0))
        total.append(-lse.sum())
    return np.mean(total)


def test_mixture_nll_matches_naive_loop():
    rng = np.random.RandomState(0)
    K, B, C, N = 3, 4, 3, 17
    p0 = rng.randn(K, B, C, N).astype(np.float32)
    lv_sums = rng.randn(K, B, C, N).astype(np.float32) * 0.1
    base_mu = rng.randn(B, C, 1).astype(np.float32)
    base_lv = rng.randn(B, C, 1).astype(np.float32) * 0.3
    logits = rng.randn(B, K).astype(np.float32)

    got = float(
        flow_mixture_nll(
            jnp.array(p0), jnp.array(lv_sums), jnp.array(base_mu),
            jnp.array(base_lv), jnp.array(logits),
        )
    )
    want = _naive_mixture_nll(p0, lv_sums, base_mu, base_lv, logits)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_flow_nll():
    rng = np.random.RandomState(1)
    B, D = 5, 8
    s0 = rng.randn(B, D).astype(np.float32)
    mu0 = rng.randn(B, D).astype(np.float32)
    lv0 = rng.randn(B, D).astype(np.float32) * 0.2
    lv_sum = rng.randn(B, D).astype(np.float32) * 0.5

    got = float(
        gaussian_flow_nll(
            jnp.array(s0), jnp.array(mu0), jnp.array(lv0), jnp.array(lv_sum)
        )
    )
    want = 0.5 * (
        (lv_sum + (s0 - mu0) ** 2 / np.exp(lv0)).sum() / B + D * LOG2PI
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_entropy():
    rng = np.random.RandomState(2)
    B, D = 6, 9
    lv = rng.randn(B, D).astype(np.float32)
    got = float(gaussian_entropy(jnp.array(lv)))
    want = 0.5 * (D * (1.0 + LOG2PI) + lv.sum(axis=1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)
