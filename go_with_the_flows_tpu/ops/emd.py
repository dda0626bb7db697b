"""Approximate Earth Mover's Distance (auction/soft-assignment match) on TPU.

TPU-native re-derivation of the reference CUDA ApproxMatch/MatchCost kernels
(`lib/metrics/pytorch_structural_losses/src/approxmatch.cu:3-224`, autograd
wrapper `match_cost.py:6-44`). Algorithm semantics (derived from the kernel,
not translated): iterative proportional soft assignment with per-point
capacities over 9 temperature levels `level = -4^j, j = 7..-1`
(approxmatch.cu:24-28); per level

    suml_i   = 1e-9 + sum_j exp(level * D_ij) * remainR_j
    ratioL_i = remainL_i / suml_i
    sumr_j   = remainR_j * sum_i exp(level * D_ij) * ratioL_i
    ratioR_j = min(remainR_j / (sumr_j + 1e-9), 1) * remainR_j
    remainR  = max(0, remainR - sumr)
    w_ij     = exp(level * D_ij) * ratioL_i * ratioR_j
    match   += w;  remainL = max(0, remainL - sum_j w_ij)

with capacities multiL/multiR handling n != m via integer multiplicity
(approxmatch.cu:4-12). Cost = sum match_ij * ||a_i - b_j||
(euclidean, approxmatch.cu:184-224); the backward treats the match as a
constant (match_cost.py saves the match and uses MatchCostGrad), which we
reproduce with stop_gradient on the match so autodiff of the distance term
yields exactly the reference gradients (approxmatch.cu:229-291).

On TPU every level is three matmul-shaped ops over the (N, M) kernel
matrix exp(level*D) — MXU work, executed as a `fori_loop`. Memory: only D
and the running match live in HBM ((B, N, M) each); the eval driver chunks
B to bound this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .chamfer import pairwise_sqdists

_N_LEVELS = 9  # j = 7, 6, ..., -1  (approxmatch.cu:24-28)


def _capacities(n: int, m: int):
    """Integer multiplicities for n != m (approxmatch.cu:4-12; note the
    reference uses C integer division)."""
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


@jax.jit
def approx_match(a: jax.Array, b: jax.Array) -> jax.Array:
    """Soft match matrix (B, N, M) between clouds a (B,N,3) and b (B,M,3)."""
    B, N, _ = a.shape
    M = b.shape[1]
    multi_l, multi_r = _capacities(N, M)
    d = pairwise_sqdists(a, b)  # (B, N, M)

    def level_step(j, carry):
        match, remain_l, remain_r = carry
        # j runs 0..8 -> reference level index 7..-1
        level = -(4.0 ** (7.0 - j.astype(jnp.float32)))
        e = jnp.exp(level * d)  # (B, N, M)
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", e, remain_r,
                                 precision=jax.lax.Precision.HIGHEST)
        ratio_l = remain_l / suml  # (B, N)
        sumr = remain_r * jnp.einsum("bnm,bn->bm", e, ratio_l,
                                     precision=jax.lax.Precision.HIGHEST)
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r  # (B, M)
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        w = e * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        return match, remain_l, remain_r

    init = (
        jnp.zeros((B, N, M), jnp.float32),
        jnp.full((B, N), multi_l, jnp.float32),
        jnp.full((B, M), multi_r, jnp.float32),
    )
    match, _, _ = jax.lax.fori_loop(0, _N_LEVELS, level_step, init)
    return match


@jax.jit
def match_cost(a: jax.Array, b: jax.Array) -> jax.Array:
    """EMD cost (B,): sum_ij match_ij * ||a_i - b_j||. Differentiable wrt
    both clouds with the match held constant (reference match_cost.py)."""
    match = jax.lax.stop_gradient(approx_match(a, b))
    dist = jnp.sqrt(jnp.maximum(pairwise_sqdists(a, b), 1e-12))
    return jnp.sum(match * dist, axis=(1, 2))


def emd_approx(sample: jax.Array, ref: jax.Array) -> jax.Array:
    """Normalized EMD, cost / N (reference evaluation_metrics.py:25-30)."""
    n = sample.shape[1]
    assert n == ref.shape[1], "EMD requires equal cloud sizes"
    return match_cost(sample, ref) / float(n)
