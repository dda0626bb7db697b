"""Chamfer / nearest-neighbor distance on TPU.

Replaces the reference CUDA extension's NNDistance kernel
(`lib/metrics/pytorch_structural_losses/src/nndistance.cu:2-128` + autograd
wrapper `nn_distance.py:7-41`): bidirectional per-point minimum squared
distance between two clouds.

Phase-1 implementation is pure XLA: the (N, M) squared-distance matrix at
2048^2 fp32 is 16 MB — it fits comfortably and XLA fuses the row/col min
with the matmul-shaped distance computation; gradients flow through the min
(equivalent to the CUDA scatter-grad, nndistance.cu:129-154). A Pallas
tiled kernel (ops/pallas/) takes over for the large pairwise metric
matrices.

Layout: clouds are (B, N, 3) here — the reference metric convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdists(a: jax.Array, b: jax.Array) -> jax.Array:
    """(B, N, 3) x (B, M, 3) -> (B, N, M) squared euclidean distances.

    Computed as sum_c (a_c - b_c)^2 by broadcasting — the same formulation
    as the reference CUDA kernels (nndistance.cu / approxmatch.cu) and the
    Pallas kernels. NOT the |a|^2 + |b|^2 - 2ab matmul expansion: with a
    3-wide contraction the MXU would run at ~2% utilization anyway, and
    the expansion's cancellation error (~1e-7 absolute regardless of d) is
    amplified ~1e4x by the coldest EMD auction temperature exp(-16384*d),
    breaking XLA<->Pallas and XLA<->reference agreement for near-identical
    points. The diff form's error scales with d itself, which the exp
    tolerates. XLA fuses the broadcast into the reduction (no (B,N,M,3)
    materialization under jit).
    """
    diff = a[:, :, None, :] - b[:, None, :, :]  # (B, N, M, 3)
    return jnp.sum(diff * diff, axis=-1)


@jax.jit
def nn_distance(a: jax.Array, b: jax.Array):
    """Bidirectional nearest-neighbor squared distances + argmin indices.

    Returns (dist_a (B,N), idx_a (B,N), dist_b (B,M), idx_b (B,M)) —
    the reference NNDistance signature (structural_loss.cpp:80-99).
    """
    d = pairwise_sqdists(a, b)
    dist_a = jnp.min(d, axis=2)
    idx_a = jnp.argmin(d, axis=2)
    dist_b = jnp.min(d, axis=1)
    idx_b = jnp.argmin(d, axis=1)
    return dist_a, idx_a, dist_b, idx_b


@jax.jit
def chamfer(a: jax.Array, b: jax.Array):
    """(dl, dr): per-point min squared distances, differentiable.
    Matches reference distChamferCUDA / distChamfer
    (evaluation_metrics.py:21-44)."""
    d = pairwise_sqdists(a, b)
    return jnp.min(d, axis=2), jnp.min(d, axis=1)
