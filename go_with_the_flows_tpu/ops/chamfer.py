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

    Computed via the |a|^2 + |b|^2 - 2ab expansion (MXU-friendly: the cross
    term is a batched matmul), clamped at 0 against rounding.
    """
    aa = jnp.sum(a * a, axis=-1)  # (B, N)
    bb = jnp.sum(b * b, axis=-1)  # (B, M)
    # precision=HIGHEST: TPU matmuls default to bf16 passes, which is far
    # too coarse for metric parity (CD is reported at the 1e-4 scale).
    ab = jnp.einsum(
        "bnc,bmc->bnm", a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = aa[:, :, None] + bb[:, None, :] - 2.0 * ab
    return jnp.maximum(d, 0.0)


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
