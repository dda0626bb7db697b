"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sq_dist_tile(a, b_ref, t, tile):
    """(N, T) squared distances between points a (N, 3) and tile t of the
    (1, M, 3) cloud ref — sum_c (a_c - b_c)^2 via three broadcast FMAs
    (a 3-wide MXU contraction would run at ~2% utilization)."""
    bt = b_ref[0, pl.ds(t * tile, tile), :]  # (T, 3)
    d = jnp.zeros((a.shape[0], tile), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - bt[:, c][None, :]  # (N, T)
        d = d + diff * diff
    return d
