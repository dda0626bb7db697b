"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# full-width sweeps hold an (n_pad, m_pad) f32 tile (plus a few
# temporaries) in scoped VMEM at once — a clear win up to the protocol
# shapes (2048 / SVR 2560, measured round 4) but past that the tile
# alone approaches v5e's 128 MB physical VMEM
_FULL_SWEEP_MAX = 2560


def sweep_tile(m_pad: int, narrow: int) -> int:
    """Sweep width for a metric kernel: the FULL padded ref width when
    the full-width tile fits comfortably in VMEM (the round-4 finding:
    the per-tile fori_loop overhead was ~1/3 of the VPU-bound kernels),
    else fall back to `narrow` streaming tiles (any cloud size keeps
    working, just at the old rate)."""
    if m_pad <= _FULL_SWEEP_MAX:
        return m_pad
    return narrow


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
