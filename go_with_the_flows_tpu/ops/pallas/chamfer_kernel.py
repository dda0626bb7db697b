"""Pallas TPU kernel: fused bidirectional Chamfer distance.

Replaces the XLA path for the metric hot loop (the reference's
nndistance.cu role): computes per-point minimum squared distances in both
directions WITHOUT materializing the (B, N, M) distance matrix in HBM —
distance tiles are produced and reduced entirely in VMEM, so HBM traffic
is just the two point clouds and the two min vectors (vs ~2 * B*N*M*4
bytes for the XLA materialization).

Distance tiles are computed by coordinate broadcasting on the VPU:
with only 3 coordinates the MXU's 128-deep contraction would run at ~2%
utilization, so sum_c (a_c - b_c)^2 via three broadcast FMAs is the
faster (and Mosaic-friendly) formulation.

Grid: one program per cloud pair; inside, the M axis is tiled and a
running row-min is carried while column-mins are written per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 512


def _sq_dist_tile(a, b_ref, t):
    """(N, T) squared distances between a (N, 3) and b-tile t."""
    bt = b_ref[0, pl.ds(t * _TILE_M, _TILE_M), :]  # (T, 3)
    d = jnp.zeros((a.shape[0], _TILE_M), jnp.float32)
    for c in range(3):
        diff = a[:, c:c + 1] - bt[:, c][None, :]  # (N, T)
        d = d + diff * diff
    return d


def _chamfer_kernel(a_ref, b_ref, dl_ref, dr_ref):
    a = a_ref[0]  # (N, 3)
    n = a.shape[0]
    m = b_ref.shape[1]

    def tile_body(t, dl):
        d = _sq_dist_tile(a, b_ref, t)
        dr_ref[0, :, pl.ds(t * _TILE_M, _TILE_M)] = jnp.min(
            d, axis=0, keepdims=True
        )
        return jnp.minimum(dl, jnp.min(d, axis=1, keepdims=True).T)

    dl = jax.lax.fori_loop(
        0, m // _TILE_M, tile_body,
        jnp.full((1, n), jnp.inf, jnp.float32),
    )
    dl_ref[0] = dl


@functools.partial(jax.jit, static_argnames=("interpret",))
def chamfer_pallas(a: jax.Array, b: jax.Array, interpret: bool = False):
    """(dl, dr) per-point min squared distances; a (B,N,3), b (B,M,3).

    M is padded to a multiple of the tile size with far-away sentinel
    points (they never win a min; their dr columns are sliced off).
    """
    B, N, _ = a.shape
    M = b.shape[1]
    m_pad = -(-M // _TILE_M) * _TILE_M
    if m_pad != M:
        pad = jnp.full((B, m_pad - M, 3), 1e9, b.dtype)
        b = jnp.concatenate([b, pad], axis=1)

    dl, dr = pl.pallas_call(
        _chamfer_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32))
    return dl[:, 0], dr[:, 0, :M]
