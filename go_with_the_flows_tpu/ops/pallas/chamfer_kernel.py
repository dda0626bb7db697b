"""Pallas TPU kernel: fused bidirectional Chamfer / nearest-neighbor
distance, differentiable.

Replaces the XLA path for the metric hot loop (the reference's
nndistance.cu role): computes per-point minimum squared distances in both
directions WITHOUT materializing the (B, N, M) distance matrix in HBM —
distance tiles are produced and reduced entirely in VMEM, so HBM traffic
is just the two point clouds and the two min/argmin vectors (vs
~2 * B*N*M*4 bytes for the XLA materialization).

Distance tiles are computed by coordinate broadcasting on the VPU:
with only 3 coordinates the MXU's 128-deep contraction would run at ~2%
utilization, so sum_c (a_c - b_c)^2 via three broadcast FMAs is the
faster (and Mosaic-friendly) formulation.

Differentiability (the reference's NNDistanceGrad analog,
nndistance.cu:129-154): the forward saves only the argmin indices
(O(N+M) residuals); the backward is a cheap XLA gather/scatter-add of
2*g*(x - y) into both clouds — exactly the CUDA atomicAdd scatter.

Shape generality: both clouds are padded with far-away sentinel points to
tile-aligned sizes (N to the sublane multiple, M to the lane-tile
multiple), so any cloud size — including the SVR protocol's 2500 points
(scripts/run_evaluate_svr.sh) — runs on the fused kernel; pad rows/cols
are sliced off the outputs.

Grid: one program per cloud pair; inside, the M axis is tiled and a
running row-min/argmin is carried while column-mins are written per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (
    round_up as _round_up,
    sq_dist_tile as _sq_dist_tile,
    sweep_tile as _sweep_tile,
)

_TILE_M = 512
_SENTINEL = 1e9  # pad coordinate: never wins a min against real points
_BIG_IDX = 2 ** 30
# full-width sweeps hold a (n_pad, m_pad) distance tile (+ argmin
# iota/where temporaries on the with_idx path) in scoped VMEM at once:
# ~23 MB at 2048, ~60 MB at the SVR 2560 — above the compiler's 16 MB
# default, comfortably under the 128 MB physical (emd_kernel.py note)
_VMEM_LIMIT = 100 * 1024 * 1024


def _masked_argmin(d, m, axis, base):
    """First index achieving the minimum m along `axis` (+ base offset).

    Mosaic has no fused argmin reduce; a where+min over an iota is a
    single extra VPU pass over the tile.
    """
    ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
    keep = jnp.where(d == m, ids, _BIG_IDX)
    return jnp.min(keep, axis=axis, keepdims=True) + base


def _nn_kernel(save_idx, a_ref, b_ref, *out_refs, tile=None):
    # `tile` = sweep width over the ref axis; callers pass the FULL
    # padded width (round-4 tile-overhead lesson, see emd_kernel.py)
    if save_idx:
        dl_ref, il_ref, dr_ref, ir_ref = out_refs
    else:
        # forward-only variant (the metric hot loop differentiates
        # nothing): skips the argmin VPU passes and the index HBM writes
        dl_ref, dr_ref = out_refs
        il_ref = ir_ref = None
    a = a_ref[0]  # (N, 3)
    n = a.shape[0]
    m = b_ref.shape[1]
    if tile is None:
        tile = _TILE_M

    def tile_body(t, carry):
        dl, il = carry
        d = _sq_dist_tile(a, b_ref, t, tile)
        # column minima + argminima are final per tile
        col_min = jnp.min(d, axis=0, keepdims=True)  # (1, T)
        sl = pl.ds(t * tile, tile)
        dr_ref[0, :, sl] = col_min
        if not save_idx:
            return jnp.minimum(dl, jnp.min(d, axis=1, keepdims=True).T), il
        ir_ref[0, :, sl] = _masked_argmin(d, col_min, 0, 0)
        # row minima: carried across tiles; strict < keeps the first
        # (lowest-index) occurrence, matching argmin semantics
        row_min = jnp.min(d, axis=1, keepdims=True).T  # (1, N)
        row_idx = _masked_argmin(d, row_min.T, 1, t * tile).T
        better = row_min < dl
        return jnp.minimum(dl, row_min), jnp.where(better, row_idx, il)

    dl, il = jax.lax.fori_loop(
        0, m // tile, tile_body,
        (
            jnp.full((1, n), jnp.inf, jnp.float32),
            jnp.zeros((1, n), jnp.int32),
        ),
    )
    dl_ref[0] = dl
    if save_idx:
        il_ref[0] = il


def _pad_cloud(x, target: int):
    B, N, _ = x.shape
    if target == N:
        return x
    pad = jnp.full((B, target - N, 3), _SENTINEL, x.dtype)
    return jnp.concatenate([x, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "with_idx"))
def nn_distance_pallas(a: jax.Array, b: jax.Array, interpret: bool = False,
                       with_idx: bool = True):
    """(dist_a (B,N), idx_a (B,N), dist_b (B,M), idx_b (B,M)) — the
    reference NNDistance signature (structural_loss.cpp:80-99), fused.
    Any N/M (clouds are sentinel-padded to tile-aligned sizes).
    `with_idx=False` returns (dist_a, dist_b) only, skipping the argmin
    passes — the forward-only metric path."""
    B, N, _ = a.shape
    M = b.shape[1]
    n_pad = _round_up(N, 8)  # f32 sublane multiple
    m_pad = _round_up(M, _TILE_M)
    a = _pad_cloud(a.astype(jnp.float32), n_pad)
    b = _pad_cloud(b.astype(jnp.float32), m_pad)

    def spec(p):
        return pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def shape(p, dt):
        return jax.ShapeDtypeStruct((B, 1, p), dt)

    if with_idx:
        out_specs = [spec(n_pad), spec(n_pad), spec(m_pad), spec(m_pad)]
        out_shape = [shape(n_pad, jnp.float32), shape(n_pad, jnp.int32),
                     shape(m_pad, jnp.float32), shape(m_pad, jnp.int32)]
    else:
        out_specs = [spec(n_pad), spec(m_pad)]
        out_shape = [shape(n_pad, jnp.float32), shape(m_pad, jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_nn_kernel, with_idx,
                          tile=_sweep_tile(m_pad, _TILE_M)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(a, b)
    if with_idx:
        dl, il, dr, ir = out
        return dl[:, 0, :N], il[:, 0, :N], dr[:, 0, :M], ir[:, 0, :M]
    dl, dr = out
    return dl[:, 0, :N], dr[:, 0, :M]


def _scatter_add(idx, upd, length: int):
    """(B, K) indices + (B, K, 3) updates -> (B, length, 3) scatter-add
    (the XLA analog of NNDistanceGrad's atomicAdd, nndistance.cu:129-154)."""
    def one(i, u):
        return jnp.zeros((length, 3), u.dtype).at[i].add(u)

    return jax.vmap(one)(idx, upd)


@functools.lru_cache(maxsize=None)
def _make_diff_chamfer(interpret: bool):
    @jax.custom_vjp
    def f(a, b):
        # primal (undifferentiated) path — the metric hot loop: the
        # forward-only kernel variant, no argmin passes / index writes
        return nn_distance_pallas(a, b, interpret=interpret,
                                  with_idx=False)

    def fwd(a, b):
        dl, ia, dr, ib = nn_distance_pallas(a, b, interpret=interpret)
        return (dl, dr), (a, b, ia, ib)

    def bwd(res, g):
        a, b, ia, ib = res
        gl, gr = g
        N, M = a.shape[1], b.shape[1]
        b_near = jnp.take_along_axis(b, ia[..., None], axis=1)  # (B,N,3)
        a_near = jnp.take_along_axis(a, ib[..., None], axis=1)  # (B,M,3)
        dldiff = 2.0 * gl[..., None] * (a - b_near)  # d dl / d a
        drdiff = 2.0 * gr[..., None] * (b - a_near)  # d dr / d b
        da = dldiff + _scatter_add(ib, -drdiff, N)
        db = drdiff + _scatter_add(ia, -dldiff, M)
        return da, db

    f.defvjp(fwd, bwd)
    return f


def chamfer_pallas(a: jax.Array, b: jax.Array, interpret: bool = False):
    """(dl, dr) per-point min squared distances; a (B,N,3), b (B,M,3).

    Differentiable: gradients match the XLA `ops.chamfer.chamfer` path
    (and the reference CUDA NNDistanceGrad) with O(N+M) residuals —
    the forward saves argmin indices, the backward gathers/scatters.
    """
    return _make_diff_chamfer(interpret)(a, b)
