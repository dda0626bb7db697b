"""Pallas TPU kernels for the PAIRWISE metric matrices (MMD/COV/1-NNA).

The generative protocol (reference evaluation_metrics.py:103-176,
_pairwise_EMD_CD_F1_SCORE) needs full (N_sample, N_ref) matrices of
per-pair CD / EMD / F1 over ~400x400 cloud pairs, three times (rs, rr,
ss). Round-2 dispatched host-tiled (S*R)-pair batches of the per-pair
kernels, which required materializing broadcast copies of both cloud
sets per dispatch ((pairs, N, 3) x 2 in HBM) and hundreds of dispatches
over the tunnel.

Here the pair loop moves ON CHIP: one pallas_call runs a (S, R) grid
where program (i, j) computes pair (sample_i, ref_j) entirely in VMEM.
The sample block's index map is constant along the inner grid axis, so
each sample cloud is fetched from HBM once per matrix ROW and reused
against every ref block — HBM traffic is S + S*R cloud reads and S*R
scalars out, with no broadcast copies at all.

Two kernels:

  * `pairwise_cd_stats_pallas` — fused bidirectional Chamfer REDUCED to
    the four per-pair scalars the protocol needs (mean-left, mean-right,
    precision%, recall%), so the (pairs, N) min-distance vectors never
    exist in HBM. Matches metrics/evaluation.py _paired_stats exactly
    (same masks/denominators; F1 is assembled outside).
  * `pairwise_emd_pallas` — the 9-level auction EMD cost matrix, reusing
    the per-pair `_emd_kernel` body (ops/pallas/emd_kernel.py) verbatim
    under the (S, R) grid; per-pair arithmetic is IDENTICAL to the
    paired kernel (same tile size, same sweep order), so entries match
    `emd_cost_pallas` bit for bit.

Shape generality mirrors the per-pair kernels: sentinel / zero-capacity
padding admits any N/M >= 1 including the SVR protocol's 2500 points and
cross-size pairs (2048 vs 2500).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..emd import _capacities
from .common import (
    round_up as _round_up,
    sq_dist_tile as _sq_dist_tile,
    sweep_tile as _sweep_tile,
)
from .emd_kernel import _TILE_M as _EMD_TILE, _emd_kernel
from .emd_kernel import _VMEM_LIMIT as _EMD_VMEM_LIMIT
from .emd_kernel import _emd_scratch_shapes
from .emd_kernel import _pad_cloud as _pad_zero

_TILE = 512  # Chamfer M-axis tile (same as chamfer_kernel._TILE_M)
_SENTINEL = 1e9  # Chamfer pad coordinate: never wins a min


def _pad_sentinel(x, target: int):
    B, N, _ = x.shape
    if target == N:
        return x
    pad = jnp.full((B, target - N, 3), _SENTINEL, x.dtype)
    return jnp.concatenate([x, pad], axis=1)


def _cd_stats_kernel(n_real, m_real, thr, tile, a_ref, b_ref,
                     cdl_ref, cdr_ref, prec_ref, rec_ref):
    """Per-pair Chamfer stats: row/col min-distance reductions folded to
    scalars in VMEM (reference evaluation_metrics.py:118-168 per-pair
    math; F1 precision/recall per :77-81 on squared distances).

    `tile` is the sweep width over the ref axis; the caller passes the
    FULL padded width (round-4: 48.1k pairs/s at N=2048 vs 29.6k at the
    old 512-wide tiles — same per-tile-loop-overhead lesson as the EMD
    kernel; mins are order-insensitive, only the col_sum f32 order
    moves, ~1e-9)."""
    a = a_ref[0]  # (n_pad, 3)
    n = a.shape[0]
    m = b_ref.shape[1]
    thr = jnp.float32(thr)

    def body(t, carry):
        row_min, col_sum, col_cnt = carry
        d = _sq_dist_tile(a, b_ref, t, tile)  # (n_pad, T)
        col_ids = (jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                   + t * tile)
        valid = col_ids < m_real
        col_min = jnp.min(d, axis=0, keepdims=True)  # (1, T)
        col_sum = col_sum + jnp.sum(jnp.where(valid, col_min, 0.0))
        col_cnt = col_cnt + jnp.sum(
            jnp.where(valid & (col_min < thr), 1.0, 0.0)
        )
        row_min = jnp.minimum(
            row_min, jnp.min(d, axis=1, keepdims=True).T
        )  # (1, n_pad)
        return row_min, col_sum, col_cnt

    row_min, col_sum, col_cnt = jax.lax.fori_loop(
        0, m // tile, body,
        (
            jnp.full((1, n), jnp.inf, jnp.float32),
            jnp.float32(0.0),
            jnp.float32(0.0),
        ),
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    rvalid = row_ids < n_real
    # Each (i, j) program owns lane j of the row-i output block. The
    # SMEM block spans the full ref axis AS THE LAST DIM: Mosaic
    # requires output block dims to tile the array by (8, 128) or equal
    # it — a (1, 1, 1) element block over (S, R, 1) does not lower —
    # and a trailing 1-wide lane dim would pad 128x, blowing the 1MB
    # SMEM budget (4 outputs x (R, 1) blocks x double buffering ~ 1.6MB
    # at R=405; (1, R) blocks are ~2KB each).
    j = pl.program_id(1)
    cdl_ref[0, 0, j] = (
        jnp.sum(jnp.where(rvalid, row_min, 0.0)) / n_real
    )
    rec_ref[0, 0, j] = 100.0 * jnp.sum(
        jnp.where(rvalid & (row_min < thr), 1.0, 0.0)
    ) / n_real
    cdr_ref[0, 0, j] = col_sum / m_real
    prec_ref[0, 0, j] = 100.0 * col_cnt / m_real


@functools.partial(
    jax.jit, static_argnames=("f1_threshold", "interpret")
)
def pairwise_cd_stats_pallas(samples, refs, f1_threshold: float,
                             interpret: bool = False):
    """(cdl, cdr, precision, recall), each (S, R) f32, for samples
    (S, N, 3) vs refs (R, M, 3). cdl/cdr are per-pair means of the
    row/col min squared distances; precision/recall the x100 fractions
    under `f1_threshold` (reference evaluation_metrics.py:118-168)."""
    S, N, _ = samples.shape
    R, M, _ = refs.shape
    n_pad = _round_up(N, 8)
    m_pad = _round_up(M, _TILE)
    a = _pad_sentinel(samples.astype(jnp.float32), n_pad)
    b = _pad_sentinel(refs.astype(jnp.float32), m_pad)

    # the output block spans the whole ref axis (as lanes) and is
    # revisited across the inner grid dimension (index map constant in
    # j): one writeback per matrix row, each program storing its own
    # lane element
    out_spec = pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((S, 1, R), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_cd_stats_kernel, N, M, float(f1_threshold),
                          _sweep_tile(m_pad, _TILE)),
        grid=(S, R),
        in_specs=[
            # constant along j: the sample cloud stays resident across
            # the whole matrix row
            pl.BlockSpec((1, n_pad, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        # the full-width distance tile exceeds the compiler's 16 MB
        # default scoped-VMEM budget at protocol shapes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_EMD_VMEM_LIMIT
        ),
        interpret=interpret,
    )(a, b)
    return tuple(o[:, 0, :] for o in outs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_emd_pallas(samples, refs, interpret: bool = False):
    """(S, R) auction-EMD match-cost matrix for samples (S, N, 3) vs
    refs (R, M, 3). Entries equal `emd_cost_pallas(samples[i:i+1],
    refs[j:j+1])` exactly — same kernel body, same tiles."""
    S, N, _ = samples.shape
    R, M, _ = refs.shape
    P = _round_up(max(N, M), _EMD_TILE)
    multi_l, multi_r = _capacities(N, M)
    a = _pad_zero(samples.astype(jnp.float32), P)
    b = _pad_zero(refs.astype(jnp.float32), P)

    cost = pl.pallas_call(
        functools.partial(_emd_kernel, N, M, multi_l, multi_r, False,
                          grid_col=True,
                          tile=_sweep_tile(P, _EMD_TILE)),
        grid=(S, R),
        in_specs=[
            pl.BlockSpec((1, P, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # row-spanning lane block revisited across j (see CD note)
            pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((S, 1, R), jnp.float32)],
        scratch_shapes=_emd_scratch_shapes(P),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_EMD_VMEM_LIMIT
        ),
        interpret=interpret,
    )(a, b)[0]
    return cost[:, 0, :]
