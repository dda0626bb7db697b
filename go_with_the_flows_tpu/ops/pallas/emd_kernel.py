"""Pallas TPU kernel: fused auction/soft-assignment EMD cost.

The TPU-native answer to the reference's approxmatch.cu + matchcost
kernels: the 9-temperature-level proportional assignment
(see ops/emd.py for the algorithm derivation) with the match matrix kept
IMPLICIT — every (N, M) quantity is produced tile-by-tile in VMEM and
reduced immediately, and the cost is accumulated per level, so HBM never
holds an (N, M) buffer (the reference materializes the full B x N x M
match, ~1 GB at eval shapes; the XLA fallback materializes the distance
and kernel matrices).

Per level, three tiled sweeps over M (exactly the data dependencies of
the algorithm):
  sweep 1: suml_i   = 1e-9 + sum_j E_ij * remainR_j     -> ratioL
  sweep 2: sumr_j   = remainR_j * sum_i E_ij * ratioL_i -> ratioR, remainR
  sweep 3: w_ij = E_ij * ratioL_i * ratioR_j; cost += sum w_ij * dist_ij;
           remainL_i -= sum_j w_ij
E tiles are recomputed from the raw points each sweep — the points are
(N,3)/(M,3), so recompute is ~free compared to spilling E to HBM. All
reductions are broadcast/VPU ops (no matvecs: with a 3-wide contraction
the MXU would idle, and Mosaic only lowers 2-D dots).

Assumes n == m multiplicity 1 (every use in the reference's eval protocol
has equal cloud sizes; the XLA path handles n != m).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_M = 256  # three (N, T) f32 tiles live in sweep 3; 256 keeps them under the 16MB scoped VMEM limit
_N_LEVELS = 9  # level = -4^j, j = 7..-1 (approxmatch.cu:24-28)


def _emd_kernel(a_ref, b_ref, cost_ref,
                remain_l, remain_r, ratio_l, ratio_r):
    # scratch layouts: remain_l/ratio_l (N, 1); remain_r/ratio_r (1, M)
    a = a_ref[0]  # (N, 3)
    n = a.shape[0]
    m = b_ref.shape[1]
    n_tiles = m // _TILE_M

    remain_l[:] = jnp.ones((n, 1), jnp.float32)
    remain_r[:] = jnp.ones((1, m), jnp.float32)

    def dist_tile(t):
        bt = b_ref[0, pl.ds(t * _TILE_M, _TILE_M), :]  # (T, 3)
        d = jnp.zeros((n, _TILE_M), jnp.float32)
        for c in range(3):
            diff = a[:, c:c + 1] - bt[:, c][None, :]
            d = d + diff * diff
        return d

    def level_body(j, cost):
        # 4^(7-j) via exp (Mosaic cannot legalize math.powf); the <=1e-6
        # relative rounding on the temperature is immaterial
        level = -jnp.exp(1.3862943611198906 * (7.0 - j.astype(jnp.float32)))

        # sweep 1: row kernel sums -> ratioL
        def s1(t, suml):
            e = jnp.exp(level * dist_tile(t))  # (N, T)
            r = remain_r[:, pl.ds(t * _TILE_M, _TILE_M)]  # (1, T)
            return suml + jnp.sum(e * r, axis=1, keepdims=True)

        suml = jax.lax.fori_loop(
            0, n_tiles, s1, jnp.full((n, 1), 1e-9, jnp.float32)
        )
        ratio_l[:] = remain_l[:] / suml

        # merged sweeps 2+3: ratioR for a tile is final as soon as its
        # column sum exists (it only depends on the completed ratioL), so
        # the weight/cost accumulation reuses the same E tile — one exp
        # evaluation instead of two per tile.
        def s23(t, carry):
            cost_acc, row_sum = carry
            d = dist_tile(t)
            e = jnp.exp(level * d)  # (N, T)
            col = jnp.sum(e * ratio_l[:], axis=0, keepdims=True)  # (1, T)
            sl = pl.ds(t * _TILE_M, _TILE_M)
            r = remain_r[:, sl]
            sumr = r * col
            consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
            rr = consumption * r
            ratio_r[:, sl] = rr
            remain_r[:, sl] = jnp.maximum(0.0, r - sumr)

            w = e * ratio_l[:] * rr
            cost_acc = cost_acc + jnp.sum(
                w * jnp.sqrt(jnp.maximum(d, 1e-12))
            )
            row_sum = row_sum + jnp.sum(w, axis=1, keepdims=True)
            return cost_acc, row_sum

        cost_l, row_sum = jax.lax.fori_loop(
            0, n_tiles, s23,
            (jnp.float32(0.0), jnp.zeros((n, 1), jnp.float32)),
        )
        remain_l[:] = jnp.maximum(0.0, remain_l[:] - row_sum)
        return cost + cost_l

    cost = jax.lax.fori_loop(0, _N_LEVELS, level_body, jnp.float32(0.0))
    cost_ref[0, 0, 0] = cost


@functools.partial(jax.jit, static_argnames=("interpret",))
def emd_cost_pallas(a: jax.Array, b: jax.Array, interpret: bool = False):
    """Approximate-EMD match cost (B,) for equal-size clouds (B,N,3)."""
    B, N, _ = a.shape
    M = b.shape[1]
    assert N == M, "emd_cost_pallas requires equal cloud sizes"
    assert M % _TILE_M == 0, f"M={M} must be a multiple of {_TILE_M}"

    cost = pl.pallas_call(
        _emd_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),  # remainL
            pltpu.VMEM((1, M), jnp.float32),  # remainR
            pltpu.VMEM((N, 1), jnp.float32),  # ratioL
            pltpu.VMEM((1, M), jnp.float32),  # ratioR
        ],
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32))
    return cost[:, 0, 0]
