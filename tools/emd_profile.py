"""Ablation profile of the pairwise auction-EMD Pallas kernel on real TPU.

VERDICT r3 weak #1: the 405x405 EMD matrix is ~85% of the generative
protocol wall-clock (3,914 pairs/s vs 29,711 for CD). Before changing the
shipped kernel (ops/pallas/emd_kernel.py), this tool measures WHERE the
~255 us/pair goes by timing measurement-only kernel variants that each
remove or restructure one cost component:

  baseline   the shipped kernel body (sanity: must match bench.py's
             pairwise_emd_pairs_per_sec)
  noexp      exp(level*D) replaced by level*D     -> VPU-transcendental share
  nocost     w*sqd cost accumulation dropped      -> cost-reduction share
  nos23mul   w/el multiplies dropped (reductions on raw E)
  bf16e      E cache stored bf16                  -> VMEM-bandwidth share
  merged     s1(level j+1) fused into s23(level j): one matrix sweep per
             level instead of two (identical arithmetic, reordered)

All variants except `baseline`/`merged` compute WRONG values on purpose —
they exist only to attribute time. `merged` must be bit-identical.

Usage:  JAX_PLATFORMS='' python tools/emd_profile.py [--pairs 64] [--n 2048]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_with_the_flows_tpu.ops.emd import _capacities
from go_with_the_flows_tpu.ops.pallas.common import round_up, sq_dist_tile
from go_with_the_flows_tpu.ops.pallas.emd_kernel import (
    _N_LEVELS,
    _TILE_M,
    _VMEM_LIMIT,
    _emd_scratch_shapes,
    _init_capacity,
    _pad_cloud,
)
from go_with_the_flows_tpu.ops.pallas.pairwise_kernel import (
    pairwise_emd_pallas,
)


def _variant_kernel(n_real, m_real, multi_l, multi_r, variant,
                    a_ref, b_ref, cost_ref, *scratch):
    """Parametrized copy of emd_kernel._emd_kernel (grid_col=True path),
    measurement-only — see module docstring for the variant semantics.
    A "@<width>" suffix on the variant overrides the sweep tile."""
    tile = _TILE_M
    if "@" in variant:
        variant, tile = variant.split("@")
        tile = int(tile)
    es_cache = None
    if len(scratch) == 8:  # mxu variants carry an extra E*sqrtD cache
        (remain_l, remain_r, ratio_l, ratio_r, d_cache, sqd_cache,
         e_cache, es_cache) = scratch
    else:
        (remain_l, remain_r, ratio_l, ratio_r, d_cache, sqd_cache,
         e_cache) = scratch
    a = a_ref[0]
    n = a.shape[0]
    m = b_ref.shape[1]
    n_tiles = m // tile
    e_dtype = jnp.bfloat16 if variant == "bf16e" else jnp.float32

    remain_l[:] = _init_capacity(n, n_real, multi_l, row=True)
    remain_r[:] = _init_capacity(m, m_real, multi_r, row=False)

    def fill_caches(t, carry):
        d = sq_dist_tile(a, b_ref, t, tile)
        sl = pl.ds(t * tile, tile)
        d_cache[:, sl] = d
        sqd_cache[:, sl] = jnp.sqrt(jnp.maximum(d, 1e-12))
        return carry

    jax.lax.fori_loop(0, n_tiles, fill_caches, 0)

    def _exp(x):
        if variant == "noexp":
            return x  # wrong values; same memory pattern
        return jnp.exp(x)

    if variant in ("mxu", "mxufull"):
        # MXU restructure: every mul+reduce chain becomes a full-width
        # matvec dot and the E / E*sqrtD caches are stored BF16 so the
        # MXU reads them directly (mxufull showed per-dot f32->bf16
        # conversion of the 16MB cache eats the dot gains). VPU work per
        # level drops to the exp fill + the es product (with casts);
        # suml / col / cost / rowsum reductions all ride the MXU. Same
        # auction math, reductions reordered + bf16 operand rounding —
        # accuracy gated on end metrics. Vectors keep natural layouts:
        #   suml (N,1) = E  @ rr^T   — NT dot_general (contract dim 1)
        #   col (1,M)  = rl^T @ E    — TN dot_general (contract dim 0)
        # (`mxufull` was the earlier f32-cache attempt, 0.91x — kept as
        # an alias of this path.)
        # 1-row/1-col dot operands canonicalize to a broadcast+reduce
        # (which dies on the bf16 cache and stays on the VPU) — widen the
        # vector operand to 8 sublanes of the SAME values and read lane 0
        # of the result so the lowering is a genuine MXU matmul
        def mv_nt(mat, vec_row):  # (N, M) x (1, M) -> (N, 1)
            v8 = jnp.broadcast_to(
                vec_row.astype(mat.dtype), (8, vec_row.shape[1])
            )
            out = jax.lax.dot_general(
                mat, v8, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, 8)
            return out[:, :1]

        def mv_tn(vec_col, mat):  # (N, 1) x (N, M) -> (1, M)
            v8 = jnp.broadcast_to(
                vec_col.astype(mat.dtype), (vec_col.shape[0], 8)
            )
            out = jax.lax.dot_general(
                v8, mat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, M)
            return out[:1]

        rrow0 = _init_capacity(m, m_real, multi_r, row=False)  # (1, M)
        rl_rem0 = _init_capacity(n, n_real, multi_l, row=True)

        def level_body(j, carry):
            cost, level, rrow, rl_rem = carry

            def fill(t, carry):
                sl = pl.ds(t * tile, tile)
                e = jnp.exp(level * d_cache[:, sl])
                e_cache[:, sl] = e.astype(e_cache.dtype)
                es_cache[:, sl] = (e * sqd_cache[:, sl]).astype(
                    es_cache.dtype
                )
                return carry

            jax.lax.fori_loop(0, n_tiles, fill, 0)
            e = e_cache[:]
            suml = mv_nt(e, rrow) + 1e-9  # (N, 1)
            rl = rl_rem / suml
            col = mv_tn(rl, e)  # (1, M)
            sumr = rrow * col
            consumption = jnp.minimum(rrow / (sumr + 1e-9), 1.0)
            rr = consumption * rrow
            rrow_new = jnp.maximum(0.0, rrow - sumr)
            y = mv_nt(es_cache[:], rr)  # (N, 1) cost partial
            z = mv_nt(e, rr)  # (N, 1) row sums
            cost = cost + jnp.sum(rl * y)
            rl_rem = jnp.maximum(0.0, rl_rem - rl * z)
            return cost, level * 0.25, rrow_new, rl_rem

        cost, _, _, _ = jax.lax.fori_loop(
            0, _N_LEVELS, level_body,
            (jnp.float32(0.0), jnp.float32(-(4.0 ** 7)), rrow0, rl_rem0),
        )
        cost_ref[0, 0, pl.program_id(1)] = cost
        return

    if variant == "merged":
        # One sweep per level: tile t of level j's s23 also produces
        # E_{j+1} for tile t (exp from the D cache) and accumulates
        # suml_{j+1} with the just-updated remainR — arithmetic and
        # operand values identical to the two-sweep schedule.
        def prologue(t, suml):
            sl = pl.ds(t * tile, tile)
            e = jnp.exp((-4.0 ** 7) * d_cache[:, sl])
            e_cache[:, sl] = e
            return suml + jnp.sum(e * remain_r[:, sl], axis=1,
                                  keepdims=True)

        suml = jax.lax.fori_loop(
            0, n_tiles, prologue, jnp.full((n, 1), 1e-9, jnp.float32)
        )

        def level_body(j, carry):
            cost, suml, level = carry
            ratio_l[:] = remain_l[:] / suml
            next_level = level * 0.25

            def s23(t, carry):
                cost_acc, row_sum, suml_next = carry
                sl = pl.ds(t * tile, tile)
                e = e_cache[:, sl]
                col = jnp.sum(e * ratio_l[:], axis=0, keepdims=True)
                r = remain_r[:, sl]
                sumr = r * col
                consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
                rr = consumption * r
                r_new = jnp.maximum(0.0, r - sumr)
                remain_r[:, sl] = r_new
                w = e * ratio_l[:] * rr
                cost_acc = cost_acc + jnp.sum(w * sqd_cache[:, sl])
                row_sum = row_sum + jnp.sum(w, axis=1, keepdims=True)
                e_next = jnp.exp(next_level * d_cache[:, sl])
                e_cache[:, sl] = e_next
                suml_next = suml_next + jnp.sum(e_next * r_new, axis=1,
                                                keepdims=True)
                return cost_acc, row_sum, suml_next

            cost_l, row_sum, suml_next = jax.lax.fori_loop(
                0, n_tiles, s23,
                (jnp.float32(0.0), jnp.zeros((n, 1), jnp.float32),
                 jnp.full((n, 1), 1e-9, jnp.float32)),
            )
            remain_l[:] = jnp.maximum(0.0, remain_l[:] - row_sum)
            return cost + cost_l, suml_next, next_level

        cost, _, _ = jax.lax.fori_loop(
            0, _N_LEVELS, level_body,
            (jnp.float32(0.0), suml, jnp.float32(-(4.0 ** 7))),
        )
        cost_ref[0, 0, pl.program_id(1)] = cost
        return

    def level_body(j, carry):
        cost, level = carry

        def s1(t, suml):
            sl = pl.ds(t * tile, tile)
            e = _exp(level * d_cache[:, sl])
            e_cache[:, sl] = e.astype(e_dtype)
            r = remain_r[:, sl]
            return suml + jnp.sum(e * r, axis=1, keepdims=True)

        suml = jax.lax.fori_loop(
            0, n_tiles, s1, jnp.full((n, 1), 1e-9, jnp.float32)
        )
        ratio_l[:] = remain_l[:] / suml

        def s23(t, carry):
            cost_acc, row_sum = carry
            sl = pl.ds(t * tile, tile)
            e = e_cache[:, sl].astype(jnp.float32)
            r = remain_r[:, sl]
            if variant == "nos23mul":
                col = jnp.sum(e, axis=0, keepdims=True)
                w = e
            elif variant == "freuse":
                # bit-exact: e*ratioL computed ONCE (baseline computes it
                # in the col reduce and again in w)
                f = e * ratio_l[:]
                col = jnp.sum(f, axis=0, keepdims=True)
            else:
                col = jnp.sum(e * ratio_l[:], axis=0, keepdims=True)
            sumr = r * col
            consumption = jnp.minimum(r / (sumr + 1e-9), 1.0)
            rr = consumption * r
            ratio_r[:, sl] = rr
            remain_r[:, sl] = jnp.maximum(0.0, r - sumr)
            if variant == "freuse":
                w = f * rr
            elif variant != "nos23mul":
                w = e * ratio_l[:] * rr
            if variant == "nocost":
                cost_acc = cost_acc + jnp.sum(w)
            else:
                cost_acc = cost_acc + jnp.sum(w * sqd_cache[:, sl])
            row_sum = row_sum + jnp.sum(w, axis=1, keepdims=True)
            return cost_acc, row_sum

        cost_l, row_sum = jax.lax.fori_loop(
            0, n_tiles, s23,
            (jnp.float32(0.0), jnp.zeros((n, 1), jnp.float32)),
        )
        remain_l[:] = jnp.maximum(0.0, remain_l[:] - row_sum)
        return cost + cost_l, level * 0.25

    cost, _ = jax.lax.fori_loop(
        0, _N_LEVELS, level_body,
        (jnp.float32(0.0), jnp.float32(-(4.0 ** 7))),
    )
    cost_ref[0, 0, pl.program_id(1)] = cost


@functools.partial(jax.jit, static_argnames=("variant",))
def _grid_variant(samples, refs, variant: str):
    S, N, _ = samples.shape
    R, M, _ = refs.shape
    P = round_up(max(N, M), _TILE_M)
    multi_l, multi_r = _capacities(N, M)
    a = _pad_cloud(samples.astype(jnp.float32), P)
    b = _pad_cloud(refs.astype(jnp.float32), P)
    scratch = _emd_scratch_shapes(P)
    base_variant = variant.split("@")[0]
    if base_variant == "bf16e":
        scratch[-1] = pltpu.VMEM((P, P), jnp.bfloat16)
    elif base_variant in ("mxu", "mxufull"):
        scratch[-1] = pltpu.VMEM((P, P), jnp.bfloat16)  # E
        scratch.append(pltpu.VMEM((P, P), jnp.bfloat16))  # E*sqrtD

    cost = pl.pallas_call(
        functools.partial(
            _variant_kernel, N, M, multi_l, multi_r, variant
        ),
        grid=(S, R),
        in_specs=[
            pl.BlockSpec((1, P, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 3), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((S, 1, R), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=os.environ.get("EMD_PROFILE_INTERPRET") == "1",
    )(a, b)[0]
    return cost[:, 0, :]


def timed(fn, *args, reps=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])  # sync by fetching
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best, np.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64,
                    help="S = R (grid is S x R)")
    ap.add_argument("--n", type=int, default=2048)
    args = ap.parse_args()

    if os.environ.get("EMD_PROFILE_INTERPRET") != "1":
        assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.RandomState(0)
    S = R = args.pairs
    samples = jnp.asarray(
        rng.randn(S, args.n, 3).astype(np.float32) * 0.3
    )
    refs = jnp.asarray(rng.randn(R, args.n, 3).astype(np.float32) * 0.3)

    t0, ref_out = timed(
        lambda a, b: pairwise_emd_pallas(a, b), samples, refs
    )
    n_pairs = S * R
    print(f"shipped kernel: {t0 * 1e6 / n_pairs:9.1f} us/pair "
          f"({n_pairs / t0:8.0f} pairs/s)")

    results = {}
    variants = os.environ.get(
        "EMD_PROFILE_VARIANTS",
        "baseline,freuse,freuse@512,freuse@1024,freuse@2048,mxu",
    ).split(",")
    for variant in variants:
        try:
            t, out = timed(_grid_variant, samples, refs, variant)
        except Exception as exc:  # lowering failures are data, not fatal
            print(f"{variant:>9}: FAILED "
                  f"({type(exc).__name__}: {str(exc)[:120]})")
            continue
        results[variant] = t
        note = ""
        if variant.split("@")[0] in ("baseline", "merged", "freuse",
                                     "mxu", "mxufull", "bf16e"):
            err = float(np.abs(out - ref_out).max())
            rel = err / max(1e-12, float(np.abs(ref_out).max()))
            note = (" BITEXACT" if err == 0.0
                    else f" maxerr {err:.3e} (rel {rel:.1e})")
        base_t = results[variants[0]] if variants[0] in results else t
        print(f"{variant:>9}: {t * 1e6 / n_pairs:9.1f} us/pair "
              f"({n_pairs / t:8.0f} pairs/s)  "
              f"x{base_t / t:4.2f} vs {variants[0]}{note}")

    base = results.get("baseline", results[variants[0]])

    def share(name):
        if name not in results:
            return float("nan")
        return (base - results[name]) / base * 100

    print()
    print(f"exp share      : {share('noexp'):5.1f}%")
    print(f"cost-mul share : {share('nocost'):5.1f}%")
    print(f"s23-mul share  : {share('nos23mul'):5.1f}%")
    print(f"bf16-E delta   : {share('bf16e'):5.1f}%")
    print(f"merged delta   : {share('merged'):5.1f}%")
    print(f"freuse delta   : {share('freuse'):5.1f}%")
    print(f"mxu delta      : {share('mxu'):5.1f}%")
    print(f"mxufull delta  : {share('mxufull'):5.1f}%")


if __name__ == "__main__":
    main()
