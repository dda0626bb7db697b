"""Sparse (component-partitioned) Pallas mixture sampling decode.

The dense sampling path decodes every point through ALL K component
flows and keeps one result per point (models/mixture.py
decode_sampling) — a deliberate jit-friendly reformulation of the
reference's host-side per-component scatter (flow_mixture.py:144-177),
but K x the necessary decoder FLOPs.

This kernel removes the dead work EXACTLY, using exchangeability: a
point cloud is a SET of i.i.d. draws from the mixture, so the sampled
cloud may be generated *already sorted by component* — per cloud, draw
the per-point component ids (the same `jax.random.categorical` stream
as the dense path), keep only their COUNTS (a sufficient statistic of
the multiset of components), and lay the cloud out as K contiguous
segments. Each point is then decoded once, by its own component's flow.
The labeled cloud's distribution is identical to the dense path's —
same component counts per cloud (bit-equal, from the same draw), i.i.d.
base noise per point, per-component flow transform per point; only the
(semantically meaningless) point order inside each cloud differs.

Layout (per chunk of `tb` clouds), chosen so every dot stays WIDE
(the one-cloud-per-dot MXU-latency lesson, see train_kernel.py):

    [ k=0: cloud0 seg | cloud1 seg | ... | k=1: ... | ... | filler ]

Each (component k, cloud b) segment holds that cloud's component-k
points padded to a 128-lane tile multiple, so component k's points
across ALL tb clouds form ONE contiguous span: the coupling dots run
over dynamic-offset, static-size 128-aligned subtiles of that span
(expected span = tb*N/K ~ 4096 lanes at flagship shapes). Segment
boundaries live in SMEM; the per-cloud FiLM affine is applied per
128-lane tile through an h scratch (a fori_loop with one dynamic
leading-index row lookup per tile — static unrolling here would blow
Mosaic compile time). Boundary subtiles that overrun into the next
component's span are write-masked; the overrun lanes are re-processed
correctly by their own span's pass.

Work: sum_k ceil(span_k / SUB) * SUB lanes instead of K * N per cloud —
~1.1-1.3x N instead of K*N (K=4 flagship: ~3x fewer decoder FLOPs).

Scope: DIRECT eval mode (sampling / labeled reconstruction). Training
and validation-loss inverse decodes genuinely need all K components
(the mixture NLL sums over them) and stay on the dense paths.

Measured verdict (real v5e, tools/sparse_sampling_ab.py, B=1024
flagship): correct (per-component stats and CD-vs-ref match the dense
path within sampling spread) but 2.8x SLOWER than the dense fused
kernel — 2340 vs 6560 clouds/s sample-only at 'high' — because the
XLA-side layout/compaction (sorted counts, segment tables, final
take_along_axis) and the per-128-lane FiLM fori_loop outweigh the ~3x
decoder-FLOP saving at these shapes. The model's auto gate therefore
keeps it OFF (models/mixture.py _use_sparse_sampling); it remains
available via `sparse_sampling=True` / `--sparse_sampling on`.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .coupling_kernel import _EPS, _VMEM_LIMIT, _mxdot

_TILE = 128     # segment alignment = one lane tile
_SUB_MAX = 4096  # lanes per inner dot (the train kernel's proven width)


def _round_up(x, m):
    return -(-x // m) * m


# --------------------------------------------------------------------- #
# XLA-side layout construction                                          #
# --------------------------------------------------------------------- #


def sorted_labels(ids: jax.Array, K: int) -> Tuple[jax.Array, jax.Array]:
    """(labels_sorted (B, N) int32 in 1..K, counts (B, K) int32) from
    per-point categorical component ids — counts are bit-equal to the
    dense path's, labels are the sorted permutation of `ids + 1`."""
    one_hot = (ids[:, :, None]
               == jnp.arange(K, dtype=ids.dtype)[None, None]).astype(
                   jnp.int32)
    counts = jnp.sum(one_hot, axis=1)                       # (B, K)
    cum = jnp.cumsum(counts, axis=1)                        # (B, K)
    n_ids = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :, None]
    labels = 1 + jnp.sum(
        (n_ids >= cum[:, None, :]).astype(jnp.int32), axis=2
    )
    return labels.astype(jnp.int32), counts


def chunk_span(N: int, K: int, tb: int) -> int:
    """Static per-chunk lane span of the component-sorted layout."""
    return tb * (_round_up(N, _TILE) + K * _TILE)


def mixture_layout(counts: jax.Array, N: int, tb: int) -> Dict:
    """Chunk-layout tables for the component-sorted decode.

    counts: (B, K) int32 per-cloud component counts, rows summing to N.
    Returns dict with
      segs:   (nc, K*tb + 1) int32 — lane offset of each (k-major,
              cloud-minor) 128-padded segment within the chunk (cumsum)
      tile_b: (nc, S // 128) int32 — cloud id (0..tb-1) of each lane
              tile (filler tiles get the last segment's id — their
              outputs are never read)
    """
    B, K = counts.shape
    assert B % tb == 0, (B, tb)
    nc = B // tb
    S = chunk_span(N, K, tb)
    spad = _round_up(counts, _TILE)                          # (B, K)
    # k-major, cloud-minor order within each chunk
    sizes = jnp.transpose(
        spad.reshape(nc, tb, K), (0, 2, 1)
    ).reshape(nc, K * tb)
    segs = jnp.concatenate(
        [jnp.zeros((nc, 1), jnp.int32),
         jnp.cumsum(sizes, axis=1, dtype=jnp.int32)], axis=1
    )                                                        # (nc, K*tb+1)
    # tile -> segment index g (k*tb + b) via boundary comparison
    t_starts = (jnp.arange(S // _TILE, dtype=jnp.int32) * _TILE)[None, :]
    g = jnp.sum(
        (t_starts[:, :, None] >= segs[:, None, 1:]).astype(jnp.int32),
        axis=2,
    )                                                        # (nc, S//128)
    g = jnp.minimum(g, K * tb - 1)                           # filler
    return {"segs": segs, "tile_b": (g % tb).astype(jnp.int32)}


def compaction_indices(counts: jax.Array, segs: jax.Array, N: int,
                       tb: int) -> jax.Array:
    """(nc, tb*N) int32 lane indices into the chunk layout that compact
    it back to dense per-cloud clouds: entry (b_local*N + n) is the lane
    holding cloud b_local's n-th point (component-sorted order)."""
    B, K = counts.shape
    nc = B // tb
    cum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.cumsum(counts, axis=1, dtype=jnp.int32)], axis=1
    )                                                        # (B, K+1)
    n_ids = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)
    )
    k_of = jnp.sum(
        (n_ids[:, :, None] >= cum[:, None, 1:]).astype(jnp.int32), axis=2
    )                                                        # (B, N)
    k_of = jnp.minimum(k_of, K - 1)
    rank = n_ids - jnp.take_along_axis(cum, k_of, axis=1)
    b_local = jnp.broadcast_to(
        (jnp.arange(B, dtype=jnp.int32) % tb)[:, None], (B, N)
    )
    seg_idx = k_of * tb + b_local                            # (B, N)
    seg_start = jnp.take_along_axis(
        jnp.repeat(segs[:, :-1], tb, axis=0), seg_idx, axis=1
    )
    return (seg_start + rank).reshape(nc, tb * N)


# --------------------------------------------------------------------- #
# kernel                                                                #
# --------------------------------------------------------------------- #


def _sparse_kernel(C, K, tb, S, sub, prec,
                   eps_ref, segs_all_ref, tileb_all_ref,
                   w0_ref, b0_ref, w1_ref, w2_ref, b2_ref,
                   abf_ref, mus_ref, std_ref, out_ref, h_scr):
    """One chunk: base construction + the whole coupling chain, each
    point through its own component's flow only.

    The SMEM tables arrive as FULL (nc, ...) arrays indexed by the
    program id (per-chunk SMEM row blocks violate Mosaic's (8, 128)
    block-tiling rule for sub-array blocks)."""
    n_tiles = S // _TILE
    ci = pl.program_id(0)

    def segs_ref(j):
        return segs_all_ref[ci, j]

    def tileb_ref(t):
        return tileb_all_ref[ci, t]

    # base: x = mus[b] + std[b] * eps, per 128-lane tile (each tile
    # lies in one (k, cloud) segment, so its cloud id is a scalar)
    def base_tile(t, carry):
        b = tileb_ref(t)
        mu = mus_ref[0, pl.ds(b, 1)][0]           # (3, 1)
        sd = std_ref[0, pl.ds(b, 1)][0]
        sl = pl.ds(t * _TILE, _TILE)
        out_ref[0, :, sl] = mu + sd * eps_ref[0, :, sl]
        return carry

    jax.lax.fori_loop(0, n_tiles, base_tile, 0)

    def span_subtile(k, c, w, i, carry):
        """One `sub`-lane subtile of component k's span at coupling c."""
        w0, b0, w1, w2, b2 = w
        start = segs_ref(k * tb)
        end = segs_ref((k + 1) * tb)
        real_off = start + i * sub
        # clamp so the static-size window stays inside the chunk; lanes
        # before real_off (already processed by earlier subtiles) and at
        # or past `end` are write-masked below. Every term is a multiple
        # of the 128-lane tile (segs are cumsums of 128-padded sizes,
        # sub and S are 128-multiples) but Mosaic cannot prove that
        # through the SMEM load + minimum — assert it.
        off = pl.multiple_of(
            jnp.minimum(real_off, jnp.int32(S - sub)), _TILE
        )
        sl = pl.ds(off, sub)
        x = out_ref[0, :, sl]                            # (3, sub)
        h = jnp.maximum(_mxdot(w0, x, prec) + b0, 0.0)
        h_scr[:, :] = _mxdot(w1, h, prec)

        # per-cloud FiLM affine per 128-lane tile via the h scratch:
        # abf rows are (k*tb + b)*C + c, flattened so one dynamic
        # leading index suffices
        def film_tile(t, carry):
            tile = off // _TILE + t
            row = (jnp.int32(k * tb) + tileb_ref(tile)) \
                * jnp.int32(C) + c
            afb = abf_ref[0, pl.ds(row, 1)][0]           # (2, 2f)
            tsl = pl.ds(t * _TILE, _TILE)
            h_scr[:, tsl] = jnp.maximum(
                afb[0:1, :].T * h_scr[:, tsl] + afb[1:2, :].T, 0.0
            )
            return carry

        jax.lax.fori_loop(0, sub // _TILE, film_tile, 0)

        y = _mxdot(w2, h_scr[:, :], prec) + b2           # (6, sub)
        logvar = jax.nn.soft_sign(y[0:3, :])
        scale = jnp.sqrt(_EPS + jnp.exp(logvar))
        new = scale * x + y[3:6, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1) + off
        keep = (lane >= real_off) & (lane < end)
        out_ref[0, :, sl] = jnp.where(keep, new, x)
        return carry

    def coupling(c, carry):
        for k in range(K):  # static: weight rows, span boundaries
            w = tuple(
                r[0, k, pl.ds(c, 1)][0]
                for r in (w0_ref, b0_ref, w1_ref, w2_ref, b2_ref)
            )
            start = segs_ref(k * tb)
            end = segs_ref((k + 1) * tb)
            n_sub = (end - start + sub - 1) // sub
            jax.lax.fori_loop(
                0, n_sub, functools.partial(span_subtile, k, c, w), 0
            )
        return carry

    jax.lax.fori_loop(0, C, coupling, 0)


@functools.partial(
    jax.jit, static_argnames=("tb", "interpret", "precision_mode")
)
def _sparse_decode_call(packed, ab, eps, segs, tile_b, mus, std, tb,
                        interpret, precision_mode):
    K = packed["w1"].shape[0]
    C = packed["w1"].shape[1]
    f2 = packed["w1"].shape[2]
    nc, _, S = eps.shape
    sub = min(_SUB_MAX, S)
    # the kernel's pl.multiple_of(off, _TILE) is an UNCHECKED promise to
    # Mosaic — back it with static guards so a future _SUB_MAX /
    # chunk_span / mixture_layout change fails here, not silently there
    assert sub % _TILE == 0 and S % _TILE == 0, (sub, S, _TILE)

    # FiLM affines flattened to one dynamic-indexable (nc, K*tb*C, 2, f2)
    # table: row (k*tb + b_local)*C + c
    abf = jnp.transpose(
        ab.reshape(K, nc, tb, C, 2, f2), (1, 0, 2, 3, 4, 5)
    ).reshape(nc, K * tb * C, 2, f2)
    mus_c = mus.reshape(nc, tb, 3, 1)
    std_c = std.reshape(nc, tb, 3, 1)

    def wspec(arr):
        # whole (K, C, ...) weight stack resident per program (~3.3 MB
        # at flagship scale)
        s = (1,) + arr.shape
        return pl.BlockSpec(s, lambda i: (0,) * len(s))

    out = pl.pallas_call(
        functools.partial(
            _sparse_kernel, C, K, tb, S, sub, precision_mode
        ),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda i: (i, 0, 0)),       # eps
            pl.BlockSpec(segs.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tile_b.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            wspec(packed["w0"]),
            wspec(packed["b0"]),
            wspec(packed["w1"]),
            wspec(packed["w2"]),
            wspec(packed["b2"]),
            pl.BlockSpec((1,) + abf.shape[1:], lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, tb, 3, 1), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, tb, 3, 1), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 3, S), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nc, 3, S), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((f2, sub), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(
        eps.astype(jnp.float32),
        segs, tile_b,
        packed["w0"][None], packed["b0"][None], packed["w1"][None],
        packed["w2"][None], packed["b2"][None],
        abf, mus_c, std_c,
    )[0]
    return out


def pick_tb(B: int, cap: int = 8) -> int:
    """Clouds per chunk: the widest of (8, 4, 2, 1) dividing B."""
    for cand in (cap, 4, 2):
        if cand <= cap and B % cand == 0:
            return cand
    return 1


def sparse_sample_decode(packed, ab, key, counts, N: int,
                         mus, logvars, tb: int | None = None,
                         interpret: bool = False,
                         precision_mode: str = "highest"):
    """Component-sorted mixture sampling decode.

    packed: pack_point_decoder output with a leading K axis; ab: the
    matching film_alpha_beta output (K, B, C, 2, f2); counts: (B, K)
    per-cloud component counts; mus/logvars: the point-base parameters
    (B, 3, 1). Returns dense samples (B, 3, N) whose n-th point per
    cloud belongs to component `sorted_labels(...)[b, n] - 1`.
    """
    B = counts.shape[0]
    if tb is None:
        tb = pick_tb(B)
    layout = mixture_layout(counts, N, tb)
    nc = B // tb
    K = counts.shape[1]
    eps = jax.random.normal(key, (nc, 3, chunk_span(N, K, tb)))
    std = jnp.exp(0.5 * logvars)
    out = _sparse_decode_call(
        packed, ab, eps, layout["segs"], layout["tile_b"],
        mus, std, tb, interpret, precision_mode,
    )
    idx = compaction_indices(counts, layout["segs"], N, tb)
    dense = jnp.take_along_axis(out, idx[:, None, :], axis=2)
    return dense.reshape(nc, 3, tb, N).transpose(0, 2, 1, 3).reshape(
        B, 3, N
    )
