"""Point-cloud evaluation metric suite: CD / EMD / F1 / JSD / MMD / COV /
1-NNA.

Re-implementation of the reference `lib/metrics/evaluation_metrics.py`
with the CUDA kernels replaced by the TPU ops in `..ops.chamfer` /
`..ops.emd`. Protocols (reductions, scales, thresholds) match the reference
exactly — see BASELINE.md for the measurement protocol table.

All cloud arguments are (S, N, 3) arrays (numpy or jax). The pairwise
drivers chunk work to bound device memory and reuse one jitted program per
chunk shape.
"""

from __future__ import annotations

import functools
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer
from ..ops.emd import emd_approx


def _pallas_eligible(n: int, m: int) -> bool:
    """Use the fused Pallas kernels on TPU when clouds are big enough to
    beat dispatch overhead; the kernels pad internally so any size works
    (incl. the SVR protocol's 2500 points and cross-size pairs like
    2048 vs 2500). Tiny shapes stay on XLA."""
    return jax.default_backend() == "tpu" and min(n, m) >= 512


@functools.partial(
    jax.jit, static_argnames=("f1_threshold", "use_pallas", "with_emd")
)
def _paired_stats(sample, ref, f1_threshold: float,
                  use_pallas: bool = False, with_emd: bool = True):
    """Per-pair CD parts, EMD and F1 for equal-length batches.
    F1 per reference evaluation_metrics.py:77-81: precision/recall are the
    fraction of points under the squared-distance threshold, x100.
    `with_emd=False` skips the (expensive) 9-level EMD entirely — under
    jit every returned output is computed, so CD-only evals must not
    trace it (the reference computes EMD on demand)."""
    if use_pallas:
        from ..ops.pallas.chamfer_kernel import chamfer_pallas
        from ..ops.pallas.emd_kernel import emd_cost_pallas

        dl, dr = chamfer_pallas(sample, ref)
        emd = (emd_cost_pallas(sample, ref) / sample.shape[1]
               if with_emd else jnp.zeros(sample.shape[0]))
    else:
        dl, dr = chamfer(sample, ref)
        emd = (emd_approx(sample, ref) if with_emd
               else jnp.zeros(sample.shape[0]))
    cdl = jnp.mean(dl, axis=1)
    cdr = jnp.mean(dr, axis=1)
    precision = 100.0 * jnp.mean((dr < f1_threshold).astype(jnp.float32), 1)
    recall = 100.0 * jnp.mean((dl < f1_threshold).astype(jnp.float32), 1)
    f1 = 2.0 * precision * recall / (precision + recall + 1e-7)
    return cdl, cdr, emd, f1


def EMD_CD_F1(
    sample_pcs,
    ref_pcs,
    batch_size: int,
    reduced: bool = True,
    cd_option: bool = False,
    emd_option: bool = False,
    one_part_of_cd: bool = False,
    f1_option: bool = False,
    f1_threshold: float = 1e-4,
) -> Dict[str, np.ndarray]:
    """Paired (i-th sample vs i-th ref) metrics
    (reference evaluation_metrics.py:46-100)."""
    n = sample_pcs.shape[0]
    assert n == ref_pcs.shape[0], f"REF:{ref_pcs.shape[0]} SMP:{n}"

    use_pallas = _pallas_eligible(sample_pcs.shape[1], ref_pcs.shape[1])
    cdl_all, cdr_all, emd_all, f1_all = [], [], [], []
    for s in range(0, n, batch_size):
        e = min(n, s + batch_size)
        cdl, cdr, emd, f1 = _paired_stats(
            jnp.asarray(sample_pcs[s:e]), jnp.asarray(ref_pcs[s:e]),
            f1_threshold, use_pallas, emd_option,
        )
        cdl_all.append(np.asarray(cdl))
        cdr_all.append(np.asarray(cdr))
        if emd_option:
            emd_all.append(np.asarray(emd))
        f1_all.append(np.asarray(f1))

    cdl = np.concatenate(cdl_all)
    cdr = np.concatenate(cdr_all)
    f1 = np.concatenate(f1_all)
    emd = np.concatenate(emd_all) if emd_option else np.zeros(0)

    def red(x):
        return x.mean() if reduced else x

    return {
        "CD": red(cdl + cdr) if cd_option else 0,
        "EMD": red(emd) if emd_option else 0,
        "F1": red(f1) if f1_option else 0,
        "CDL": red(cdl) if one_part_of_cd else 0,
        "CDR": red(cdr) if one_part_of_cd else 0,
    }


def pairwise_EMD_CD_F1(
    sample_pcs,
    ref_pcs,
    batch_size: int,
    f1_threshold: float = 1e-3,
    cd_option: bool = False,
    one_part_of_cd: bool = False,
    emd_option: bool = False,
    f1_option: bool = False,
    verbose: bool = False,
    use_pallas: Optional[bool] = None,
    process_shard: bool = True,
):
    """Full (N_sample, N_ref) metric matrices (reference
    evaluation_metrics.py:103-176, _pairwise_EMD_CD_F1_SCORE).

    TPU-first restructuring: the pair loop runs ON CHIP — one Pallas
    grid program per (sample row-chunk x full ref set), with each
    sample cloud resident in VMEM across its whole matrix row
    (ops/pallas/pairwise_kernel.py). No broadcast pair copies exist in
    HBM and the dispatch count drops to n_sample / chunk, while the
    per-pair arithmetic (and hence every matrix entry) is identical to
    the per-pair kernels. Off-TPU (or for tiny clouds) the XLA
    per-pair-batch path is used instead.

    Multi-host: sample ROWS are split contiguously across processes —
    each host computes only its block and the blocks are allgathered,
    so a P-process fleet runs the protocol's most expensive phase ~P x
    faster while every host still ends with the identical full matrices
    (the inputs are the already-gathered global buffers, see
    eval/evaluating.py). Matrix entries are per-pair quantities, so
    block boundaries cannot change any value. Known limitation: under
    process sharding each host's block runs on ONE local device
    (_grid_mesh returns no device mesh when process_count > 1 — the
    single-host shard_map cannot be nested there), so hosts with
    multiple local chips leave the extras idle in this phase.
    `process_shard=False` forces the old every-host-computes-everything
    behavior (used by the parity test as the oracle).

    `use_pallas`: None = auto (TPU + big-enough clouds); tests force it
    with interpret-mode kernels on CPU.
    """
    n_sample = sample_pcs.shape[0]
    n_ref = ref_pcs.shape[0]

    n_proc = jax.process_count()
    if process_shard and n_proc > 1 and n_sample > 1:
        return _pairwise_process_sharded(
            sample_pcs, ref_pcs, batch_size, f1_threshold, cd_option,
            one_part_of_cd, emd_option, f1_option, verbose, use_pallas,
        )

    if use_pallas is None:
        use_pallas = _pallas_eligible(sample_pcs.shape[1],
                                      ref_pcs.shape[1])
    if use_pallas:
        return _pairwise_pallas_grid(
            sample_pcs, ref_pcs, f1_threshold, emd_option, verbose,
            interpret=jax.default_backend() != "tpu",
        )

    cdl_m = np.zeros((n_sample, n_ref), np.float32)
    cdr_m = np.zeros((n_sample, n_ref), np.float32)
    emd_m = np.zeros((n_sample, n_ref), np.float32)
    f1_m = np.zeros((n_sample, n_ref), np.float32)
    max_pairs = max(batch_size, 60)
    samples_per_call = max(1, max_pairs // max(batch_size, 1))

    sample_dev = jnp.asarray(sample_pcs)
    ref_dev = jnp.asarray(ref_pcs)
    for i0 in range(0, n_sample, samples_per_call):
        i1 = min(n_sample, i0 + samples_per_call)
        S = i1 - i0
        for s in range(0, n_ref, batch_size):
            e = min(n_ref, s + batch_size)
            R = e - s
            # (S, R, N, 3) -> (S*R, N, 3) pair batches
            tiled = jnp.broadcast_to(
                sample_dev[i0:i1, None], (S, R) + sample_pcs.shape[1:]
            ).reshape(S * R, *sample_pcs.shape[1:])
            chunk = jnp.broadcast_to(
                ref_dev[None, s:e], (S, R) + ref_pcs.shape[1:]
            ).reshape(S * R, *ref_pcs.shape[1:])
            cdl, cdr, emd, f1 = _paired_stats(tiled, chunk, f1_threshold,
                                              False, emd_option)
            cdl_m[i0:i1, s:e] = np.asarray(cdl).reshape(S, R)
            cdr_m[i0:i1, s:e] = np.asarray(cdr).reshape(S, R)
            if emd_option:
                emd_m[i0:i1, s:e] = np.asarray(emd).reshape(S, R)
            f1_m[i0:i1, s:e] = np.asarray(f1).reshape(S, R)
        if verbose and (i1 % 50) < samples_per_call:
            print(f"pairwise: {i1}/{n_sample}")
    cd_m = cdl_m + cdr_m
    return cd_m, emd_m, f1_m, cdl_m, cdr_m


def _pairwise_process_sharded(sample_pcs, ref_pcs, batch_size,
                              f1_threshold, cd_option, one_part_of_cd,
                              emd_option, f1_option, verbose, use_pallas):
    """Row-block decomposition of pairwise_EMD_CD_F1 over processes.

    Process p computes rows [p*rows_per, (p+1)*rows_per) (last block
    padded by repeating the final row so every process contributes an
    equal-shaped block — required by process_allgather), then the blocks
    are allgathered and trimmed. Every host returns identical matrices.
    """
    from jax.experimental import multihost_utils

    sample_pcs = np.asarray(sample_pcs)
    ref_pcs = np.asarray(ref_pcs)
    n_sample = sample_pcs.shape[0]
    n_proc = jax.process_count()
    pid = jax.process_index()
    rows_per = -(-n_sample // n_proc)  # ceil
    lo = pid * rows_per
    # padded local block: global row index min(lo + i, n_sample - 1)
    idx = np.minimum(np.arange(lo, lo + rows_per), n_sample - 1)
    local = pairwise_EMD_CD_F1(
        sample_pcs[idx], ref_pcs, batch_size,
        f1_threshold=f1_threshold, cd_option=cd_option,
        one_part_of_cd=one_part_of_cd, emd_option=emd_option,
        f1_option=f1_option, verbose=verbose, use_pallas=use_pallas,
        process_shard=False,
    )
    # one gather for all five matrices: (5, rows_per, n_ref)
    stacked = np.stack([np.asarray(m, np.float32) for m in local])
    full = np.asarray(multihost_utils.process_allgather(stacked))
    # (n_proc, 5, rows_per, n_ref) -> five (n_sample, n_ref) matrices
    full = full.transpose(1, 0, 2, 3).reshape(
        5, n_proc * rows_per, ref_pcs.shape[0])[:, :n_sample]
    return tuple(full)


# pairs per dispatch for the on-chip grid: bounds single-dispatch
# runtime (~20 s at 2048-pt EMD pace) so long protocol runs stay
# responsive; outputs are scalars so memory is never a constraint
_GRID_PAIR_BUDGET = 16384


def _grid_mesh():
    """The ambient >1-device mesh to shard the pair grid over, or None.

    The (S, R) pair grid is embarrassingly parallel over matrix rows, so
    under a multi-device mesh (evaluate_ae.py wraps eval in jax.set_mesh)
    the row axis is shard_map'd over 'data' — a D-chip protocol run is
    ~D x faster. pallas_call itself has no GSPMD partitioning rule, so
    this wrap is also what keeps the kernels per-device.

    Multi-host runs shard matrix ROWS per process one level up
    (_pairwise_process_sharded), so within each process the grid runs
    host-locally — a global-device shard_map would need global-array
    plumbing the row split already makes unnecessary."""
    if jax.process_count() > 1:
        return None
    mesh = jax.sharding.get_abstract_mesh()
    if (not mesh.empty and mesh.size > 1
            and mesh.shape.get("data", 0) == mesh.size):
        return mesh
    return None


def _pairwise_pallas_grid(sample_pcs, ref_pcs, f1_threshold: float,
                          emd_option: bool, verbose: bool,
                          interpret: bool):
    """On-chip (S-chunk x R) pairwise matrices via the grid kernels."""
    import functools

    from jax.sharding import PartitionSpec as P

    from ..ops.pallas.pairwise_kernel import (
        pairwise_cd_stats_pallas,
        pairwise_emd_pallas,
    )

    n_sample = sample_pcs.shape[0]
    n_ref = ref_pcs.shape[0]
    n_pts = sample_pcs.shape[1]
    cdl_m = np.zeros((n_sample, n_ref), np.float32)
    cdr_m = np.zeros((n_sample, n_ref), np.float32)
    emd_m = np.zeros((n_sample, n_ref), np.float32)
    f1_m = np.zeros((n_sample, n_ref), np.float32)

    cd_call = functools.partial(pairwise_cd_stats_pallas,
                                f1_threshold=f1_threshold,
                                interpret=interpret)
    emd_call = functools.partial(pairwise_emd_pallas, interpret=interpret)
    mesh = _grid_mesh()
    n_dev = 1
    if mesh is not None:
        n_dev = mesh.size
        # rows shard over 'data', refs replicate on every device
        cd_call = jax.jit(jax.shard_map(
            cd_call, mesh=mesh, in_specs=(P("data"), P()),
            out_specs=(P("data"),) * 4, check_vma=False,
        ))
        emd_call = jax.jit(jax.shard_map(
            emd_call, mesh=mesh, in_specs=(P("data"), P()),
            out_specs=P("data"), check_vma=False,
        ))

    s_chunk = max(1, _GRID_PAIR_BUDGET // max(n_ref, 1))
    s_chunk = max(s_chunk, n_dev)
    sample_dev = jnp.asarray(sample_pcs)
    ref_dev = jnp.asarray(ref_pcs)
    for i0 in range(0, n_sample, s_chunk):
        i1 = min(n_sample, i0 + s_chunk)
        sub = sample_dev[i0:i1]
        pad = (-sub.shape[0]) % n_dev  # equal per-device rows
        if pad:
            sub = jnp.concatenate(
                [sub, jnp.broadcast_to(sub[-1:], (pad,) + sub.shape[1:])]
            )
        S = i1 - i0
        cdl, cdr, prec, rec = cd_call(sub, ref_dev)
        cdl_m[i0:i1] = np.asarray(cdl)[:S]
        cdr_m[i0:i1] = np.asarray(cdr)[:S]
        prec = np.asarray(prec)[:S]
        rec = np.asarray(rec)[:S]
        f1_m[i0:i1] = 2.0 * prec * rec / (prec + rec + 1e-7)
        if emd_option:
            emd_m[i0:i1] = np.asarray(
                emd_call(sub, ref_dev)
            )[:S] / n_pts
        if verbose:
            print(f"pairwise: {i1}/{n_sample}")
    return cdl_m + cdr_m, emd_m, f1_m, cdl_m, cdr_m


def knn_two_sample(Mxx, Mxy, Myy, k: int = 1) -> Dict[str, float]:
    """k-NN two-sample classifier accuracies from precomputed distance
    blocks (reference evaluation_metrics.py:180-209). 1-NNA ideal = 50%."""
    Mxx, Mxy, Myy = map(np.asarray, (Mxx, Mxy, Myy))
    n0, n1 = Mxx.shape[0], Myy.shape[0]
    label = np.concatenate([np.ones(n0), np.zeros(n1)])
    M = np.block([[Mxx, Mxy], [Mxy.T, Myy]])
    np.fill_diagonal(M, np.inf)
    # indices of the k smallest per column (reference topk(k, 0, False))
    idx = np.argpartition(M, k - 1, axis=0)[:k]
    count = label[idx].sum(axis=0)
    pred = (count >= k / 2.0).astype(np.float64)

    tp = float((pred * label).sum())
    fp = float((pred * (1 - label)).sum())
    fn = float(((1 - pred) * label).sum())
    tn = float(((1 - pred) * (1 - label)).sum())
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": tp / (tp + fp + 1e-10),
        "recall": tp / (tp + fn + 1e-10),
        "acc_t": tp / (tp + fn + 1e-10),
        "acc_f": tn / (tn + fp + 1e-10),
        "acc": float((pred == label).mean()),
    }


def lgan_mmd_cov(all_dist, mode: str = "min") -> Dict[str, np.ndarray]:
    """MMD + coverage from a (N_sample, N_ref) distance matrix
    (reference evaluation_metrics.py:211-229)."""
    all_dist = np.asarray(all_dist)
    n_ref = all_dist.shape[1]
    if mode == "min":
        val_fromsmp = all_dist.min(axis=1)
        idx = all_dist.argmin(axis=1)
        val = all_dist.min(axis=0)
        idx_mmd = all_dist.argmin(axis=0)
    else:
        val_fromsmp = all_dist.max(axis=1)
        idx = all_dist.argmax(axis=1)
        val = all_dist.max(axis=0)
        idx_mmd = all_dist.argmax(axis=0)
    return {
        "lgan_mmd": val.mean(),
        "lgan_cov": float(len(np.unique(idx))) / float(n_ref),
        "lgan_mmd_smp": val_fromsmp.mean(),
        "idx_mmd": idx_mmd,
        "mmd_contrib": val,
    }


def compute_all_metrics(
    sample_pcs,
    ref_pcs,
    batch_size: int,
    f1_threshold: float = 1e-3,
    cd_option: bool = False,
    one_part_of_cd: bool = False,
    emd_option: bool = False,
    f1_option: bool = False,
    verbose: bool = False,
    ref_cache: Optional[dict] = None,
    use_pallas: Optional[bool] = None,
) -> Dict[str, float]:
    """MMD/COV (sample-vs-ref) + 1-NNA (ss, rs, rr) over CD / EMD / F1
    (reference evaluation_metrics.py:232-309).

    `use_pallas`: forwarded to pairwise_EMD_CD_F1 (None = auto: TPU +
    big-enough clouds; True forces the grid kernels — interpret mode on
    CPU, used by the multichip eval dryrun to exercise the
    device-sharded pair grid on a virtual mesh).

    `ref_cache`: an empty dict owned by the caller that survives across
    repeated calls with the SAME reference set (the 10-rep generating
    protocol, evaluate_ae.py --reps): the ref-vs-ref pairwise matrices —
    a third of the protocol's dominant cost, identical every rep — are
    computed once and reused. Entries are keyed by the metric options
    and guarded by a checksum of `ref_pcs`, so a changed reference set
    (or thresholds) transparently recomputes; cached numbers are the
    exact arrays a fresh call would produce."""
    results: Dict[str, float] = {}
    opts = dict(
        f1_threshold=f1_threshold, cd_option=cd_option,
        one_part_of_cd=one_part_of_cd, emd_option=emd_option,
        f1_option=f1_option, verbose=verbose, use_pallas=use_pallas,
    )
    rs_cd, rs_emd, rs_f1, rs_cdl, rs_cdr = pairwise_EMD_CD_F1(
        sample_pcs, ref_pcs, batch_size, **opts
    )

    def upd(prefix, res):
        results.update({f"{k}-{prefix}": v for k, v in res.items()})

    if cd_option:
        upd("CD", lgan_mmd_cov(rs_cd))
    if emd_option:
        upd("EMD", lgan_mmd_cov(rs_emd))
    if f1_option:
        upd("F1", lgan_mmd_cov(rs_f1, "max"))
    if one_part_of_cd:
        upd("CD-left", lgan_mmd_cov(rs_cdl))
        upd("CD-right", lgan_mmd_cov(rs_cdr))

    rr = None
    if ref_cache is not None:
        import hashlib

        key = (
            "rr", ref_pcs.shape, float(f1_threshold), cd_option,
            one_part_of_cd, emd_option, f1_option, batch_size, use_pallas,
        )
        # content hash, not a sum: a permuted/edited reference set must
        # MISS (rr rows must stay aligned with the rs columns). ~10 MB
        # at protocol size -> ~10 ms once per rep, noise next to the
        # matrices it guards
        checksum = hashlib.sha1(
            np.ascontiguousarray(ref_pcs, np.float32).tobytes()
        ).hexdigest()
        hit = ref_cache.get(key)
        if hit is not None and hit[0] == checksum:
            rr = hit[1]
    if rr is None:
        rr = pairwise_EMD_CD_F1(ref_pcs, ref_pcs, batch_size, **opts)
        if ref_cache is not None:
            ref_cache[key] = (checksum, rr)
    ss = pairwise_EMD_CD_F1(sample_pcs, sample_pcs, batch_size, **opts)

    def upd_nn(prefix, Mss, Mrs, Mrr):
        res = knn_two_sample(Mss, Mrs, Mrr, k=1)
        results.update({
            f"1-NN-{prefix}-{k}": v for k, v in res.items() if "acc" in k
        })

    if cd_option:
        upd_nn("CD", ss[0], rs_cd, rr[0])
    if emd_option:
        upd_nn("EMD", ss[1], rs_emd, rr[1])
    if f1_option:
        upd_nn("F1", ss[2], rs_f1, rr[2])
    if one_part_of_cd:
        upd_nn("CD-left", ss[3], rs_cdl, rr[3])
        upd_nn("CD-right", ss[4], rs_cdr, rr[4])
    return results


# --------------------------------------------------------------------- #
# JSD over occupancy grids (host-side numpy; reference                  #
# evaluation_metrics.py:315-430, from latent_3d_points)                 #
# --------------------------------------------------------------------- #

def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool = False):
    """Cell-center coordinates of a resolution^3 grid in the unit cube
    (reference evaluation_metrics.py:315-333)."""
    spacing = 1.0 / float(resolution - 1)
    ax = np.arange(resolution, dtype=np.float32) * spacing - 0.5
    grid = np.stack(
        np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1
    ).astype(np.float32)
    if clip_sphere:
        grid = grid.reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


def entropy_of_occupancy_grid(
    pclouds, grid_resolution: int, in_sphere: bool = False
):
    """Mean per-cell Bernoulli entropy + total occupancy counters
    (reference evaluation_metrics.py:350-390)."""
    from sklearn.neighbors import NearestNeighbors
    from scipy.stats import entropy

    pclouds = np.asarray(pclouds)
    bound = 0.5 + 1e-3
    if abs(pclouds.max()) > bound or abs(pclouds.min()) > bound:
        warnings.warn("Point-clouds are not in unit cube.")
    if in_sphere and np.sqrt((pclouds ** 2).sum(2)).max() > bound:
        warnings.warn("Point-clouds are not in unit sphere.")

    grid_coordinates, _ = unit_cube_grid_point_cloud(
        grid_resolution, in_sphere
    )
    grid_coordinates = grid_coordinates.reshape(-1, 3)
    n_cells = len(grid_coordinates)
    grid_counters = np.zeros(n_cells)
    grid_bernoulli_rvars = np.zeros(n_cells)
    nn = NearestNeighbors(n_neighbors=1).fit(grid_coordinates)

    for pc in pclouds:
        _, indices = nn.kneighbors(pc)
        indices = np.squeeze(indices)
        np.add.at(grid_counters, indices, 1)
        unique = np.unique(indices)
        grid_bernoulli_rvars[unique] += 1

    acc_entropy = 0.0
    n = float(len(pclouds))
    for g in grid_bernoulli_rvars:
        if g > 0:
            p = float(g) / n
            acc_entropy += entropy([p, 1.0 - p])
    return acc_entropy / n_cells, grid_counters


def jensen_shannon_divergence(P, Q) -> float:
    """Base-2 JSD between two (unnormalized) histograms
    (reference evaluation_metrics.py:393-430)."""
    from scipy.stats import entropy

    P, Q = np.asarray(P, np.float64), np.asarray(Q, np.float64)
    if np.any(P < 0) or np.any(Q < 0):
        raise ValueError("Negative values.")
    if len(P) != len(Q):
        raise ValueError("Non equal size.")
    P_ = P / P.sum()
    Q_ = Q / Q.sum()
    e1 = entropy(P_, base=2)
    e2 = entropy(Q_, base=2)
    e_sum = entropy((P_ + Q_) / 2.0, base=2)
    return float(e_sum - (e1 + e2) / 2.0)


def jsd_between_point_cloud_sets(
    sample_pcs, ref_pcs, resolution: int = 28
) -> float:
    """JSD between two sets of clouds via 28^3 occupancy grids
    (reference evaluation_metrics.py:336-347)."""
    sample_var = entropy_of_occupancy_grid(
        sample_pcs, resolution, in_sphere=True
    )[1]
    ref_var = entropy_of_occupancy_grid(ref_pcs, resolution, in_sphere=True)[1]
    return jensen_shannon_divergence(sample_var, ref_var)


# --------------------------------------------------------------------- #
# Voxel-histogram JSD — the variant the eval driver actually uses       #
# (reference lib/networks/utils.py:45-87: a 28^3 voxel OCCUPANCY-COUNT  #
# distribution, not the per-cell Bernoulli grid above)                  #
# --------------------------------------------------------------------- #

def voxel_occupancy_dist(
    all_clouds, res: int = 28, bound: float = 0.5, warn: bool = True,
    flag: str = "gen",
) -> np.ndarray:
    """Normalized voxel point-count histogram over [-bound, bound)^3;
    points outside the cube are dropped (utils.py:45-81). Clouds are
    (S, N, 3)."""
    all_clouds = np.asarray(all_clouds)
    if warn and np.any(np.fabs(all_clouds) > bound):
        print(f"{flag} clouds out of cube bounds: [-{bound}; {bound}]")
    n_nans = int(np.isnan(all_clouds).sum())
    if n_nans > 0:
        print(f"{n_nans} NaN values in point cloud tensors.")

    edges = -bound + np.arange(res + 1) * (2 * bound / res)
    pts = all_clouds.reshape(-1, 3)
    hist = np.zeros((res, res, res), np.uint64)
    idx = np.stack(
        [np.digitize(pts[:, c], edges) - 1 for c in range(3)], axis=1
    )
    valid = ((idx >= 0) & (idx < res)).all(axis=1)
    idx = idx[valid]
    np.add.at(hist, (idx[:, 0], idx[:, 1], idx[:, 2]), 1)
    return np.float64(hist) / max(hist.sum(), 1)


def voxel_jsd(clouds1, clouds2, warn: bool = True) -> float:
    """Base-2 JSD between voxel occupancy-count distributions
    (utils.py:83-87) — the generative-eval JSD."""
    from scipy.stats import entropy

    d1 = voxel_occupancy_dist(clouds1, warn=warn, flag="gen")
    d2 = voxel_occupancy_dist(clouds2, warn=warn, flag="ref")
    return float(
        entropy(((d1 + d2) / 2.0).flatten(), base=2)
        - 0.5 * (entropy(d1.flatten(), base=2)
                 + entropy(d2.flatten(), base=2))
    )


def f_score(predicted, true, threshold: float = 1e-3):
    """Streaming per-batch F1 (reference utils.py:38-42); clouds (B,N,3)."""
    import jax.numpy as _jnp

    dl, dr = chamfer(_jnp.asarray(predicted), _jnp.asarray(true))
    precision = 100.0 * np.asarray(
        (dr < threshold).astype(np.float32).mean(axis=1)
    )
    recall = 100.0 * np.asarray(
        (dl < threshold).astype(np.float32).mean(axis=1)
    )
    return 2.0 * precision * recall / (precision + recall + 1e-7)
