"""On-chip pairwise metric grid kernels (ops/pallas/pairwise_kernel.py)
vs the XLA per-pair path — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.metrics.evaluation import (
    _paired_stats,
    compute_all_metrics,
    pairwise_EMD_CD_F1,
)
from go_with_the_flows_tpu.ops.pallas.pairwise_kernel import (
    pairwise_cd_stats_pallas,
    pairwise_emd_pallas,
)


def _clouds(rng, s, n):
    return jnp.asarray(rng.randn(s, n, 3).astype(np.float32) * 0.3)


def _xla_pair_matrix(samples, refs, thr, with_emd):
    """Reference entries via the per-pair XLA path, one pair at a time."""
    S, R = samples.shape[0], refs.shape[0]
    out = {k: np.zeros((S, R), np.float32)
           for k in ("cdl", "cdr", "emd", "f1")}
    for i in range(S):
        for j in range(R):
            cdl, cdr, emd, f1 = _paired_stats(
                samples[i:i + 1], refs[j:j + 1], thr, False, with_emd
            )
            out["cdl"][i, j] = float(cdl[0])
            out["cdr"][i, j] = float(cdr[0])
            out["emd"][i, j] = float(emd[0])
            out["f1"][i, j] = float(f1[0])
    return out


def test_pairwise_cd_stats_matches_xla():
    rng = np.random.RandomState(0)
    samples = _clouds(rng, 3, 96)
    refs = _clouds(rng, 4, 128)  # cross-size pair
    thr = 0.05
    cdl, cdr, prec, rec = pairwise_cd_stats_pallas(
        samples, refs, thr, interpret=True
    )
    want = _xla_pair_matrix(samples, refs, thr, with_emd=False)
    np.testing.assert_allclose(np.asarray(cdl), want["cdl"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cdr), want["cdr"],
                               rtol=1e-5, atol=1e-7)
    f1 = 2.0 * np.asarray(prec) * np.asarray(rec) / (
        np.asarray(prec) + np.asarray(rec) + 1e-7
    )
    np.testing.assert_allclose(f1, want["f1"], rtol=1e-4, atol=1e-5)


def test_pairwise_emd_matches_per_pair_kernel():
    """Grid EMD entries == the per-pair Pallas kernel (same body) and
    ~= the XLA auction path."""
    from go_with_the_flows_tpu.ops.pallas.emd_kernel import emd_cost_pallas

    rng = np.random.RandomState(1)
    samples = _clouds(rng, 2, 64)
    refs = _clouds(rng, 3, 96)
    cost = np.asarray(pairwise_emd_pallas(samples, refs, interpret=True))
    for i in range(2):
        for j in range(3):
            per_pair = float(
                emd_cost_pallas(samples[i:i + 1], refs[j:j + 1],
                                interpret=True)[0]
            )
            np.testing.assert_allclose(cost[i, j], per_pair, rtol=1e-6,
                                       err_msg=f"pair {i},{j}")

    from go_with_the_flows_tpu.ops.emd import match_cost

    xla_costs = np.stack([
        np.asarray(match_cost(
            jnp.broadcast_to(samples[i], (3,) + samples.shape[1:]), refs
        )) for i in range(2)
    ])
    np.testing.assert_allclose(cost, xla_costs, rtol=1e-4, atol=1e-5)


def test_pairwise_driver_pallas_equals_xla():
    """pairwise_EMD_CD_F1 with the grid kernels forced == the XLA path,
    entry for entry."""
    rng = np.random.RandomState(2)
    samples = np.asarray(_clouds(rng, 4, 64))
    refs = np.asarray(_clouds(rng, 5, 64))
    kw = dict(batch_size=3, f1_threshold=0.05, cd_option=True,
              emd_option=True, f1_option=True)
    got = pairwise_EMD_CD_F1(samples, refs, use_pallas=True, **kw)
    want = pairwise_EMD_CD_F1(samples, refs, use_pallas=False, **kw)
    for g, w, name in zip(got, want, ("cd", "emd", "f1", "cdl", "cdr")):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=1e-5,
                                   err_msg=name)


@pytest.mark.slow
def test_compute_all_metrics_pallas_path(monkeypatch):
    """End-metric agreement: MMD/COV/1-NNA via the grid kernels equals
    the XLA path on a small synthetic suite."""
    import go_with_the_flows_tpu.metrics.evaluation as ev

    rng = np.random.RandomState(3)
    gen = np.asarray(_clouds(rng, 6, 64))
    ref = np.asarray(_clouds(rng, 6, 64))
    kw = dict(batch_size=4, cd_option=True, emd_option=True)

    want = compute_all_metrics(gen, ref, **kw)
    monkeypatch.setattr(ev, "_pallas_eligible", lambda n, m: True)
    got = compute_all_metrics(gen, ref, **kw)
    for k in want:
        if "acc" in k or "lgan" in k:
            np.testing.assert_allclose(
                np.asarray(got[k], np.float64),
                np.asarray(want[k], np.float64),
                rtol=2e-4, atol=1e-6, err_msg=k,
            )


def test_pairwise_grid_sharded_over_mesh():
    """Under a >1-device mesh the pair grid shard_maps its row axis over
    'data' and must produce the same matrices (incl. an uneven row count
    that needs padding to the device multiple)."""
    from go_with_the_flows_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(4)
    samples = np.asarray(_clouds(rng, 11, 64))  # 11 % 8 != 0 -> pad path
    refs = np.asarray(_clouds(rng, 5, 64))
    kw = dict(batch_size=4, f1_threshold=0.05, cd_option=True,
              emd_option=True, f1_option=True)
    want = pairwise_EMD_CD_F1(samples, refs, use_pallas=True, **kw)

    mesh = make_mesh()
    assert mesh.size == 8
    with jax.set_mesh(mesh):
        got = pairwise_EMD_CD_F1(samples, refs, use_pallas=True, **kw)
    for g, w, name in zip(got, want, ("cd", "emd", "f1", "cdl", "cdr")):
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-7,
                                   err_msg=name)
