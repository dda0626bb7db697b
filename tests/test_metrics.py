"""Metric-suite tests against independent oracles: brute-force numpy
Chamfer, scipy Hungarian EMD (the small-N exact oracle SURVEY.md §4
prescribes), and hand-computable MMD/COV/1-NNA cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.ops.chamfer import chamfer, nn_distance
from go_with_the_flows_tpu.ops.emd import approx_match, match_cost, emd_approx
from go_with_the_flows_tpu.metrics.evaluation import (
    EMD_CD_F1,
    pairwise_EMD_CD_F1,
    knn_two_sample,
    lgan_mmd_cov,
    compute_all_metrics,
    jsd_between_point_cloud_sets,
)


def _np_chamfer(a, b):
    d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1)


class TestChamfer:
    def test_vs_bruteforce(self):
        rng = np.random.RandomState(0)
        a = rng.randn(3, 32, 3).astype(np.float32)
        b = rng.randn(3, 24, 3).astype(np.float32)
        dl, dr = chamfer(jnp.asarray(a), jnp.asarray(b))
        el, er = _np_chamfer(a, b)
        np.testing.assert_allclose(np.asarray(dl), el, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dr), er, rtol=1e-4, atol=1e-5)

    def test_nn_distance_indices(self):
        rng = np.random.RandomState(1)
        a = rng.randn(2, 16, 3).astype(np.float32)
        b = rng.randn(2, 16, 3).astype(np.float32)
        dl, il, dr, ir = nn_distance(jnp.asarray(a), jnp.asarray(b))
        d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(il), d.argmin(2))
        np.testing.assert_array_equal(np.asarray(ir), d.argmin(1))

    def test_gradient_flows(self):
        a = jnp.asarray(np.random.RandomState(2).randn(1, 8, 3), jnp.float32)
        b = a + 0.1

        def loss(x):
            dl, dr = chamfer(x, b)
            return jnp.sum(dl) + jnp.sum(dr)

        g = jax.grad(loss)(a)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestEMD:
    def test_identical_clouds_near_zero(self):
        rng = np.random.RandomState(0)
        a = rng.randn(2, 64, 3).astype(np.float32)
        e = np.asarray(emd_approx(jnp.asarray(a), jnp.asarray(a)))
        assert (e < 1e-2).all(), e

    def test_match_is_doubly_stochastic_ish(self):
        """With n == m, row and column sums of the match approach 1
        (capacity 1 per point, approxmatch.cu:6-21)."""
        rng = np.random.RandomState(1)
        # unit-cube clouds: distances are small enough that the 9 levels
        # consume all capacity (far-apart gaussian clouds legitimately
        # leave residual mass, as does the reference whose final level is
        # -0.25, not 0 — approxmatch.cu:24-28)
        a = rng.rand(1, 32, 3).astype(np.float32)
        b = rng.rand(1, 32, 3).astype(np.float32)
        m = np.asarray(approx_match(jnp.asarray(a), jnp.asarray(b)))[0]
        assert m.min() >= 0
        np.testing.assert_allclose(m.sum(1), 1.0, atol=0.01)
        np.testing.assert_allclose(m.sum(0), 1.0, atol=0.01)
        # capacity constraints are never exceeded
        assert (m.sum(1) <= 1.0 + 1e-5).all()
        assert (m.sum(0) <= 1.0 + 1e-5).all()

    def test_vs_hungarian_oracle(self):
        """Approximate EMD must be close to (and >= up to approx error)
        the exact assignment cost from scipy's Hungarian solver."""
        from scipy.optimize import linear_sum_assignment

        rng = np.random.RandomState(2)
        for trial in range(3):
            a = rng.rand(1, 24, 3).astype(np.float32)
            b = rng.rand(1, 24, 3).astype(np.float32)
            cost = np.linalg.norm(a[0][:, None] - b[0][None], axis=-1)
            ri, ci = linear_sum_assignment(cost)
            exact = cost[ri, ci].sum()
            approx = float(match_cost(jnp.asarray(a), jnp.asarray(b))[0])
            assert approx >= exact * 0.98, (approx, exact)
            assert approx <= exact * 1.35, (approx, exact)

    def test_gradient_matches_fixed_match(self):
        """Backward must treat the match as constant
        (reference match_cost.py:6-44)."""
        rng = np.random.RandomState(3)
        a = rng.randn(1, 16, 3).astype(np.float32)
        b = rng.randn(1, 16, 3).astype(np.float32)
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        g = jax.grad(lambda x: jnp.sum(match_cost(x, bj)))(aj)
        m = np.asarray(approx_match(aj, bj))[0]
        diff = a[0][:, None] - b[0][None]  # (n, m, 3)
        dist = np.sqrt((diff ** 2).sum(-1)) + 1e-12
        expected = (m[:, :, None] * diff / dist[:, :, None]).sum(1)
        np.testing.assert_allclose(
            np.asarray(g)[0], expected, rtol=1e-3, atol=1e-4
        )


class TestSuites:
    def test_paired_identical(self):
        rng = np.random.RandomState(0)
        pcs = rng.rand(6, 32, 3).astype(np.float32)
        res = EMD_CD_F1(pcs, pcs, batch_size=3, cd_option=True,
                        emd_option=True, f1_option=True, f1_threshold=1e-4)
        assert float(res["CD"]) < 1e-6
        assert float(res["EMD"]) < 1e-2
        assert float(res["F1"]) > 99.0

    def test_mmd_cov(self):
        d = np.array([[0.1, 0.9], [0.8, 0.2]])
        res = lgan_mmd_cov(d)
        np.testing.assert_allclose(res["lgan_mmd"], (0.1 + 0.2) / 2)
        np.testing.assert_allclose(res["lgan_cov"], 1.0)
        d2 = np.array([[0.1, 0.9], [0.2, 0.8]])
        assert lgan_mmd_cov(d2)["lgan_cov"] == 0.5

    def test_knn_perfectly_separable(self):
        """Samples clustered together, refs clustered together ->
        1-NNA accuracy 1.0; identical distributions -> ~0.5."""
        ss = np.full((4, 4), 0.1)
        rr = np.full((4, 4), 0.1)
        rs = np.full((4, 4), 5.0)
        res = knn_two_sample(ss, rs, rr, k=1)
        assert res["acc"] == 1.0

    def test_compute_all_metrics_random(self):
        """The reference's own smoke protocol
        (evaluation_metrics.py:433-442): random vs random -> 1-NNA ~ 0.5,
        COV well above 0."""
        rng = np.random.RandomState(0)
        x = rng.rand(8, 64, 3).astype(np.float32)
        y = rng.rand(8, 64, 3).astype(np.float32)
        res = compute_all_metrics(
            x, y, batch_size=4, cd_option=True, emd_option=True,
            f1_option=True,
        )
        assert 0.2 <= res["1-NN-CD-acc"] <= 0.8
        assert res["lgan_mmd-CD"] > 0
        assert res["lgan_cov-CD"] > 0.2

    def test_compute_all_metrics_ref_cache(self):
        """The reps-loop rr cache: identical numbers with and without
        the cache, cache populated on the first call and HIT on the
        second (monkeypatched pairwise counter), checksum mismatch
        recomputes."""
        import go_with_the_flows_tpu.metrics.evaluation as ev

        rng = np.random.RandomState(3)
        x1 = rng.rand(6, 48, 3).astype(np.float32)
        x2 = rng.rand(6, 48, 3).astype(np.float32)
        y = rng.rand(6, 48, 3).astype(np.float32)
        kw = dict(batch_size=3, cd_option=True, f1_option=True)

        plain1 = compute_all_metrics(x1, y, **kw)
        plain2 = compute_all_metrics(x2, y, **kw)

        calls = []
        orig = ev.pairwise_EMD_CD_F1

        def counting(a, b, *args, **k):
            calls.append((a.shape, b.shape))
            return orig(a, b, *args, **k)

        ev.pairwise_EMD_CD_F1 = counting
        try:
            cache = {}
            got1 = compute_all_metrics(x1, y, ref_cache=cache, **kw)
            n_first = len(calls)
            got2 = compute_all_metrics(x2, y, ref_cache=cache, **kw)
            n_second = len(calls) - n_first
        finally:
            ev.pairwise_EMD_CD_F1 = orig

        assert n_first == 3 and n_second == 2  # rr skipped on rep 2
        for k in plain1:
            assert np.array_equal(got1[k], plain1[k]), k
            assert np.array_equal(got2[k], plain2[k]), k

        # changed reference set under the same cache -> recompute
        calls.clear()
        ev.pairwise_EMD_CD_F1 = counting
        try:
            y2 = y + 0.01
            fresh = compute_all_metrics(x1, y2, ref_cache=cache, **kw)
        finally:
            ev.pairwise_EMD_CD_F1 = orig
        assert len(calls) == 3
        want = compute_all_metrics(x1, y2, **kw)
        for k in want:
            assert np.array_equal(fresh[k], want[k]), k

    def test_pairwise_matrix_consistency(self):
        """Diagonal of sample-vs-sample CD must be ~0 and the matrix
        symmetric for CD."""
        rng = np.random.RandomState(1)
        x = rng.rand(5, 32, 3).astype(np.float32)
        cd, _, _, _, _ = pairwise_EMD_CD_F1(x, x, batch_size=5,
                                            cd_option=True)
        np.testing.assert_allclose(np.diag(cd), 0.0, atol=1e-5)
        np.testing.assert_allclose(cd, cd.T, rtol=1e-3, atol=1e-5)


class TestJSD:
    def test_identical_sets_zero(self):
        rng = np.random.RandomState(0)
        pcs = (rng.rand(4, 128, 3).astype(np.float32) - 0.5) * 0.5
        assert jsd_between_point_cloud_sets(pcs, pcs) < 1e-9

    def test_disjoint_sets_positive(self):
        rng = np.random.RandomState(1)
        a = rng.rand(4, 128, 3).astype(np.float32) * 0.2 + 0.2
        b = rng.rand(4, 128, 3).astype(np.float32) * 0.2 - 0.4
        assert jsd_between_point_cloud_sets(a, b) > 0.3
