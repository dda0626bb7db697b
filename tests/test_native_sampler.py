"""Native C++ sampler tests: build, correctness vs geometry invariants,
statistical agreement with the numpy reference path, batch mode."""

import numpy as np
import pytest

from go_with_the_flows_tpu.data import native
from go_with_the_flows_tpu.data.cloud_sampling import sample_cloud
from go_with_the_flows_tpu.data.synthetic import _unit_cube_mesh

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def test_points_on_surface():
    rng = np.random.default_rng(0)
    v, f = _unit_cube_mesh(rng, jitter=0.0)
    pts = native.sample_cloud_native(v, f, 512, seed=1)
    assert pts.shape == (3, 512)
    np.testing.assert_allclose(np.abs(pts).max(axis=0), 0.5, atol=1e-5)


def test_deterministic_by_seed():
    v, f = _unit_cube_mesh(np.random.default_rng(0))
    a = native.sample_cloud_native(v, f, 64, seed=7)
    b = native.sample_cloud_native(v, f, 64, seed=7)
    c = native.sample_cloud_native(v, f, 64, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_statistical_agreement_with_numpy():
    """Means/covariances of native and numpy samplers must agree — they
    implement the same distribution."""
    rng = np.random.default_rng(3)
    v, f = _unit_cube_mesh(rng, jitter=0.1)
    n = 20000
    py = sample_cloud(v, f, n, rng=np.random.default_rng(0),
                      use_native=False)["cloud"]
    nat = native.sample_cloud_native(v, f, n, seed=5)
    np.testing.assert_allclose(py.mean(1), nat.mean(1), atol=0.02)
    np.testing.assert_allclose(np.cov(py), np.cov(nat), atol=0.02)


def test_batch_matches_single():
    rng = np.random.default_rng(1)
    meshes = [_unit_cube_mesh(rng) for _ in range(5)]
    verts = np.concatenate([v for v, _ in meshes])
    faces = np.concatenate([f for _, f in meshes])
    v_bounds = np.cumsum([0] + [len(v) for v, _ in meshes]).astype(np.int64)
    f_bounds = np.cumsum([0] + [len(f) for _, f in meshes]).astype(np.int64)
    out = native.sample_batch_native(
        verts, v_bounds, faces, f_bounds, n_samples=64, seed=42,
        n_threads=2,
    )
    assert out.shape == (5, 3, 64)
    for i, (v, f) in enumerate(meshes):
        single = native.sample_cloud_native(
            v, f, 64, seed=42 + i * 0x9E3779B9
        )
        np.testing.assert_allclose(out[i], single, rtol=1e-6)


def test_sample_cloud_auto_dispatch():
    """sample_cloud with use_native=True goes through the C++ path and
    returns the same shapes/split semantics."""
    rng = np.random.default_rng(2)
    v, f = _unit_cube_mesh(rng)
    s = sample_cloud(v, f, 32, return_eval_cloud=True,
                     rng=np.random.default_rng(0), use_native=True)
    assert s["cloud"].shape == (3, 32)
    assert s["eval_cloud"].shape == (3, 32)
    assert np.isfinite(s["cloud"]).all()
