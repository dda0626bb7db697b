"""Pallas kernel tests (interpret mode on CPU): the fused Chamfer and EMD
kernels must match the XLA reference implementations exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from go_with_the_flows_tpu.ops.chamfer import chamfer
from go_with_the_flows_tpu.ops.emd import match_cost
from go_with_the_flows_tpu.ops.pallas.chamfer_kernel import chamfer_pallas
from go_with_the_flows_tpu.ops.pallas.emd_kernel import emd_cost_pallas


def _clouds(B=2, N=512, M=512, seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.rand(B, N, 3).astype(np.float32)),
        jnp.asarray(rng.rand(B, M, 3).astype(np.float32)),
    )


def test_chamfer_pallas_matches_xla():
    a, b = _clouds()
    dl_x, dr_x = chamfer(a, b)
    dl_p, dr_p = chamfer_pallas(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dr_p), np.asarray(dr_x),
                               rtol=1e-5, atol=1e-6)


def test_chamfer_pallas_pads_ragged_m():
    """M not a multiple of the tile: sentinel padding must not change
    results."""
    a, b = _clouds(N=512, M=512)
    b_short = b[:, :300]
    dl_x, dr_x = chamfer(a, b_short)
    dl_p, dr_p = chamfer_pallas(a, b_short, interpret=True)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dr_p), np.asarray(dr_x),
                               rtol=1e-5, atol=1e-6)
    assert dr_p.shape == (2, 300)


def test_emd_pallas_matches_xla():
    a, b = _clouds(B=3)
    c_x = np.asarray(match_cost(a, b))
    c_p = np.asarray(emd_cost_pallas(a, b, interpret=True))
    np.testing.assert_allclose(c_p, c_x, rtol=1e-4)


def test_emd_pallas_identical_clouds():
    a, _ = _clouds(B=2)
    c = np.asarray(emd_cost_pallas(a, a, interpret=True))
    assert (c / a.shape[1] < 1e-2).all()
