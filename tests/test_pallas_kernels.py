"""Pallas kernel tests (interpret mode on CPU): the fused Chamfer and EMD
kernels must match the XLA reference implementations exactly — forward
AND backward (the reference kernels are differentiable,
nndistance.cu:129-154 / approxmatch.cu:229-291)."""

import jax
import jax.numpy as jnp
import numpy as np

from go_with_the_flows_tpu.ops.chamfer import chamfer
from go_with_the_flows_tpu.ops.emd import match_cost
from go_with_the_flows_tpu.ops.chamfer import nn_distance
from go_with_the_flows_tpu.ops.pallas.chamfer_kernel import (
    chamfer_pallas,
    nn_distance_pallas,
)
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


def test_chamfer_pallas_svr_shape():
    """The SVR eval protocol shape (2500 -> 2500,
    scripts/run_evaluate_svr.sh): both N and M need padding."""
    a, b = _clouds(B=1, N=628, M=628, seed=3)
    dl_x, dr_x = chamfer(a, b)
    dl_p, dr_p = chamfer_pallas(a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dr_p), np.asarray(dr_x),
                               rtol=1e-5, atol=1e-6)
    assert dl_p.shape == (1, 628) and dr_p.shape == (1, 628)


def test_nn_distance_pallas_indices():
    a, b = _clouds(B=2, N=520, M=300, seed=1)
    dl_x, il_x, dr_x, ir_x = nn_distance(a, b)
    dl_p, il_p, dr_p, ir_p = nn_distance_pallas(a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(il_p), np.asarray(il_x))
    np.testing.assert_array_equal(np.asarray(ir_p), np.asarray(ir_x))
    np.testing.assert_allclose(np.asarray(dl_p), np.asarray(dl_x),
                               rtol=1e-5, atol=1e-6)


def test_chamfer_pallas_grads_match_xla():
    """Backward: gather/scatter of argmin residuals == autodiff through
    the XLA min (the CUDA NNDistanceGrad semantics)."""
    a, b = _clouds(B=2, N=520, M=300, seed=2)

    def loss_x(a, b):
        dl, dr = chamfer(a, b)
        return jnp.sum(dl * dl) + jnp.sum(jnp.sin(dr))

    def loss_p(a, b):
        dl, dr = chamfer_pallas(a, b, interpret=True)
        return jnp.sum(dl * dl) + jnp.sum(jnp.sin(dr))

    gx_a, gx_b = jax.grad(loss_x, argnums=(0, 1))(a, b)
    gp_a, gp_b = jax.grad(loss_p, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(gp_a), np.asarray(gx_a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_b), np.asarray(gx_b),
                               rtol=1e-5, atol=1e-6)


def test_emd_pallas_matches_xla():
    a, b = _clouds(B=3)
    c_x = np.asarray(match_cost(a, b))
    c_p = np.asarray(emd_cost_pallas(a, b, interpret=True))
    np.testing.assert_allclose(c_p, c_x, rtol=1e-4)


def test_emd_pallas_identical_clouds():
    a, _ = _clouds(B=2)
    c = np.asarray(emd_cost_pallas(a, a, interpret=True))
    assert (c / a.shape[1] < 1e-2).all()


def test_emd_pallas_padded_shape():
    """Non-tile-aligned sizes run via zero-capacity padding (the SVR
    2500-point protocol shape class)."""
    a, b = _clouds(B=2, N=600, M=600, seed=4)
    c_x = np.asarray(match_cost(a, b))
    c_p = np.asarray(emd_cost_pallas(a, b, interpret=True))
    np.testing.assert_allclose(c_p, c_x, rtol=1e-4)


def test_emd_pallas_unequal_sizes():
    """n != m runs with the reference's integer multiplicities
    (approxmatch.cu:4-12)."""
    a, b = _clouds(B=2, N=512, M=256, seed=5)
    c_x = np.asarray(match_cost(a, b))
    c_p = np.asarray(emd_cost_pallas(a, b, interpret=True))
    np.testing.assert_allclose(c_p, c_x, rtol=1e-4)


def test_emd_pallas_grads_match_xla():
    """Backward vs the XLA autodiff path (match stop-gradient'd, the
    MatchCostGrad semantics). Tolerance note: the auction's
    min(remainR/sumr, 1) threshold is discontinuous, so 1e-7-level
    accumulation-order differences between the two forwards can flip a
    column's consumption and move a few match entries by ~1e-3 (the
    reference CUDA kernel is atomicAdd-nondeterministic the same way);
    the tight consistency bound lives in
    test_emd_pallas_grads_self_consistent."""
    a, b = _clouds(B=2, N=300, M=300, seed=6)

    def loss_x(a, b):
        return jnp.sum(match_cost(a, b))

    def loss_p(a, b):
        return jnp.sum(emd_cost_pallas(a, b, interpret=True))

    gx_a, gx_b = jax.grad(loss_x, argnums=(0, 1))(a, b)
    gp_a, gp_b = jax.grad(loss_p, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(gp_a), np.asarray(gx_a),
                               rtol=1e-2, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gp_b), np.asarray(gx_b),
                               rtol=1e-2, atol=5e-4)


def test_emd_pallas_grads_self_consistent():
    """The backward kernel must equal the analytic gradient of
    sum_ij match_ij * ||a_i - b_j|| with match held constant, where match
    is reconstructed from the SAME residuals the forward stored — the
    exact MatchCostGrad contract (approxmatch.cu:229-291), checked
    tightly."""
    from go_with_the_flows_tpu.ops.emd import approx_match  # noqa: F401
    from go_with_the_flows_tpu.ops.pallas.emd_kernel import (
        _emd_pallas_call,
        _N_LEVELS,
    )

    a, b = _clouds(B=2, N=300, M=300, seed=6)
    _, rl, rr = _emd_pallas_call(a, b, save_ratios=True, interpret=True)
    rl, rr = np.asarray(rl), np.asarray(rr)
    P = rl.shape[2]
    ap = np.zeros((2, P, 3), np.float64)
    bp = np.zeros((2, P, 3), np.float64)
    ap[:, :300] = np.asarray(a)
    bp[:, :300] = np.asarray(b)
    diff = ap[:, :, None, :] - bp[:, None, :, :]  # (B, P, P, 3)
    d = (diff * diff).sum(-1)
    match = np.zeros_like(d)
    for l in range(_N_LEVELS):
        level = -(4.0 ** (7 - l))
        match += np.exp(level * d) * rl[:, l, :, None] * rr[:, l, None, :]
    inv = np.where(d > 1e-12, 1.0 / np.sqrt(np.maximum(d, 1e-12)), 0.0)
    coeff = (match * inv)[..., None]
    exp_da = (coeff * diff).sum(axis=2)[:, :300]
    exp_db = -(coeff * diff).sum(axis=1)[:, :300]

    def loss_p(a, b):
        return jnp.sum(emd_cost_pallas(a, b, interpret=True))

    gp_a, gp_b = jax.grad(loss_p, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(gp_a), exp_da,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_b), exp_db,
                               rtol=1e-4, atol=1e-5)


def test_emd_pallas_grad_weighted():
    """Upstream cotangent scaling flows through the custom VJP."""
    a, b = _clouds(B=2, N=256, M=256, seed=7)
    wts = jnp.asarray([0.25, -1.5])

    def loss_x(a, b):
        return jnp.sum(wts * match_cost(a, b))

    def loss_p(a, b):
        return jnp.sum(wts * emd_cost_pallas(a, b, interpret=True))

    gx_a = jax.grad(loss_x)(a, b)
    gp_a = jax.grad(loss_p)(a, b)
    np.testing.assert_allclose(np.asarray(gp_a), np.asarray(gx_a),
                               rtol=1e-4, atol=1e-6)
