"""Unit tests for the coupling flows: invertibility and log-det correctness.

These are the tests the reference lacks (SURVEY.md §4): per-coupling and
per-stack direct(inverse(x)) ≈ x, and log|det J| checked against an autodiff
Jacobian on small dimensions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.models.flows import (
    CondAffineCoupling3D,
    PointDecoderFlow,
    LatentAffineCoupling,
    LatentPriorFlow,
    point_decoder_param_count,
)

EPS = 1e-6


def _init(module, *args, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return variables


class TestPointCoupling:
    def _roundtrip(self, train):
        B, N, F = 4, 16, 8
        key = jax.random.PRNGKey(1)
        p = jax.random.normal(key, (B, 3, N))
        g = jax.random.normal(jax.random.PRNGKey(2), (B, 12))
        m = CondAffineCoupling3D(warp_inds=(0, 2), f_features=F)
        variables = _init(m, p, g, mode="direct", train=train)
        mutable = ["batch_stats"] if train else False
        out = m.apply(variables, p, g, mode="direct", train=train,
                      mutable=mutable)
        p_fwd, logvar = out[0] if train else out
        out = m.apply(variables, p_fwd, g, mode="inverse", train=train,
                      mutable=mutable)
        p_back, _ = out[0] if train else out
        np.testing.assert_allclose(np.asarray(p_back), np.asarray(p),
                                   rtol=1e-5, atol=1e-5)
        # kept channel untouched up to the sqrt(1+eps) factor
        np.testing.assert_allclose(
            np.asarray(p_fwd[:, 1, :]),
            np.asarray(p[:, 1, :]) * np.sqrt(1.0 + EPS),
            rtol=1e-6,
        )

    def test_roundtrip_eval(self):
        self._roundtrip(train=False)

    def test_roundtrip_train(self):
        self._roundtrip(train=True)

    def test_logdet_vs_jacobian(self):
        """True log|det J| of one coupling at a single point must equal
        sum over dims of 0.5*log(eps + exp(logvar))."""
        B, N, F = 1, 2, 8
        p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
        g = jax.random.normal(jax.random.PRNGKey(2), (B, 6))
        m = CondAffineCoupling3D(warp_inds=(1,), f_features=F,
                                 weight_std=1.5)
        variables = _init(m, p, g, mode="direct", train=False)

        def f(flat):
            out, _ = m.apply(variables, flat.reshape(B, 3, N), g,
                             mode="direct", train=False)
            return out.reshape(-1)

        J = jax.jacfwd(f)(p.reshape(-1))
        _, logvar = m.apply(variables, p, g, mode="direct", train=False)
        expected = jnp.sum(0.5 * jnp.log(EPS + jnp.exp(logvar)))
        sign, logdet = jnp.linalg.slogdet(J)
        assert sign > 0
        np.testing.assert_allclose(float(logdet), float(expected), rtol=1e-4)


class TestPointStack:
    @pytest.mark.parametrize("train", [False, True])
    def test_roundtrip(self, train):
        B, N, F, n_flows = 3, 32, 8, 4
        p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
        g = jax.random.normal(jax.random.PRNGKey(2), (B, 12))
        m = PointDecoderFlow(n_flows=n_flows, f_features=F, g_features=12)
        variables = _init(m, p, g, mode="direct", train=train)
        mutable = ["batch_stats"] if train else False
        out = m.apply(variables, p, g, mode="direct", train=train,
                      mutable=mutable)
        (p_fwd, lv_sum_fwd) = out[0] if train else out
        out = m.apply(variables, p_fwd, g, mode="inverse", train=train,
                      mutable=mutable)
        (p_back, lv_sum_back) = out[0] if train else out
        np.testing.assert_allclose(np.asarray(p_back), np.asarray(p),
                                   rtol=2e-4, atol=2e-5)
        # logvar sums agree between directions (same couplings visited)
        np.testing.assert_allclose(np.asarray(lv_sum_fwd),
                                   np.asarray(lv_sum_back),
                                   rtol=1e-4, atol=1e-5)

    def test_near_identity_at_init(self):
        """With near-identity init the direct map should be ~identity
        (reference init: last-layer weights N(0, 0.01), flows.py:52-58)."""
        B, N = 2, 16
        p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
        g = jax.random.normal(jax.random.PRNGKey(2), (B, 12))
        m = PointDecoderFlow(n_flows=3, f_features=8, g_features=12)
        variables = _init(m, p, g, mode="direct", train=False)
        p_fwd, _ = m.apply(variables, p, g, mode="direct", train=False)
        assert float(jnp.max(jnp.abs(p_fwd - p))) < 0.5

    def test_param_count_formula(self):
        """The budgeting formula (decoders.py:54-59) must match the real
        parameter count of the FiLM/conditioner weights it models:
        per coupling 2*(f*g + f*g) FiLM kernels? — checked empirically:
        formula counts n*3*(18f + 4fg + 6f^2)."""
        n, f, g = 2, 8, 12
        assert point_decoder_param_count(n, f, g) == n * 3 * (
            18 * f + 4 * f * g + 6 * f * f
        )


class TestLatentFlow:
    @pytest.mark.parametrize("train", [False, True])
    def test_coupling_roundtrip(self, train):
        B, G, F = 4, 10, 8
        g = jax.random.normal(jax.random.PRNGKey(1), (B, G))
        m = LatentAffineCoupling(g_features=G, n_features=F,
                                 warp_inds=tuple(range(0, G, 2)))
        variables = _init(m, g, mode="direct", train=train)
        mutable = ["batch_stats"] if train else False
        out = m.apply(variables, g, mode="direct", train=train,
                      mutable=mutable)
        g_fwd, _ = out[0] if train else out
        out = m.apply(variables, g_fwd, mode="inverse", train=train,
                      mutable=mutable)
        g_back, _ = out[0] if train else out
        np.testing.assert_allclose(np.asarray(g_back), np.asarray(g),
                                   rtol=1e-5, atol=1e-6)

    def test_coupling_logdet_exact(self):
        """Latent coupling scale is exp(0.5*logvar) exactly, so
        log|det J| == 0.5 * sum(logvar)."""
        B, G, F = 1, 6, 8
        g = jax.random.normal(jax.random.PRNGKey(1), (B, G))
        # large weight_std puts the coupling far from identity so the
        # logdet is O(1) and fp32 slogdet comparison is meaningful
        m = LatentAffineCoupling(g_features=G, n_features=F,
                                 warp_inds=(0, 3, 4), weight_std=1.5)
        variables = _init(m, g, mode="direct", train=False)

        def f(flat):
            out, _ = m.apply(variables, flat.reshape(B, G),
                             mode="direct", train=False)
            return out.reshape(-1)

        J = jax.jacfwd(f)(g.reshape(-1))
        _, logvar = m.apply(variables, g, mode="direct", train=False)
        sign, logdet = jnp.linalg.slogdet(J)
        assert sign > 0
        np.testing.assert_allclose(float(logdet),
                                   float(0.5 * jnp.sum(logvar)), rtol=1e-4)

    @pytest.mark.parametrize("train", [False, True])
    def test_stack_roundtrip(self, train):
        B, G, F, n_flows = 3, 12, 16, 5
        g = jax.random.normal(jax.random.PRNGKey(1), (B, G))
        m = LatentPriorFlow(n_flows=n_flows, n_features=F, g_features=G)
        variables = _init(m, g, mode="direct", train=train)
        mutable = ["batch_stats"] if train else False
        out = m.apply(variables, g, mode="direct", train=train,
                      mutable=mutable)
        g_fwd, _ = out[0] if train else out
        out = m.apply(variables, g_fwd, mode="inverse", train=train,
                      mutable=mutable)
        g_back, _ = out[0] if train else out
        np.testing.assert_allclose(np.asarray(g_back), np.asarray(g),
                                   rtol=1e-3, atol=1e-4)
