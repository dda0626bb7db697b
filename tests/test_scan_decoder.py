"""ScanPointDecoderFlow must be numerically identical to the unrolled
PointDecoderFlow under the param-layout converter, in both directions and
both BN modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from go_with_the_flows_tpu.models.flows import (
    PointDecoderFlow,
    ScanPointDecoderFlow,
    unrolled_to_scanned_params,
)


@pytest.mark.parametrize("n_flows", [4, 5])  # even (no tail) and odd
@pytest.mark.parametrize("mode", ["direct", "inverse"])
def test_scan_matches_unrolled(n_flows, mode):
    B, N, F, G = 2, 16, 8, 12
    p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
    g = jax.random.normal(jax.random.PRNGKey(2), (B, G))

    unrolled = PointDecoderFlow(n_flows=n_flows, f_features=F,
                                g_features=G)
    variables = unrolled.init(jax.random.PRNGKey(0), p, g,
                              mode="direct", train=False)
    scanned = ScanPointDecoderFlow(n_flows=n_flows, f_features=F,
                                   g_features=G)
    s_vars = {
        "params": unrolled_to_scanned_params(variables["params"], n_flows),
        "batch_stats": unrolled_to_scanned_params(
            variables["batch_stats"], n_flows
        ),
    }

    p_u, lv_u = unrolled.apply(variables, p, g, mode=mode, train=False)
    p_s, lv_s = scanned.apply(s_vars, p, g, mode=mode, train=False)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_u),
                               rtol=1e-5, atol=1e-6)


def test_scan_train_mode_and_stats_update():
    n_flows, B, N, F, G = 4, 4, 16, 8, 12
    p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
    g = jax.random.normal(jax.random.PRNGKey(2), (B, G))

    unrolled = PointDecoderFlow(n_flows=n_flows, f_features=F,
                                g_features=G)
    variables = unrolled.init(jax.random.PRNGKey(0), p, g,
                              mode="direct", train=False)
    scanned = ScanPointDecoderFlow(n_flows=n_flows, f_features=F,
                                   g_features=G)
    s_vars = {
        "params": unrolled_to_scanned_params(variables["params"], n_flows),
        "batch_stats": unrolled_to_scanned_params(
            variables["batch_stats"], n_flows
        ),
    }
    (p_u, lv_u), mut_u = unrolled.apply(
        variables, p, g, mode="inverse", train=True,
        mutable=["batch_stats"],
    )
    (p_s, lv_s), mut_s = scanned.apply(
        s_vars, p, g, mode="inverse", train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_u),
                               rtol=5e-5, atol=1e-5)
    # updated running stats must agree under the converter
    converted = unrolled_to_scanned_params(mut_u["batch_stats"], n_flows)
    flat_s = jax.tree.leaves(mut_s["batch_stats"])
    flat_c = jax.tree.leaves(converted)
    for a, b in zip(flat_s, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-5)


def test_scan_gradients_match():
    n_flows, B, N, F, G = 4, 2, 16, 8, 12
    p = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
    g = jax.random.normal(jax.random.PRNGKey(2), (B, G))
    unrolled = PointDecoderFlow(n_flows=n_flows, f_features=F,
                                g_features=G)
    variables = unrolled.init(jax.random.PRNGKey(0), p, g,
                              mode="direct", train=False)
    scanned = ScanPointDecoderFlow(n_flows=n_flows, f_features=F,
                                   g_features=G)
    s_params = unrolled_to_scanned_params(variables["params"], n_flows)
    s_stats = unrolled_to_scanned_params(
        variables["batch_stats"], n_flows
    )

    def loss_u(params):
        out, lv = unrolled.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            p, g, mode="inverse", train=False)
        return jnp.sum(out ** 2) + jnp.sum(lv)

    def loss_s(params):
        out, lv = scanned.apply(
            {"params": params, "batch_stats": s_stats},
            p, g, mode="inverse", train=False)
        return jnp.sum(out ** 2) + jnp.sum(lv)

    g_u = jax.grad(loss_u)(variables["params"])
    g_s = jax.grad(loss_s)(s_params)
    g_u_conv = unrolled_to_scanned_params(g_u, n_flows)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_u_conv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
