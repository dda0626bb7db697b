"""Fused Pallas TRAINING kernel (ops/pallas/train_kernel.py) vs the XLA
train-mode decode: forward, batch statistics, hand-written backward, and
the train-step integration.

Tolerances: the f64-ground-truth study (RESULTS.md round 3) showed the
XLA-f32 path itself deviates up to ~5e-3 (relative to the leaf's max
gradient) on the FiLM dense grads at tiny shapes — train-mode BatchNorm
over a small batch is ill-conditioned — and the fused kernel sits at the
same noise floor. The gradient assertions therefore use a 3e-2
rel-to-max-leaf bound (formula bugs produce O(1) errors), while outputs
and input cotangents are held to fp32-roundoff-level bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.models.flows import (
    PointDecoderFlow,
    ScanPointDecoderFlow,
)
from go_with_the_flows_tpu.ops.pallas.coupling_kernel import (
    scanned_to_unrolled_params,
)
from go_with_the_flows_tpu.ops.pallas.train_kernel import (
    film_wb_train,
    fused_train_decode,
    pack_point_decoder_train,
)
from go_with_the_flows_tpu.ops.precision import matmul_precision_scope

K, B, N, G = 2, 4, 96, 8  # N=96 -> npad=128 exercises lane masking
F = 6


def _setup(n_flows, scan):
    cls = ScanPointDecoderFlow if scan else PointDecoderFlow
    dec = cls(n_flows=n_flows, f_features=F, g_features=G)
    p = jax.random.normal(jax.random.PRNGKey(0), (K, B, 3, N)) * 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (B, G))
    variables = jax.vmap(
        lambda k: dec.init(k, p[0], g, "inverse", True)
    )(jax.random.split(jax.random.PRNGKey(2), K))
    return dec, p, g, variables


def _fused(params, p, g, n_flows, scan, mode="highest"):
    packed = jax.vmap(
        lambda pr: pack_point_decoder_train(pr, n_flows, scan)
    )(params)
    ab, film_stats = jax.vmap(film_wb_train, in_axes=(0, None))(packed, g)
    p0, lv, stats = fused_train_decode(packed, ab, p, True, mode)
    return p0, lv, stats, film_stats


def _xla(dec, variables, p, g):
    def one(pr, bs, pk):
        (p0, lv), mut = dec.apply(
            {"params": pr, "batch_stats": bs}, pk, g, "inverse", True,
            mutable=["batch_stats"],
        )
        return p0, lv, mut["batch_stats"]

    return jax.vmap(one)(variables["params"], variables["batch_stats"], p)


@pytest.mark.parametrize("scan", [False, True])
def test_forward_and_stats_parity(scan):
    n_flows = 2
    dec, p, g, variables = _setup(n_flows, scan)
    with matmul_precision_scope("highest"):
        p0_x, lv_x, mut = _xla(dec, variables, p, g)
        p0_k, lv_k, stats, film_stats = _fused(
            variables["params"], p, g, n_flows, scan
        )
    np.testing.assert_allclose(p0_k, p0_x, atol=5e-6)
    np.testing.assert_allclose(lv_k, lv_x, atol=5e-6)

    # kernel batch stats -> torch running stats: ra = 0.9*init + 0.1*batch
    # (init mean 0, var 1), with the running VAR blending the
    # Bessel-corrected batch variance (TorchBatchNorm: x n/(n-1); the
    # kernel emits raw biased stats): conditioner BNs reduce over
    # (B, N), film BNs over B
    bes_sd = (B * N) / (B * N - 1)
    bes_film = B / (B - 1)
    bs = mut
    if scan:
        bs = jax.vmap(
            lambda t: scanned_to_unrolled_params(t, n_flows)
        )(bs)
    fmean, fvar = film_stats
    for c in range(n_flows * 3):
        i, j = divmod(c, 3)
        cp = bs[f"flow{i}_nvp{j + 1}"]
        for hi, head in enumerate(("T_logvar", "T_mu")):
            sl = slice(hi * F, (hi + 1) * F)
            np.testing.assert_allclose(
                0.1 * stats[:, c, 0, sl], cp[head]["sd0_bn"]["mean"],
                atol=1e-6)
            np.testing.assert_allclose(
                0.9 + 0.1 * bes_sd * stats[:, c, 1, sl],
                cp[head]["sd0_bn"]["var"], atol=1e-6)
            np.testing.assert_allclose(
                0.1 * stats[:, c, 2, sl], cp[head]["sd1_bn"]["mean"],
                atol=1e-6)
            np.testing.assert_allclose(
                0.9 + 0.1 * bes_sd * stats[:, c, 3, sl],
                cp[head]["sd1_bn"]["var"], atol=1e-6)
            for ni, net in enumerate(("cond_w", "cond_b")):
                fs = cp[head][net]["film0_bn"]
                np.testing.assert_allclose(
                    0.1 * fmean[:, c, 2 * hi + ni], fs["mean"], atol=1e-6)
                np.testing.assert_allclose(
                    0.9 + 0.1 * bes_film * fvar[:, c, 2 * hi + ni],
                    fs["var"], atol=1e-6)


@pytest.mark.parametrize("mode,atol", [("high", 2e-3), ("fast", 5e-2)])
def test_forward_reduced_precision(mode, atol):
    """'high' (tripled-contraction bf16-split dots) and 'fast' (bf16)
    forwards of the TRAINING kernel stay within split-precision
    tolerance of the f32 path."""
    n_flows = 2
    dec, p, g, variables = _setup(n_flows, False)
    with matmul_precision_scope("highest"):
        p0_x, lv_x, _ = _xla(dec, variables, p, g)
    p0_k, lv_k, _, _ = _fused(variables["params"], p, g, n_flows, False,
                              mode=mode)
    np.testing.assert_allclose(p0_k, p0_x, atol=atol)
    np.testing.assert_allclose(lv_k, lv_x, atol=atol)


def test_gradient_parity():
    n_flows = 2
    dec, p, g, variables = _setup(n_flows, False)
    params = variables["params"]
    wp = jax.random.normal(jax.random.PRNGKey(3), (K, B, 3, N))
    wl = jax.random.normal(jax.random.PRNGKey(4), (K, B, 3, N))

    def loss_xla(params, p, g):
        def one(pr, bs, pk):
            (p0, lv), _ = dec.apply(
                {"params": pr, "batch_stats": bs}, pk, g, "inverse",
                True, mutable=["batch_stats"],
            )
            return p0, lv

        p0, lv = jax.vmap(one)(params, variables["batch_stats"], p)
        return jnp.sum(p0 * wp) + jnp.sum(lv * wl)

    def loss_fused(params, p, g):
        p0, lv, _, _ = _fused(params, p, g, n_flows, False)
        return jnp.sum(p0 * wp) + jnp.sum(lv * wl)

    with matmul_precision_scope("highest"):
        lx = float(loss_xla(params, p, g))
        lf = float(loss_fused(params, p, g))
        assert abs(lx - lf) < 1e-4 * abs(lx) + 1e-4
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, p, g)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, p, g)

    # input cotangent: fp32-roundoff level
    scale = float(jnp.max(jnp.abs(gx[1]))) + 1e-8
    assert float(jnp.max(jnp.abs(gx[1] - gf[1]))) / scale < 1e-4

    # parameter + conditioning grads: see module docstring for the bound
    for tx, tf in ((gx[0], gf[0]), (gx[2], gf[2])):
        for (ka, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(tx),
            jax.tree_util.tree_leaves_with_path(tf),
        ):
            s = float(jnp.max(jnp.abs(va))) + 1e-8
            err = float(jnp.max(jnp.abs(va - vb))) / s
            assert err < 3e-2, (jax.tree_util.keystr(ka), err)


def test_train_step_fused_matches_xla():
    """One full optimizer step with the fused decoder vs the XLA path:
    loss, updated params, and BN running stats agree."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step

    model = FlowMixtureModel(
        n_components=2, g_latent_space_size=G, g_prior_n_flows=2,
        g_prior_n_features=8, p_decoder_n_flows=2, p_decoder_n_features=F,
        pc_enc_init_n_features=8, pc_enc_n_features=(8, 8, 16),
        params_reduce_mode="none",
    )
    rng = np.random.RandomState(0)
    batch = {
        "cloud": rng.randn(B, 3, N).astype(np.float32) * 0.3,
        "eval_cloud": rng.randn(B, 3, N).astype(np.float32) * 0.3,
    }
    opt = make_optimizer(
        epoch_length=10, cycle_length=2, min_lr=1e-4, max_lr=2e-4,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    with matmul_precision_scope("highest"):
        state0 = create_train_state(
            model, jax.random.PRNGKey(0), batch, opt
        )
        outs = {}
        for fused in (False, True):
            step = make_train_step(model, opt, fused_decoder=fused)
            state, metrics = step(
                state0, jnp.asarray(batch["cloud"]),
                jnp.asarray(batch["eval_cloud"]),
                jax.random.PRNGKey(1), warmup=False,
            )
            outs[fused] = (state, metrics)
            # donated buffers: rebuild the input state for the 2nd run
            state0 = create_train_state(
                model, jax.random.PRNGKey(0), batch, opt
            )

    (sx, mx), (sf, mf) = outs[False], outs[True]
    assert abs(float(mx["loss"]) - float(mf["loss"])) < 1e-3 * (
        abs(float(mx["loss"])) + 1.0
    )
    # BN running stats (incl. the kernel-computed pc_decoder subtree)
    for (ka, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(sx.batch_stats),
        jax.tree_util.tree_leaves_with_path(sf.batch_stats),
    ):
        np.testing.assert_allclose(
            va, vb, atol=1e-4,
            err_msg=f"batch_stats {jax.tree_util.keystr(ka)}")
    # updated params: AMSGrad normalizes tiny grad diffs, so bound the
    # parameter DELTA difference against the lr scale
    for (ka, va), (_, vb) in zip(
        jax.tree_util.tree_leaves_with_path(sx.params),
        jax.tree_util.tree_leaves_with_path(sf.params),
    ):
        np.testing.assert_allclose(
            va, vb, atol=5e-4,
            err_msg=f"params {jax.tree_util.keystr(ka)}")
