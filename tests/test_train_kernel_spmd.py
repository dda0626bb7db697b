"""SPMD fused training decode (ops/pallas/train_kernel.py
make_fused_train_decode_spmd): the in-kernel remote-DMA BatchNorm-stat
exchange must reproduce the single-device fused kernel (and hence the
XLA SyncBN path) EXACTLY on the same global batch.

Runs on the virtual CPU mesh via the TPU interpret mode
(pltpu.InterpretParams), whose shared-memory simulator emulates the
remote DMAs + semaphores the kernels use — plain interpret=True cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from go_with_the_flows_tpu.models.flows import PointDecoderFlow
from go_with_the_flows_tpu.ops.pallas.train_kernel import (
    film_wb_train,
    fused_train_decode,
    make_fused_train_decode_spmd,
    pack_point_decoder_train,
)
from go_with_the_flows_tpu.ops.precision import matmul_precision_scope
from go_with_the_flows_tpu.parallel.mesh import make_mesh

K, B, N, G = 2, 8, 96, 8  # global batch; N=96 -> npad=128 (lane masking)
F = 6
N_FLOWS = 2
D = 4  # data shards


def _setup():
    dec = PointDecoderFlow(n_flows=N_FLOWS, f_features=F, g_features=G)
    p = jax.random.normal(jax.random.PRNGKey(0), (K, B, 3, N)) * 0.5
    g = jax.random.normal(jax.random.PRNGKey(1), (B, G))
    variables = jax.vmap(
        lambda k: dec.init(k, p[0], g, "inverse", True)
    )(jax.random.split(jax.random.PRNGKey(2), K))
    packed = jax.vmap(
        lambda pr: pack_point_decoder_train(pr, N_FLOWS, False)
    )(variables["params"])
    ab, _ = jax.vmap(film_wb_train, in_axes=(0, None))(packed, g)
    return packed, ab, p


def test_spmd_forward_matches_single_device():
    packed, ab, p = _setup()
    mesh = make_mesh(D)
    decode = make_fused_train_decode_spmd(
        "data", D, pltpu.InterpretParams(), "highest"
    )
    with matmul_precision_scope("highest"):
        p0_1, lv_1, stats_1 = fused_train_decode(
            packed, ab, p, True, "highest"
        )
        with jax.set_mesh(mesh):
            p0_d, lv_d, stats_d = jax.jit(decode)(packed, ab, p)
    # the only fp-order difference is the (D, 2, f2) slot-sum of the
    # stat exchange vs the single-device chunk accumulation
    np.testing.assert_allclose(np.asarray(p0_d), np.asarray(p0_1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_d), np.asarray(lv_1),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats_d), np.asarray(stats_1),
                               atol=2e-5)


def test_spmd_gradients_match_single_device():
    packed, ab, p = _setup()
    mesh = make_mesh(D)
    decode = make_fused_train_decode_spmd(
        "data", D, pltpu.InterpretParams(), "highest"
    )
    wp = jax.random.normal(jax.random.PRNGKey(3), (K, B, 3, N))
    wl = jax.random.normal(jax.random.PRNGKey(4), (K, B, 3, N))

    def loss_single(packed, ab, p):
        p0, lv, _ = fused_train_decode(packed, ab, p, True, "highest")
        return jnp.sum(p0 * wp) + jnp.sum(lv * wl)

    def loss_spmd(packed, ab, p):
        p0, lv, _ = decode(packed, ab, p)
        return jnp.sum(p0 * wp) + jnp.sum(lv * wl)

    with matmul_precision_scope("highest"):
        l1 = float(loss_single(packed, ab, p))
        g1 = jax.grad(loss_single, argnums=(0, 1, 2))(packed, ab, p)
        with jax.set_mesh(mesh):
            ld = float(jax.jit(loss_spmd)(packed, ab, p))
            gd = jax.jit(
                jax.grad(loss_spmd, argnums=(0, 1, 2))
            )(packed, ab, p)

    assert abs(l1 - ld) < 1e-4 * abs(l1) + 1e-4
    for t1, td in zip(g1, gd):
        for (kp, v1), (_, vd) in zip(
            jax.tree_util.tree_leaves_with_path(t1),
            jax.tree_util.tree_leaves_with_path(td),
        ):
            s = float(jnp.max(jnp.abs(v1))) + 1e-8
            err = float(jnp.max(jnp.abs(np.asarray(v1) - np.asarray(vd))))
            assert err / s < 1e-4, (jax.tree_util.keystr(kp), err / s)


@pytest.mark.slow
def test_train_step_spmd_fused_matches_xla():
    """Full train step on a >1-device mesh: fused_decoder=True (the SPMD
    kernel path through train/step.py) vs the XLA GSPMD path — loss and
    gradients-after-one-step agree, proving the in-kernel exchange
    reproduces global-batch SyncBN inside the real training graph."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.parallel.mesh import shard_batch
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step

    model = FlowMixtureModel(
        n_components=2,
        params_reduce_mode="none",
        weights_type="learned_weights",
        g_latent_space_size=8,
        g_prior_n_flows=2,
        g_prior_n_features=8,
        g_posterior_n_layers=1,
        p_latent_space_size=3,
        p_prior_n_layers=1,
        p_decoder_n_flows=2,
        p_decoder_n_features=6,
        p_decoder_base_type="free",
        pc_enc_init_n_features=8,
        pc_enc_n_features=(8, 8, 16),
    )
    rng = np.random.RandomState(0)
    cloud = (rng.randn(B, 3, N) * 0.3).astype(np.float32)
    batch = {"cloud": cloud, "eval_cloud": cloud}
    opt = make_optimizer(
        epoch_length=10, cycle_length=4, min_lr=1e-4, max_lr=2e-4,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    mesh = make_mesh(D)
    with matmul_precision_scope("highest"):
        state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
        results = {}
        with jax.set_mesh(mesh):
            sharded = shard_batch(mesh, batch)
            for fused in (False, True):
                step = make_train_step(model, opt, fused_decoder=fused)
                # the step donates its input state: hand each variant
                # its own copy
                new_state, metrics = step(
                    jax.tree.map(jnp.array, state),
                    sharded["cloud"], sharded["eval_cloud"],
                    jax.random.PRNGKey(7), warmup=False,
                )
                results[fused] = (
                    float(metrics["loss"]),
                    jax.tree.map(np.asarray, new_state.params),
                    jax.tree.map(np.asarray, new_state.batch_stats),
                )
    loss_x, params_x, bs_x = results[False]
    loss_f, params_f, bs_f = results[True]
    assert abs(loss_x - loss_f) < 1e-3 * abs(loss_x) + 1e-3
    for (kp, vx), (_, vf) in zip(
        jax.tree_util.tree_leaves_with_path(bs_x),
        jax.tree_util.tree_leaves_with_path(bs_f),
    ):
        np.testing.assert_allclose(
            vx, vf, atol=5e-5,
            err_msg=f"batch_stats {jax.tree_util.keystr(kp)}",
        )
    # AMSGrad normalizes tiny grad differences; bound the param drift
    for (kp, vx), (_, vf) in zip(
        jax.tree_util.tree_leaves_with_path(params_x),
        jax.tree_util.tree_leaves_with_path(params_f),
    ):
        err = float(np.max(np.abs(vx - vf)))
        assert err < 5e-3, (jax.tree_util.keystr(kp), err)
