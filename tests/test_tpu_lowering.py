"""Real Mosaic lowering of every Pallas kernel, without TPU hardware.

Interpret-mode tests execute kernel *semantics* but skip Mosaic's
lowering checks (block-shape tiling rules, memory-space constraints,
dynamic-index support). Round 3 found the (S, R)-grid pairwise kernels
failing ONLY at real-TPU lowering — per-element SMEM output blocks over
an (S, R, 1) array violate the tile rule — while every interpret test
passed. These tests close that hole: `jax.export` cross-lowers each
kernel for platform 'tpu' on the CPU host, which runs the full Mosaic
lowering pipeline (jax/_src/pallas/mosaic/lowering.py) and raises on
anything a real chip would reject at compile time.

Execution/numerics stay covered by the interpret suites
(test_pallas_kernels.py, test_pairwise_kernel.py, test_coupling_kernel.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.ops.pallas.chamfer_kernel import (
    chamfer_pallas,
    nn_distance_pallas,
)
from go_with_the_flows_tpu.ops.pallas.emd_kernel import emd_cost_pallas
from go_with_the_flows_tpu.ops.pallas.pairwise_kernel import (
    pairwise_cd_stats_pallas,
    pairwise_emd_pallas,
)


def _lower_tpu(fn, *args):
    """Cross-lower `fn(*args)` for TPU; raises on Mosaic rejections."""
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)


def _clouds(s, n, r, m):
    rng = np.random.RandomState(0)
    return (
        jnp.asarray(rng.randn(s, n, 3).astype(np.float32)),
        jnp.asarray(rng.randn(r, m, 3).astype(np.float32)),
    )


@pytest.mark.parametrize("n,m", [(2048, 2048), (2048, 2500)])
def test_pairwise_grid_kernels_lower(n, m):
    a, b = _clouds(4, n, 5, m)
    _lower_tpu(lambda x, y: pairwise_cd_stats_pallas(x, y,
                                                     f1_threshold=1e-3),
               a, b)
    _lower_tpu(pairwise_emd_pallas, a, b)


@pytest.mark.parametrize("n,m", [(2048, 2048), (2048, 2500)])
def test_per_pair_kernels_lower(n, m):
    a, b = _clouds(3, n, 3, m)
    _lower_tpu(nn_distance_pallas, a, b)
    _lower_tpu(chamfer_pallas, a, b)
    _lower_tpu(emd_cost_pallas, a, b)


def test_kernel_grads_lower():
    a, b = _clouds(2, 1024, 2, 1024)

    def cd_loss(x, y):
        dl, dr = chamfer_pallas(x, y)
        return jnp.sum(dl) + jnp.sum(dr)

    _lower_tpu(jax.grad(cd_loss), a, b)
    _lower_tpu(jax.grad(lambda x, y: jnp.sum(emd_cost_pallas(x, y))),
               a, b)


def test_fused_coupling_kernel_lowers():
    from go_with_the_flows_tpu.models.flows import PointDecoderFlow
    from go_with_the_flows_tpu.ops.pallas.coupling_kernel import (
        film_alpha_beta,
        fused_point_decode,
        pack_point_decoder,
    )

    n_flows, f, G, B, N = 3, 8, 12, 2, 256
    model = PointDecoderFlow(n_flows=n_flows, f_features=f, g_features=G)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(B, 3, N).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, G).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, p, g, mode="direct",
        train=False,
    )
    packed = pack_point_decoder(
        variables["params"], variables["batch_stats"], n_flows,
        scan_layout=False,
    )
    ab = film_alpha_beta(packed, g)

    for inverse in (False, True):
        _lower_tpu(
            lambda pk, a_, p_: fused_point_decode(pk, a_, p_,
                                                  inverse=inverse),
            packed, ab, p,
        )


@pytest.mark.parametrize("mode", ["highest", "high"])
def test_fused_train_kernel_lowers(mode):
    """Forward AND hand-written backward of the fused training kernel."""
    from go_with_the_flows_tpu.models.flows import PointDecoderFlow
    from go_with_the_flows_tpu.ops.pallas.train_kernel import (
        film_wb_train,
        fused_train_decode,
        pack_point_decoder_train,
    )

    n_flows, f, G, K, B, N = 2, 8, 12, 2, 4, 256
    model = PointDecoderFlow(n_flows=n_flows, f_features=f, g_features=G)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(K, B, 3, N).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, G).astype(np.float32))
    variables = jax.vmap(
        lambda k: model.init({"params": k}, p[0], g, mode="inverse",
                             train=True)
    )(jax.random.split(jax.random.PRNGKey(0), K))
    packed = jax.vmap(
        lambda pr: pack_point_decoder_train(pr, n_flows, False)
    )(variables["params"])
    ab, _ = jax.vmap(film_wb_train, in_axes=(0, None))(packed, g)

    _lower_tpu(
        lambda pk, a_, p_: fused_train_decode(pk, a_, p_, False, mode),
        packed, ab, p,
    )

    def loss(pk, a_, p_):
        p0, lv, _ = fused_train_decode(pk, a_, p_, False, mode)
        return jnp.sum(p0) + jnp.sum(lv)

    _lower_tpu(jax.grad(loss, argnums=(0, 1, 2)), packed, ab, p)
