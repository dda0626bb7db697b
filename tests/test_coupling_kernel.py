"""Fused Pallas sampling kernel (ops/pallas/coupling_kernel.py) vs the
flax decoder stack: the constant-folded VMEM-resident chain must
reproduce the XLA direct eval pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.models.flows import (
    PointDecoderFlow,
    ScanPointDecoderFlow,
    unrolled_to_scanned_params,
)
from go_with_the_flows_tpu.ops.pallas.coupling_kernel import (
    film_alpha_beta,
    fused_point_decode,
    pack_point_decoder,
    scanned_to_unrolled_params,
)


def _init_decoder(n_flows=3, f=8, G=12, B=2, N=32, seed=0):
    model = PointDecoderFlow(n_flows=n_flows, f_features=f, g_features=G)
    rng = np.random.RandomState(seed)
    p = jnp.asarray(rng.randn(B, 3, N).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.randn(B, G).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, p, g, mode="direct",
        train=False,
    )
    # randomize BN running stats so the fold is actually exercised
    def jiggle(tree):
        leaves, treedef = jax.tree.flatten(tree)
        out = []
        for i, leaf in enumerate(leaves):
            r = np.random.RandomState(100 + i)
            if leaf.ndim >= 1:
                out.append(jnp.asarray(
                    0.5 + 0.5 * r.rand(*leaf.shape).astype(np.float32)
                ))
            else:
                out.append(leaf)
        return jax.tree.unflatten(treedef, out)

    variables = dict(variables)
    variables["batch_stats"] = jiggle(variables["batch_stats"])
    return model, variables, p, g


def test_scanned_roundtrip():
    _, variables, _, _ = _init_decoder(n_flows=3)
    scanned = unrolled_to_scanned_params(variables["params"], 3)
    back = scanned_to_unrolled_params(scanned, 3)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables["params"], back,
    )


@pytest.mark.parametrize("n_flows", [2, 3])
def test_fused_matches_xla(n_flows):
    model, variables, p, g = _init_decoder(n_flows=n_flows)
    want_p, want_lv = model.apply(variables, p, g, mode="direct",
                                  train=False)

    packed = pack_point_decoder(
        variables["params"], variables["batch_stats"], n_flows,
        scan_layout=False,
    )
    ab = film_alpha_beta(packed, g)
    got_p, got_lv = fused_point_decode(packed, ab, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lv), np.asarray(want_lv),
                               rtol=1e-4, atol=1e-5)


def test_fused_matches_scanned_layout():
    """Same check through the scan-layout converter (the production
    checkpoint layout)."""
    n_flows = 3
    model, variables, p, g = _init_decoder(n_flows=n_flows, seed=5)
    want_p, want_lv = model.apply(variables, p, g, mode="direct",
                                  train=False)

    scanned_p = unrolled_to_scanned_params(variables["params"], n_flows)
    scanned_s = unrolled_to_scanned_params(variables["batch_stats"],
                                           n_flows)
    packed = pack_point_decoder(scanned_p, scanned_s, n_flows,
                                scan_layout=True)
    ab = film_alpha_beta(packed, g)
    got_p, got_lv = fused_point_decode(packed, ab, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lv), np.asarray(want_lv),
                               rtol=1e-4, atol=1e-5)


def test_fused_component_axis():
    """(K, B, 3, N) stacked input with per-component weights — the
    mixture's vmapped-decoder shape."""
    K = 2
    models, trees = [], []
    for k in range(K):
        model, variables, p, g = _init_decoder(n_flows=2, seed=10 + k)
        models.append((model, variables))
        trees.append(variables)
    p0 = jnp.stack([
        jnp.asarray(np.random.RandomState(30 + k).randn(2, 3, 32)
                    .astype(np.float32) * 0.3)
        for k in range(K)
    ])
    g = jnp.asarray(np.random.RandomState(40).randn(2, 12)
                    .astype(np.float32))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    packed = jax.vmap(
        lambda prm, st: pack_point_decoder(prm, st, 2, scan_layout=False)
    )(stacked["params"], stacked["batch_stats"])
    ab = jax.vmap(film_alpha_beta, in_axes=(0, None))(packed, g)
    got_p, got_lv = fused_point_decode(packed, ab, p0, interpret=True)

    for k in range(K):
        model, variables = models[k]
        want_p, want_lv = model.apply(variables, p0[k], g, mode="direct",
                                      train=False)
        np.testing.assert_allclose(np.asarray(got_p[k]),
                                   np.asarray(want_p),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"component {k}")
        np.testing.assert_allclose(np.asarray(got_lv[k]),
                                   np.asarray(want_lv),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"component {k}")


def test_fused_unaligned_n():
    """N not a multiple of the sublane tile (e.g. SVR's 2500)."""
    model, variables, p, g = _init_decoder(n_flows=2, N=37, seed=7)
    want_p, _ = model.apply(variables, p, g, mode="direct", train=False)
    packed = pack_point_decoder(
        variables["params"], variables["batch_stats"], 2,
        scan_layout=False,
    )
    ab = film_alpha_beta(packed, g)
    got_p, _ = fused_point_decode(packed, ab, p, interpret=True)
    assert got_p.shape == want_p.shape
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-4, atol=1e-5)


def test_mixture_fused_sampling_matches_xla():
    """Model-level: decode_sampling with the fused kernel == the XLA
    decoder path (same RNG stream — the draws precede the decode)."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel

    kwargs = dict(
        n_components=2, params_reduce_mode="none",
        weights_type="learned_weights", g_latent_space_size=16,
        g_prior_n_flows=2, g_prior_n_features=16,
        p_decoder_n_flows=3, p_decoder_n_features=8,
        pc_enc_init_n_features=8, pc_enc_n_features=(8, 16),
    )
    rng = np.random.RandomState(0)
    g_in = jnp.asarray(rng.randn(2, 3, 32).astype(np.float32) * 0.3)
    init_model = FlowMixtureModel(**kwargs, fused_sampling=False)
    variables = init_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        g_in, g_in, mode="training",
    )
    outs = {}
    for fused in (False, True):
        model = FlowMixtureModel(**kwargs, fused_sampling=fused)
        outs[fused] = model.apply(
            variables, g_in, mode="generating", n_sampled_points=32,
            rngs={"sample": jax.random.PRNGKey(7)},
        )
    for a, b in zip(jax.tree.leaves(outs[False]),
                    jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_precision_modes():
    """'high' (3-pass bf16-split emulation) must stay within ~1e-3 of
    the f32 stack; 'fast' (single bf16 pass) within bf16 tolerance."""
    from go_with_the_flows_tpu.ops.precision import matmul_precision_scope

    model, variables, p, g = _init_decoder(n_flows=2, seed=9)
    want_p, _ = model.apply(variables, p, g, mode="direct", train=False)
    packed = pack_point_decoder(
        variables["params"], variables["batch_stats"], 2,
        scan_layout=False,
    )
    ab = film_alpha_beta(packed, g)
    for mode, atol in (("high", 2e-3), ("fast", 5e-2)):
        with matmul_precision_scope(mode):
            got_p, _ = fused_point_decode(packed, ab, p, interpret=True)
        np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                                   rtol=atol, atol=atol, err_msg=mode)


def test_fused_inverse_matches_xla():
    """Inverse mode: reversed coupling order, inverted affine — must
    match the XLA stack's inverse pass AND invert the fused direct."""
    model, variables, p, g = _init_decoder(n_flows=3, seed=11)
    want_p, want_lv = model.apply(variables, p, g, mode="inverse",
                                  train=False)
    packed = pack_point_decoder(
        variables["params"], variables["batch_stats"], 3,
        scan_layout=False,
    )
    ab = film_alpha_beta(packed, g)
    got_p, got_lv = fused_point_decode(packed, ab, p, interpret=True,
                                       inverse=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lv), np.asarray(want_lv),
                               rtol=1e-4, atol=1e-5)
    # round trip: inverse(direct(p)) == p
    fwd, _ = fused_point_decode(packed, ab, p, interpret=True)
    back, _ = fused_point_decode(packed, ab, fwd, interpret=True,
                                 inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p),
                               rtol=1e-4, atol=1e-5)


def test_mixture_fused_validation_decode_matches_xla():
    """decode_training(train=False) — the validation-loss inverse — with
    the fused kernel == the XLA path."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel

    kwargs = dict(
        n_components=2, params_reduce_mode="none",
        weights_type="learned_weights", g_latent_space_size=16,
        g_prior_n_flows=2, g_prior_n_features=16,
        p_decoder_n_flows=3, p_decoder_n_features=8,
        pc_enc_init_n_features=8, pc_enc_n_features=(8, 16),
    )
    rng = np.random.RandomState(1)
    g_in = jnp.asarray(rng.randn(2, 3, 32).astype(np.float32) * 0.3)
    p_in = jnp.asarray(rng.randn(2, 3, 32).astype(np.float32) * 0.3)
    g_s = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    init_model = FlowMixtureModel(**kwargs, fused_sampling=False)
    variables = init_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        g_in, p_in, mode="training",
    )
    outs = {}
    for fused in (False, True):
        model = FlowMixtureModel(**kwargs, fused_sampling=fused)
        outs[fused] = model.apply(
            variables, p_in, g_s, False, False, method="decode_training",
        )
    for key in ("p0_samples", "p_logvar_sums", "mixture_weights_logits"):
        np.testing.assert_allclose(
            np.asarray(outs[False][key]), np.asarray(outs[True][key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


def test_mixture_fused_sampling_under_mesh():
    """The fused decode under a >1-device mesh must run via shard_map
    over the 'data' axis (pallas_call has no GSPMD partitioning rule)
    and produce the same samples as the unsharded fused path."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.parallel.mesh import make_mesh, shard_batch

    kwargs = dict(
        n_components=2, params_reduce_mode="none",
        weights_type="learned_weights", g_latent_space_size=16,
        g_prior_n_flows=2, g_prior_n_features=16,
        p_decoder_n_flows=3, p_decoder_n_features=8,
        pc_enc_init_n_features=8, pc_enc_n_features=(8, 16),
    )
    rng = np.random.RandomState(3)
    g_in = jnp.asarray(rng.randn(8, 3, 32).astype(np.float32) * 0.3)
    init_model = FlowMixtureModel(**kwargs, fused_sampling=False)
    variables = init_model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        g_in, g_in, mode="training",
    )
    model = FlowMixtureModel(**kwargs, fused_sampling=True)

    @jax.jit
    def sample_step(variables, g):
        return model.apply(
            variables, g, mode="generating", n_sampled_points=32,
            rngs={"sample": jax.random.PRNGKey(7)},
        )

    want = sample_step(variables, g_in)

    mesh = make_mesh()
    assert mesh.size == 8
    with jax.set_mesh(mesh):
        g_sharded = shard_batch(mesh, {"g": np.asarray(g_in)})["g"]
        got = jax.jit(sample_step.__wrapped__)(variables, g_sharded)

    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dot_schedules_vs_f64_oracle():
    """The emulated dot schedules — 'high' (3-term tripled concat) and
    'highest' (6-term split-once, _dot6) — must sit at (or below) the
    f32 noise floor of a native f32 dot, measured against an f64 oracle
    at flagship-like shapes (f2=74 contraction, wide lanes)."""
    from go_with_the_flows_tpu.ops.pallas.coupling_kernel import (
        _concat6_saves_chunks,
        _dot6,
        _mxdot,
    )

    rng = np.random.RandomState(0)
    a64 = rng.randn(74, 74)
    b64 = rng.randn(74, 2048)
    want = a64 @ b64
    a = jnp.asarray(a64.astype(np.float32))
    b = jnp.asarray(b64.astype(np.float32))

    ref_f32 = np.asarray(
        jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    )
    floor = np.abs(ref_f32 - want).max()

    got6 = np.asarray(_dot6(a, b))
    assert np.abs(got6 - want).max() <= max(4 * floor, 1e-4)

    got3 = np.asarray(_mxdot(a, b, "high"))
    # 3-term split drops the lo*lo-class terms: ~2^-22 relative
    assert np.abs(got3 - want).max() <= 5e-3

    # chunk arithmetic: fuse exactly when whole 128-chunks drop
    assert _concat6_saves_chunks(3) and _concat6_saves_chunks(74)
    assert not _concat6_saves_chunks(128) and not _concat6_saves_chunks(4096)
