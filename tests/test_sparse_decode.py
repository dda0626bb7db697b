"""Sparse (component-partitioned) sampling decode
(ops/pallas/sparse_decode.py) vs the dense paths.

Correctness splits into: (a) layout/table algebra, (b) the kernel
computes EXACTLY the per-component flow transform for every real lane
(checked pointwise against the XLA decoder on the same assignment), and
(c) the end-to-end model path produces identically-distributed labeled
clouds (checked via bit-equal component counts from the shared
categorical draw plus distribution-level statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
from go_with_the_flows_tpu.ops.pallas.sparse_decode import (
    chunk_span,
    compaction_indices,
    mixture_layout,
    sorted_labels,
    sparse_sample_decode,
)

K, B, N, G = 3, 4, 96, 12

MODEL_KW = dict(
    n_components=K, params_reduce_mode="none",
    weights_type="learned_weights", g_latent_space_size=G,
    g_prior_n_flows=2, g_prior_n_features=12, g_posterior_n_layers=1,
    p_latent_space_size=3, p_prior_n_layers=1,
    p_decoder_n_flows=2, p_decoder_n_features=8,
    p_decoder_base_type="free", pc_enc_init_n_features=8,
    pc_enc_n_features=(8, 16),
)


def _ids(seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, K, size=(B, N)).astype(np.int32))


def test_sorted_labels_counts_match_dense():
    ids = _ids()
    labels, counts = sorted_labels(ids, K)
    want_counts = np.stack(
        [np.bincount(np.asarray(ids[b]), minlength=K) for b in range(B)]
    )
    np.testing.assert_array_equal(np.asarray(counts), want_counts)
    # labels are the per-cloud sorted permutation of ids + 1
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(labels[b]), np.sort(np.asarray(ids[b])) + 1
        )


@pytest.mark.parametrize("tb", [1, 2])
def test_layout_and_compaction_roundtrip(tb):
    ids = _ids(1)
    _, counts = sorted_labels(ids, K)
    layout = mixture_layout(counts, N, tb)
    S = chunk_span(N, K, tb)
    segs = np.asarray(layout["segs"])
    nc = B // tb
    assert segs.shape == (nc, K * tb + 1)
    assert (segs[:, -1] <= S).all()
    assert (segs % 128 == 0).all()

    # place a recognizable value (cloud*1000 + component) into each real
    # lane, then compaction must recover the per-cloud sorted stream
    buf = np.zeros((nc, 3, S), np.float32)
    cnts = np.asarray(counts)
    for b in range(B):
        chunk, b_local = divmod(b, tb)
        for k in range(K):
            g = k * tb + b_local
            start = segs[chunk, g]
            buf[chunk, :, start:start + cnts[b, k]] = b * 1000 + k
    idx = np.asarray(compaction_indices(counts, layout["segs"], N, tb))
    dense = np.take_along_axis(buf, idx[:, None, :], axis=2)
    dense = dense.reshape(nc, 3, tb, N).transpose(0, 2, 1, 3).reshape(
        B, 3, N
    )
    labels, _ = sorted_labels(ids, K)
    want = (np.arange(B)[:, None] * 1000
            + np.asarray(labels) - 1)[:, None, :]
    np.testing.assert_array_equal(dense, np.broadcast_to(want, dense.shape))

    # tile_b points every real tile at its own cloud
    tile_b = np.asarray(layout["tile_b"])
    for chunk in range(nc):
        for g in range(K * tb):
            lo, hi = segs[chunk, g], segs[chunk, g + 1]
            for t in range(lo // 128, hi // 128):
                assert tile_b[chunk, t] == g % tb


def _model_and_vars(seed=0):
    model = FlowMixtureModel(**MODEL_KW, fused_sampling=False)
    rng = np.random.RandomState(seed)
    g_in = jnp.asarray(rng.randn(B, 3, N).astype(np.float32) * 0.3)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "sample": jax.random.PRNGKey(seed + 1)},
        g_in, g_in, mode="training",
    )
    return model, variables, g_in


def test_sparse_kernel_matches_dense_decode_pointwise():
    """On the SAME component assignment and base points, the sparse
    kernel must equal the XLA decoder's per-component transform."""
    from go_with_the_flows_tpu.ops.pallas.coupling_kernel import (
        film_alpha_beta,
        pack_point_decoder,
    )

    model, variables, g_in = _model_and_vars()
    g_sample = jax.random.normal(jax.random.PRNGKey(9), (B, G))

    dec = variables["params"]["pc_decoder"]
    dec_stats = variables["batch_stats"]["pc_decoder"]
    depth = model.p_decoder_n_flows  # params_reduce_mode="none"
    packed = jax.vmap(
        lambda pr, st: pack_point_decoder(pr, st, depth,
                                          model.scan_couplings)
    )(dec, dec_stats)
    ab = jax.vmap(film_alpha_beta, in_axes=(0, None))(packed, g_sample)

    ids = _ids(3)
    labels, counts = sorted_labels(ids, K)
    mus = jnp.zeros((B, 3, 1), jnp.float32)
    logvars = jnp.full((B, 3, 1), -1.0, jnp.float32)

    samples = sparse_sample_decode(
        packed, ab, jax.random.PRNGKey(5), counts, N, mus, logvars,
        tb=2, interpret=True, precision_mode="highest",
    )

    # reconstruct the base points the sparse path used, decode them
    # densely through the XLA stack with each point's own component
    from go_with_the_flows_tpu.ops.pallas.sparse_decode import (
        chunk_span as _cs,
        mixture_layout as _ml,
        compaction_indices as _ci,
    )

    tb = 2
    layout = _ml(counts, N, tb)
    eps = jax.random.normal(
        jax.random.PRNGKey(5), (B // tb, 3, _cs(N, K, tb))
    )
    base_layout = mus[0, :, 0][None, :, None] + jnp.exp(
        0.5 * logvars[0, :, 0]
    )[None, :, None] * eps
    idx = _ci(counts, layout["segs"], N, tb)
    base = jnp.take_along_axis(base_layout, idx[:, None, :], axis=2)
    base = base.reshape(B // tb, 3, tb, N).transpose(0, 2, 1, 3)
    base = base.reshape(B, 3, N)

    dense_model = FlowMixtureModel(**MODEL_KW, fused_sampling=False)
    base_k = jnp.broadcast_to(base[None], (K,) + base.shape)
    decoded, _ = dense_model.apply(
        variables, base_k, g_sample, "direct", False,
        method=lambda m, p, g, mode, train: m.pc_decoder(p, g, mode,
                                                         train),
    )
    mask = (labels - 1)[None, :, None, :] == jnp.arange(K)[:, None, None,
                                                           None]
    want = jnp.sum(jnp.where(mask, decoded, 0.0), axis=0)
    np.testing.assert_allclose(
        np.asarray(samples), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_model_sparse_sampling_end_to_end():
    """The model-level sparse path: labels are the sorted permutation of
    the dense draw's labels (bit-equal counts), samples finite, and the
    per-component sample statistics match the dense path's."""
    model, variables, g_in = _model_and_vars(2)
    dense = FlowMixtureModel(**MODEL_KW, fused_sampling=False,
                             sparse_sampling=False)
    sparse = FlowMixtureModel(**MODEL_KW, fused_sampling=False,
                              sparse_sampling=True)
    key = jax.random.PRNGKey(11)
    _, s_dense, l_dense, logits_d = dense.apply(
        variables, g_in, mode="generating", n_sampled_points=N,
        rngs={"sample": key},
    )
    _, s_sparse, l_sparse, logits_s = sparse.apply(
        variables, g_in, mode="generating", n_sampled_points=N,
        rngs={"sample": key},
    )
    np.testing.assert_array_equal(np.asarray(logits_d),
                                  np.asarray(logits_s))
    # same categorical draw -> bit-equal per-cloud component counts
    for b in range(B):
        np.testing.assert_array_equal(
            np.sort(np.asarray(l_dense[b])), np.asarray(l_sparse[b])
        )
    s_sparse = np.asarray(s_sparse)
    assert np.isfinite(s_sparse).all()
    # distribution check: per-(cloud, component) sample means agree
    # (points are iid given the component; means over ~N/K points)
    s_dense = np.asarray(s_dense)
    for b in range(B):
        for k in range(1, K + 1):
            md = s_dense[b][:, np.asarray(l_dense[b]) == k]
            ms = s_sparse[b][:, np.asarray(l_sparse[b]) == k]
            if md.shape[1] < 8:
                continue
            se = md.std(axis=1) / np.sqrt(md.shape[1])
            assert np.all(
                np.abs(md.mean(axis=1) - ms.mean(axis=1)) < 6 * se + 1e-3
            ), (b, k)
