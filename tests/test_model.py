"""Tests for the mixture model assembly: shapes, modes, parameter
budgeting, and sampling determinism properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from go_with_the_flows_tpu.models.mixture import (
    FlowMixtureModel,
    reduce_decoder_params,
)

SMALL = dict(
    n_components=2,
    params_reduce_mode="none",
    weights_type="learned_weights",
    g_latent_space_size=16,
    g_prior_n_flows=2,
    g_prior_n_features=16,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=2,
    p_decoder_n_features=8,
    p_decoder_base_type="free",
    pc_enc_init_n_features=8,
    pc_enc_n_features=(16, 32),
)


def _make(mode="training", **over):
    cfg = {**SMALL, **over}
    model = FlowMixtureModel(**cfg)
    B, N = 2, 32
    g_in = jax.random.normal(jax.random.PRNGKey(0), (B, 3, N))
    p_in = jax.random.normal(jax.random.PRNGKey(1), (B, 3, N))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "sample": jax.random.PRNGKey(3)},
        g_in, p_in, mode=mode,
    )
    return model, variables, g_in, p_in


class TestBudget:
    def test_none_and_single_component(self):
        assert reduce_decoder_params(4, "none", 21, 64, 128) == (21, 64)
        assert reduce_decoder_params(1, "depth_and_feature", 21, 64, 128) == (
            21, 64,
        )

    def test_depth_and_feature_default_config(self):
        """Hand-derived from the reference arithmetic
        (flow_mixture.py:44-102) for the published airplane config
        (K=4, 21 flows, 64 features, g=128): depth = ceil(21/2) = 11,
        features shrink to 37 (4*33*(530f+6f^2) <= 63*58496 first holds
        at f=37)."""
        assert reduce_decoder_params(4, "depth_and_feature", 21, 64, 128) == (
            11, 37,
        )

    def test_depth_first(self):
        depth, feats = reduce_decoder_params(4, "depth_first", 21, 64, 128)
        assert depth == 6  # ceil(21/4)
        # budget constraint must hold
        from go_with_the_flows_tpu.models.flows import (
            point_decoder_param_count as cnt,
        )
        assert cnt(depth, feats, 128) * 4 <= cnt(21, 64, 128)
        assert cnt(depth, feats + 1, 128) * 4 > cnt(21, 64, 128)

    def test_feature_first_floor(self):
        """feature_first keeps full depth but may hit the 4-feature floor
        and then reduce depth."""
        depth, feats = reduce_decoder_params(4, "feature_first", 21, 64, 128)
        from go_with_the_flows_tpu.models.flows import (
            point_decoder_param_count as cnt,
        )
        assert feats >= 4
        assert cnt(depth, feats, 128) * 4 <= cnt(21, 64, 128)


class TestForward:
    def test_training_outputs(self):
        model, variables, g_in, p_in = _make()
        out, mutated = model.apply(
            variables, g_in, p_in, mode="training",
            rngs={"sample": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        K, B, N, G = 2, 2, 32, 16
        assert out["p0_samples"].shape == (K, B, 3, N)
        assert out["p_logvar_sums"].shape == (K, B, 3, N)
        assert out["p_base_mus"].shape == (B, 3, 1)
        assert out["mixture_weights_logits"].shape == (B, K)
        assert out["g0_sample"].shape == (B, G)
        assert out["g_prior_logvar_sum"].shape == (B, G)
        assert out["g_posterior_mus"].shape == (B, G)
        assert "batch_stats" in mutated
        # components must be distinct functions
        assert (
            float(
                jnp.abs(out["p0_samples"][0] - out["p0_samples"][1]).max()
            )
            > 0
        )

    @pytest.mark.parametrize("mode", ["autoencoding", "generating"])
    def test_sampling_modes(self, mode):
        model, variables, g_in, p_in = _make()
        out_enc, samples, labels, logits = model.apply(
            variables, g_in, p_in, n_sampled_points=24, mode=mode,
            rngs={"sample": jax.random.PRNGKey(7)},
        )
        assert samples.shape == (2, 3, 24)
        assert labels.shape == (2, 24)
        labels_np = np.asarray(labels)
        assert labels_np.min() >= 1 and labels_np.max() <= 2
        assert np.isfinite(np.asarray(samples)).all()

    def test_warmup_uses_global_weights(self):
        model, variables, g_in, p_in = _make()
        out, _ = model.apply(
            variables, g_in, p_in, mode="training", warmup=True,
            rngs={"sample": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        # global logits are zeros at init -> all rows identical
        w = np.asarray(out["mixture_weights_logits"])
        np.testing.assert_allclose(w, np.zeros_like(w))

    def test_freevar_and_fixed_base(self):
        for base in ["freevar", "fixed"]:
            model, variables, g_in, p_in = _make(p_decoder_base_type=base)
            out, _ = model.apply(
                variables, g_in, p_in, mode="training",
                rngs={"sample": jax.random.PRNGKey(7)},
                mutable=["batch_stats"],
            )
            np.testing.assert_allclose(
                np.asarray(out["p_base_mus"]), 0.0
            )
            if base == "fixed":
                np.testing.assert_allclose(
                    np.asarray(out["p_base_logvars"]), -3.9551
                )
