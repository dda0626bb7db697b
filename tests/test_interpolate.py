"""Tests for the latent interpolation / unconditional sampling utilities."""

import pytest

pytestmark = pytest.mark.slow

import os

import h5py
import jax
import numpy as np

from go_with_the_flows_tpu.eval.interpolate import (
    interpolate,
    sample_unconditional,
)
from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
from go_with_the_flows_tpu.optim import make_optimizer
from go_with_the_flows_tpu.train.state import create_train_state

TINY = dict(
    n_components=2, params_reduce_mode="none",
    weights_type="learned_weights", g_latent_space_size=8,
    g_prior_n_flows=2, g_prior_n_features=8, g_posterior_n_layers=1,
    p_latent_space_size=3, p_prior_n_layers=1, p_decoder_n_flows=2,
    p_decoder_n_features=8, p_decoder_base_type="free",
    pc_enc_init_n_features=8, pc_enc_n_features=(8, 16),
)


class _Loader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def _setup():
    model = FlowMixtureModel(**TINY)
    opt = make_optimizer(epoch_length=4, cycle_length=4, min_lr=1e-3,
                         max_lr=1e-3, beta1=0.9, min_beta2=0.99,
                         max_beta2=0.99, wd=0.0)
    rng = np.random.RandomState(0)
    batch = {
        "cloud": rng.randn(4, 3, 16).astype(np.float32),
        "eval_cloud": rng.randn(4, 3, 16).astype(np.float32),
    }
    state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
    return model, state, batch


def test_interpolate_shapes_and_h5(tmp_path):
    model, state, batch = _setup()
    loader = _Loader([batch, batch])
    out_path = str(tmp_path / "interp.h5")
    c1, c2, interp, labels = interpolate(
        loader, model, state, jax.random.PRNGKey(1), n_steps=5,
        n_batches=2, out_path=out_path,
    )
    assert c1.shape == (8, 3, 16)
    assert interp.shape == (8, 3, 16, 5)
    assert labels.shape == (8, 16, 5)
    assert np.isfinite(interp).all()
    # endpoints decode the two codes: step 0 uses codes1, last uses codes2
    with h5py.File(out_path, "r") as f:
        assert set(f.keys()) == {
            "clouds1", "clouds2", "interpolations", "labels"
        }


def test_sample_unconditional():
    model, state, _ = _setup()
    samples, labels = sample_unconditional(
        model, state, jax.random.PRNGKey(2), n_clouds=10, n_points=16,
        batch_size=4,
    )
    assert samples.shape == (10, 3, 16)
    assert labels.shape == (10, 16)
    assert labels.min() >= 1 and labels.max() <= 2
    assert np.isfinite(samples).all()
