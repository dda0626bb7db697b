"""End-to-end train-step smoke tests on an 8-device CPU mesh: the
data-parallel step must compile, run, produce finite decreasing loss, and
keep param/batch-stat pytrees consistent."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
from go_with_the_flows_tpu.optim import make_optimizer
from go_with_the_flows_tpu.parallel.mesh import make_mesh, shard_batch
from go_with_the_flows_tpu.train.state import create_train_state
from go_with_the_flows_tpu.train.step import (
    make_train_step,
    make_eval_step,
    make_sample_step,
)

TINY = dict(
    n_components=2,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    g_latent_space_size=8,
    g_prior_n_flows=2,
    g_prior_n_features=8,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=2,
    p_decoder_n_features=8,
    p_decoder_base_type="free",
    pc_enc_init_n_features=8,
    pc_enc_n_features=(8, 16),
)


def _synthetic_batch(rng, B=16, N=32):
    cloud = rng.randn(B, 3, N).astype(np.float32) * 0.3
    return {"cloud": cloud, "eval_cloud": cloud + 0.01}


def test_train_step_runs_and_loss_decreases():
    model = FlowMixtureModel(**TINY)
    optimizer = make_optimizer(
        epoch_length=10, cycle_length=4, min_lr=1e-3, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng = np.random.RandomState(0)
    batch = _synthetic_batch(rng)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch, optimizer
    )
    train_step = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(42)

    losses = []
    for i in range(6):
        batch = _synthetic_batch(rng)
        state, metrics = train_step(
            state, jnp.asarray(batch["cloud"]),
            jnp.asarray(batch["eval_cloud"]), key, warmup=(i < 2),
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_train_step_sharded_over_mesh():
    """The same step under a batch sharded over the 8-device 'data' axis:
    SPMD gradient reduction + global-batch BN stats, no user collectives."""
    mesh = make_mesh()
    assert mesh.devices.size == 8

    model = FlowMixtureModel(**TINY)
    optimizer = make_optimizer(
        epoch_length=10, cycle_length=4, min_lr=1e-3, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng = np.random.RandomState(0)
    batch = _synthetic_batch(rng, B=16)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
    train_step = make_train_step(model, optimizer)

    with jax.set_mesh(mesh):
        sharded = shard_batch(mesh, batch)
        state, metrics = train_step(
            state, sharded["cloud"], sharded["eval_cloud"],
            jax.random.PRNGKey(1), warmup=False,
        )
    assert np.isfinite(float(metrics["loss"]))

    # Sharded-batch loss must equal the replicated-batch loss: global-batch
    # BN statistics make SPMD numerics independent of the device layout.
    state2 = create_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
    _, metrics2 = train_step(
        state2, jnp.asarray(batch["cloud"]), jnp.asarray(batch["eval_cloud"]),
        jax.random.PRNGKey(1), warmup=False,
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics2["loss"]), rtol=2e-4
    )


def test_eval_and_sample_steps():
    model = FlowMixtureModel(**TINY)
    optimizer = make_optimizer(
        epoch_length=10, cycle_length=4, min_lr=1e-3, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng = np.random.RandomState(0)
    batch = _synthetic_batch(rng, B=4, N=16)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, optimizer)

    eval_step = make_eval_step(model)
    metrics = eval_step(
        state, jnp.asarray(batch["cloud"]), jnp.asarray(batch["eval_cloud"]),
        jax.random.PRNGKey(3), warmup=False,
    )
    assert np.isfinite(float(metrics["loss"]))

    sample_step = make_sample_step(model, n_sampled_points=24)
    samples, labels, logits = sample_step(
        state, jnp.asarray(batch["cloud"]), jax.random.PRNGKey(4)
    )
    assert samples.shape == (4, 3, 24)
    assert labels.shape == (4, 24)
    assert np.isfinite(np.asarray(samples)).all()


def test_remat_matches_baseline():
    """remat_couplings must not change the training step numerics."""
    model_a = FlowMixtureModel(**TINY)
    model_b = FlowMixtureModel(**TINY, remat_couplings=True)
    optimizer = make_optimizer(
        epoch_length=10, cycle_length=4, min_lr=1e-3, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng = np.random.RandomState(5)
    batch = _synthetic_batch(rng, B=8, N=32)
    state_a = create_train_state(model_a, jax.random.PRNGKey(0), batch,
                                 optimizer)
    state_b = create_train_state(model_b, jax.random.PRNGKey(0), batch,
                                 optimizer)
    step_a = make_train_step(model_a, optimizer)
    step_b = make_train_step(model_b, optimizer)
    g, p = jnp.asarray(batch["cloud"]), jnp.asarray(batch["eval_cloud"])
    _, m_a = step_a(state_a, g, p, jax.random.PRNGKey(1), warmup=False)
    _, m_b = step_b(state_b, g, p, jax.random.PRNGKey(1), warmup=False)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)


def test_profile_trace_capture(tmp_path):
    """--profile wiring: loops.train with profile_dir must leave a
    jax.profiler trace on disk (utils/profiling.py exercised end to end)."""
    import os

    from go_with_the_flows_tpu.train import loops

    class ListLoader:
        def __init__(self, batches):
            self.batches = batches
            self.dataset = None

        def set_epoch(self, e):
            pass

        def __len__(self):
            return len(self.batches)

        def __iter__(self):
            return iter(self.batches)

    model = FlowMixtureModel(**TINY)
    optimizer = make_optimizer(
        epoch_length=4, cycle_length=4, min_lr=1e-3, max_lr=1e-3,
        beta1=0.9, min_beta2=0.99, max_beta2=0.99, wd=1e-6,
    )
    rng = np.random.RandomState(1)
    batches = [_synthetic_batch(rng, B=4, N=16) for _ in range(4)]
    state = create_train_state(
        model, jax.random.PRNGKey(0), batches[0], optimizer
    )
    train_step = make_train_step(model, optimizer)

    trace_dir = str(tmp_path / "trace")
    loops.train(
        ListLoader(batches), train_step, state, epoch=0, start_iter=0,
        warmup=True, rng=jax.random.PRNGKey(3),
        profile_dir=trace_dir, profile_steps=2, logging=False,
    )
    found = []
    for root, _, files in os.walk(trace_dir):
        found.extend(files)
    assert found, f"no trace files in {trace_dir}"
