"""Step-locked cross-framework TRAINING-dynamics parity (VERDICT r4 #2).

Runs the reference's OWN torch training loop (lib/networks/training.py:12-100
— its real train() function, with its Adam + LRUpdater + Flow_Mixture_Loss)
and our training step side by side from ONE synced initialization on
IDENTICAL batches, with the single stochastic draw of the training forward
(the posterior reparameterization, reference models.py:99-108 /
models/mixture.py:273) fed the SAME noise on both sides, and asserts the
per-step loss/PNLL/GNLL/GENT trajectories track to float tolerance and the
final parameters agree leaf-for-leaf.

This closes the one link the weight-synced FORWARD parity suite
(test_reference_parity.py, test_torch_import.py) and the step-exact
OPTIMIZER parity test bracket but never directly test: the gradients —
in particular through the train-mode BatchNorm chains inside the coupling
conditioners (reference flows.py:95-117 under model.train()) — and the
unused-parameter semantics across the warmup transition
(find_unused_parameters=True analog: the learned-weights encoder receives
no gradient during warmup, the global mixture logits none after it,
reference train_ae.py:153 + optimizers.py p.grad-is-None skip).

The jax side runs the train-step body eagerly so the per-step noise can be
injected; test_eager_step_matches_jitted_train_step pins that body to
train.step.make_train_step exactly (same rng derivation, same update).
"""

import os
import sys
import types
from collections import deque

import numpy as np
import pytest

REFERENCE = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REFERENCE, "lib"))
try:
    import torch

    HAVE_TORCH = True
except Exception:
    HAVE_TORCH = False

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not (HAVE_REF and HAVE_TORCH),
    reason="reference repo or torch unavailable",
)]

if HAVE_REF:
    sys.path.insert(0, REFERENCE)

import jax
import jax.numpy as jnp
import optax

# geometry / schedule of the locked run
B, N = 4, 24
EPOCH_LEN = 5          # batches per epoch == len(iterator)
N_EPOCHS = 4
WARMUP_EPOCHS = 2      # warmup -> learned-weights transition mid-run
MID_EPOCH = 3          # batch_stats snapshot point (see test body)
HP = dict(cycle_length=4, min_lr=1e-3, max_lr=2e-3, beta1=0.9,
          min_beta2=0.99, max_beta2=0.999, wd=1e-4)

TINY_CONFIG = dict(
    train_mode="p_rnvp_mc_g_rnvp_vae",
    util_mode="training",
    deterministic=False,
    n_components=2,
    params_reduce_mode="depth_and_feature",
    weights_type="learned_weights",
    pc_enc_init_n_channels=3,
    pc_enc_init_n_features=8,
    pc_enc_n_features=[8, 16],
    g_latent_space_size=16,
    g_prior_n_flows=2,
    g_prior_n_features=8,
    g_posterior_n_layers=1,
    p_latent_space_size=3,
    p_prior_n_layers=1,
    p_decoder_n_flows=3,
    p_decoder_n_features=8,
    p_decoder_base_type="free",
    p_decoder_base_var=-3.9551,
)


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def _stub_structural_losses():
    """lib.networks.utils imports the CUDA extension at module scope
    (utils.py:5); training.py imports utils. Stub it (never called)."""
    if "lib.metrics.StructuralLosses.nn_distance" not in sys.modules:
        pkg = types.ModuleType("lib.metrics.StructuralLosses")
        stub = types.ModuleType("lib.metrics.StructuralLosses.nn_distance")
        stub.nn_distance = None
        sys.modules.setdefault("lib.metrics.StructuralLosses", pkg)
        sys.modules["lib.metrics.StructuralLosses.nn_distance"] = stub


def _fixed_batches():
    """EPOCH_LEN deterministic batches, reused every epoch on both sides."""
    rng = np.random.RandomState(2024)
    return [
        {
            "cloud": (rng.randn(B, 3, N) * 0.4).astype(np.float32),
            "eval_cloud": (rng.randn(B, 3, N) * 0.4).astype(np.float32),
        }
        for _ in range(EPOCH_LEN)
    ]


def _fixed_eps():
    """One posterior-noise draw per global step, shared by both sides."""
    rng = np.random.RandomState(77)
    steps = N_EPOCHS * EPOCH_LEN
    return rng.randn(steps, B, TINY_CONFIG["g_latent_space_size"]).astype(
        np.float32
    )


def _run_reference(batches, eps_all, monkeypatch):
    """The reference's own train() loop, one call per epoch, with the
    posterior noise injected and every criterion call recorded."""
    _stub_structural_losses()
    # CPU-only host: the loop calls batch['cloud'].cuda(non_blocking=True)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    # training.py:334 uses np.infty (removed in numpy 2.0) at import time
    monkeypatch.setattr(np, "infty", np.inf, raising=False)

    from lib.networks.flow_mixture import Flow_Mixture_Model
    from lib.networks.losses import Flow_Mixture_Loss
    from lib.networks.optimizers import Adam, LRUpdater
    from lib.networks import training as ref_training

    torch.manual_seed(100)
    model = Flow_Mixture_Model(**TINY_CONFIG)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)

    eps_queue = deque(np.copy(eps_all))

    def synced_reparameterize(mu, logvar):
        std = torch.exp(0.5 * logvar)
        eps = torch.from_numpy(np.ascontiguousarray(eps_queue.popleft()))
        return eps.mul(std).add_(mu)

    model.reparameterize = synced_reparameterize  # instance attr wins

    class RecordingLoss(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner
            self.records = []

        def forward(self, output_prior, output_decoder, logits):
            loss, pnll, gnll, gent = self.inner(
                output_prior, output_decoder, logits
            )
            self.records.append(
                [float(loss), float(pnll), float(gnll), float(gent)]
            )
            return loss, pnll, gnll, gent

    criterion = RecordingLoss(Flow_Mixture_Loss(
        pnll_weight=1.0, gnll_weight=1.0, gent_weight=1.0,
        n_components=TINY_CONFIG["n_components"],
    ))
    optimizer = Adam(model.parameters(), lr=HP["max_lr"],
                     weight_decay=HP["wd"],
                     betas=(HP["beta1"], HP["max_beta2"]), amsgrad=True)
    scheduler = LRUpdater(EPOCH_LEN, **HP)

    iterator = [
        {k: torch.from_numpy(v) for k, v in b.items()} for b in batches
    ]
    kwargs = dict(num_workers=1, logging=False, distributed=False,
                  train_mode=TINY_CONFIG["train_mode"],
                  logging_path=".", model_name="parity.pkl")
    mid_state = None
    for epoch in range(N_EPOCHS):
        ref_training.train(iterator, model, criterion, optimizer,
                           scheduler, epoch, 0, epoch < WARMUP_EPOCHS,
                           None, **kwargs)
        if epoch == MID_EPOCH - 1:
            mid_state = {k: v.detach().clone()
                         for k, v in model.state_dict().items()}
    assert len(eps_queue) == 0, "reference drew fewer eps than expected"
    return model, np.asarray(criterion.records), mid_state


def _build_ours(ref_model):
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import TrainState
    from go_with_the_flows_tpu.utils.config import model_config_kwargs
    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )

    variables = mixture_variables_from_state_dict(
        ref_model.state_dict(), TINY_CONFIG, scan_couplings=True
    )
    variables = jax.tree.map(jnp.asarray, variables)
    kwargs = model_config_kwargs(TINY_CONFIG)
    kwargs["scan_couplings"] = True
    model = FlowMixtureModel(**kwargs)
    optimizer = make_optimizer(epoch_length=EPOCH_LEN, **HP)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
    )
    return model, optimizer, state


def _eager_step(model, optimizer, state, g, p, rng, warmup):
    """make_train_step's exact body, run eagerly (so the posterior noise
    can vary per call via the monkeypatched _reparameterize) — pinned to
    the jitted step by test_eager_step_matches_jitted_train_step."""
    from go_with_the_flows_tpu.losses import flow_mixture_loss
    from go_with_the_flows_tpu.train.state import TrainState

    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mutated = model.apply(
            variables, jnp.asarray(g), jnp.asarray(p),
            rngs={"sample": step_rng}, mutable=["batch_stats"],
            mode="training", warmup=warmup,
        )
        loss, metrics = flow_mixture_loss(out, 1.0, 1.0, 1.0)
        return loss, (mutated["batch_stats"], metrics)

    grads, (batch_stats, metrics) = jax.grad(
        loss_fn, has_aux=True
    )(state.params)
    deltas, opt_state = optimizer.update(grads, state.opt_state,
                                         state.params)
    params = optax.apply_updates(state.params, deltas)
    new_state = TrainState(step=state.step + 1, params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
    return new_state, metrics


def test_step_locked_training_parity(monkeypatch):
    batches = _fixed_batches()
    eps_all = _fixed_eps()

    ref_model, ref_records, ref_mid = _run_reference(
        batches, eps_all, monkeypatch)
    assert ref_records.shape == (N_EPOCHS * EPOCH_LEN, 4)

    import go_with_the_flows_tpu.models.mixture as mixmod

    model, optimizer, state = _build_ours_initial()

    holder = {}

    def synced_reparameterize(rng, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        return mu + std * jnp.asarray(holder["eps"], mu.dtype)

    monkeypatch.setattr(mixmod, "_reparameterize", synced_reparameterize)

    ours = []
    our_mid_stats = None
    rng = jax.random.PRNGKey(0)
    t = 0
    for epoch in range(N_EPOCHS):
        for batch in batches:
            holder["eps"] = eps_all[t]
            state, metrics = _eager_step(
                model, optimizer, state, batch["cloud"],
                batch["eval_cloud"], rng, epoch < WARMUP_EPOCHS,
            )
            ours.append([float(metrics[k])
                         for k in ("loss", "pnll", "gnll", "gent")])
            t += 1
        if epoch == MID_EPOCH - 1:
            our_mid_stats = jax.tree.map(np.asarray, state.batch_stats)
    ours = np.asarray(ours)

    # per-step trajectories track: same forward, same gradients, same
    # optimizer math, drift limited to f32 roundoff accumulation
    scale = np.maximum(np.abs(ref_records), 1.0)
    rel = np.abs(ours - ref_records) / scale
    worst = rel.max(axis=0)
    assert rel[:5].max() < 2e-4, (
        f"early-step drift {rel[:5].max():.2e}\n"
        f"ours[:5]={ours[:5]}\nref[:5]={ref_records[:5]}"
    )
    assert rel.max() < 5e-3, (
        f"trajectory drift loss/pnll/gnll/gent={worst}\n"
        f"last ours={ours[-1]} ref={ref_records[-1]}"
    )

    # final parameters agree leaf-for-leaf (through the same converter
    # that synced the init, so layout differences cancel)
    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )

    want = mixture_variables_from_state_dict(
        ref_model.state_dict(), TINY_CONFIG, scan_couplings=True
    )
    want_mid = mixture_variables_from_state_dict(
        ref_mid, TINY_CONFIG, scan_couplings=True
    )
    from jax.tree_util import keystr, tree_flatten_with_path

    # One leaf is LOSS-INVARIANT and random-walks independently in each
    # framework: the pc_encoder's final BN bias. Its only consumers
    # (posterior / weights-encoder MLPs) all batch-normalize in train
    # mode, and a per-channel bias shifts every batch row equally, so
    # the shift cancels exactly — its true gradient is 0 (measured
    # ~1e-8 roundoff noise in torch). Adam normalizes that noise into
    # ±lr sign steps, so torch and jax walk it independently; the drift
    # is bounded by the accumulated-lr sign-walk, which is what we
    # assert instead.
    walk_bound = 1.5 * N_EPOCHS * EPOCH_LEN * HP["max_lr"]
    loss_invariant = {"['pc_encoder']['sd1_bn']['bias']"}
    # ... and the posterior's first BN running_mean absorbs that walking
    # shift directly (same invariance: the BN subtracts it from the
    # batch), so it inherits the same bounded-walk treatment (x2: the
    # mlp0 linear map can amplify the per-channel shift)
    walk_absorbed = {"['g_posterior']['mlp0_bn']['mean']"}

    # batch_stats are compared at the MID-RUN snapshot (one epoch past
    # the warmup transition), not at the horizon: the running stats of
    # the B=4-reduced latent BNs are snapshots of ACTIVATIONS, which the
    # walking loss-invariant bias shifts directly (the downstream BN
    # running_mean absorbs it) and late-run chaotic f32 divergence
    # perturbs far faster than any trainable state — by the horizon the
    # g_posterior/p_prior mlp0_bn stats drift ~1e-1 while every
    # parameter still agrees to 5e-3. The semantics of the stat update
    # itself (Bessel-corrected torch bookkeeping) are pinned exactly in
    # tests/test_train_kernel.py and the TorchBatchNorm unit behavior.
    for name, got_tree, want_tree in (
        ("params", state.params, want["params"]),
        ("mid batch_stats", our_mid_stats, want_mid["batch_stats"]),
    ):
        got_f, _ = tree_flatten_with_path(
            jax.tree.map(np.asarray, got_tree))
        want_f, _ = tree_flatten_with_path(want_tree)
        assert len(got_f) == len(want_f)
        bad = []
        for (kp, a), (_, b) in zip(got_f, want_f):
            d = np.abs(np.asarray(a) - np.asarray(b))
            walk = (name == "params" and keystr(kp) in loss_invariant) \
                or (name != "params" and keystr(kp) in walk_absorbed)
            if walk:
                if np.any(d > 2 * walk_bound):
                    bad.append(f"{name} {keystr(kp)}: sign-walk bound "
                               f"exceeded: {d.max():.3e} > "
                               f"{2 * walk_bound}")
                continue
            tol = 5e-3 * np.abs(np.asarray(b)) + 5e-4
            if np.any(d > tol):
                bad.append(f"{name} {keystr(kp)}: maxabs="
                           f"{d.max():.3e} shape={np.shape(a)}")
        assert not bad, "\n".join(bad)


def _build_ours_initial():
    """Fresh torch init (same seed as _run_reference) -> synced flax
    state, WITHOUT training the torch side (its BN stats mutate)."""
    _stub_structural_losses()
    from lib.networks.flow_mixture import Flow_Mixture_Model

    torch.manual_seed(100)
    ref = Flow_Mixture_Model(**TINY_CONFIG)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    return _build_ours(ref)


def test_eager_step_matches_jitted_train_step():
    """Pins _eager_step to train.step.make_train_step: same state, batch,
    rng and warmup flag -> identical loss and updated parameters (the
    parity test above may then stand in for the real jitted step)."""
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_train_step
    from go_with_the_flows_tpu.utils.config import model_config_kwargs

    kwargs = model_config_kwargs(TINY_CONFIG)
    kwargs["scan_couplings"] = True
    model = FlowMixtureModel(**kwargs)
    optimizer = make_optimizer(epoch_length=EPOCH_LEN, **HP)
    batches = _fixed_batches()
    state = create_train_state(
        model, jax.random.PRNGKey(3), batches[0], optimizer
    )
    rng = jax.random.PRNGKey(0)

    jitted = make_train_step(model, optimizer)
    # the jitted step DONATES its state, and an eager step passes
    # unmutated batch_stats leaves through by reference — give the
    # jitted branch its own buffers so donation cannot delete the
    # eager branch's state
    s_jit = jax.tree.map(jnp.array, state)
    s_eager = state
    for i, warmup in ((0, True), (1, False)):
        b = batches[i]
        s_eager, m_eager = _eager_step(
            model, optimizer, s_eager, b["cloud"], b["eval_cloud"], rng,
            warmup,
        )
        s_jit, m_jit = jitted(
            s_jit, jnp.asarray(b["cloud"]), jnp.asarray(b["eval_cloud"]),
            rng, warmup=warmup,
        )
        np.testing.assert_allclose(
            float(m_eager["loss"]), float(m_jit["loss"]),
            rtol=1e-6, atol=1e-6,
        )
    # params: jit fuses differently than eager, so gradients differ at
    # f32 roundoff, and Adam's normalized update amplifies that to
    # ~1e-4-level parameter differences for near-zero-gradient leaves —
    # the loss equality above (1e-6) is the tight pin; here we bound the
    # amplified drift well below one step's update magnitude (~2e-3).
    # The pc_encoder's final BN bias has a STRUCTURALLY ZERO gradient
    # (see test_step_locked_training_parity) and random-walks at +-lr
    # independently under each compilation — bounded by the 2-step walk.
    from jax.tree_util import keystr, tree_flatten_with_path

    eager_f, _ = tree_flatten_with_path(s_eager.params)
    jit_f, _ = tree_flatten_with_path(s_jit.params)
    for (kp, a), (_, b) in zip(eager_f, jit_f):
        if keystr(kp) == "['pc_encoder']['sd1_bn']['bias']":
            assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < \
                2 * 1.5 * HP["max_lr"]
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=5e-4,
                                   err_msg=keystr(kp))
