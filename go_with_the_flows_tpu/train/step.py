"""Jitted train / eval steps.

One fused XLA program per step: forward (training path), loss, backward,
optimizer update, BN running-stat update. Under a sharded batch this is the
complete data-parallel step — gradient reduction is XLA-inserted
(the reference needs DDP hooks + SyncBN for the same semantics,
train_ae.py:151-153).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import flow_mixture_loss
from .state import TrainState


def _mesh_data_shards():
    """(data-axis size, product of all OTHER axis sizes) of the abstract
    mesh active at trace time (1, 1 when no mesh is set)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty:
        return 1, 1
    sizes = dict(zip(mesh.axis_names, mesh.axis_sizes))
    data = sizes.get("data", 1)
    others = 1
    for name, size in sizes.items():
        if name != "data":
            others *= size
    return data, others


def _use_fused_decoder(fused_decoder) -> bool:
    """Resolve the fused-training-decoder gate at trace time.

    None = auto: only on TPU (the kernel interprets elsewhere, which is
    far slower than XLA), only WITHOUT a >1-device mesh, and only at
    'high'/'fast' matmul precision: measured on v5e (B=64 flagship,
    tools/train_fused_bench.py), the fused step wins 136 -> 118 ms at
    'high' and 127 -> 53 ms at 'fast' (XLA is HBM-bound there), but at
    'highest' both paths are bound by the 6-pass f32 MXU emulation and
    XLA's overlap wins (158 vs ~190).

    Under a >1-device 'data' mesh the fused path EXISTS — the kernels
    exchange BatchNorm batch statistics across shards with in-kernel
    remote DMAs, reproducing the XLA path's global-batch SyncBN
    semantics exactly (ops/pallas/train_kernel.py
    make_fused_train_decode_spmd, validated on a virtual multi-device
    mesh in tests/test_train_kernel_spmd.py) — but stays OPT-IN
    (fused_decoder=True): its perf has no real multi-chip evidence in
    this environment, so auto keeps the known-good XLA SPMD path."""
    if fused_decoder is None:
        if jax.default_backend() != "tpu":
            return False
        from ..ops.pallas.coupling_kernel import _kernel_precision_mode

        if _kernel_precision_mode() not in ("high", "fast"):
            return False
        data, others = _mesh_data_shards()
        return data == 1 and others == 1
    return bool(fused_decoder)


def _fused_training_decode(model, params, g_sample, p_clouds):
    """Run the point-decoder inverse through the fused Pallas training
    kernel (ops/pallas/train_kernel.py). Returns (p0, logvar_sums,
    stats-update closure for the new batch_stats subtree)."""
    from ..models.mixture import reduce_decoder_params
    from ..ops.pallas.coupling_kernel import _kernel_precision_mode
    from ..ops.pallas.train_kernel import (
        decoder_stats_update,
        film_wb_train,
        fused_train_decode,
        pack_point_decoder_train,
    )

    depth, _ = reduce_decoder_params(
        model.n_components, model.params_reduce_mode,
        model.p_decoder_n_flows, model.p_decoder_n_features,
        model.g_latent_space_size,
    )
    scan = model.scan_couplings
    packed = jax.vmap(
        lambda pr: pack_point_decoder_train(pr, depth, scan)
    )(params["pc_decoder"])
    ab, film_stats = jax.vmap(film_wb_train, in_axes=(0, None))(
        packed, g_sample
    )
    K = model.n_components
    p_stack = jnp.broadcast_to(p_clouds[None], (K,) + p_clouds.shape)
    interpret = jax.default_backend() != "tpu"  # tests
    n_data, n_other = _mesh_data_shards()
    if n_data > 1:
        if n_other > 1:
            raise NotImplementedError(
                "the fused training decoder shards the batch ('data') "
                "axis only; run with a points-axis size of 1 or "
                "fused_decoder=False"
            )
        from ..ops.pallas.train_kernel import make_fused_train_decode_spmd

        if interpret:
            # plain interpret=True cannot emulate the in-kernel remote
            # DMAs; the TPU interpret mode's shared-memory simulator can
            from jax.experimental.pallas import tpu as pltpu

            interpret = pltpu.InterpretParams()
        decode = make_fused_train_decode_spmd(
            "data", n_data, interpret, _kernel_precision_mode()
        )
        p0, lv, stats = decode(packed, ab, p_stack)
    else:
        p0, lv, stats = fused_train_decode(
            packed, ab, p_stack, interpret, _kernel_precision_mode()
        )

    # Bessel-correction counts for the running-var blend (TorchBatchNorm
    # semantics): conditioner BNs reduce over (global batch x points),
    # film BNs over the global batch. Shapes here are GLOBAL under jit.
    B_glob, _, N_pts = p_clouds.shape

    def stats_update(old_decoder_stats):
        return decoder_stats_update(
            old_decoder_stats, stats, film_stats, depth, scan,
            n_sd=B_glob * N_pts, n_film=B_glob,
        )

    return p0, lv, stats_update


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
    svr: bool = False,
    fused_decoder: bool | None = None,
) -> Callable:
    """Build the jitted training step.

    step(state, g_clouds, p_clouds, rng, [images,] warmup) ->
        (new_state, metrics dict of scalars)

    The per-step RNG is folded with the step counter so resume reproduces
    the same sample stream.

    `fused_decoder`: run the point-decoder inverse + backward through the
    fused Pallas training kernel (the step's hot path — the XLA version
    is HBM-bound at reduced precisions). None = auto (TPU, single
    device, 'high'/'fast' matmul precision — see _use_fused_decoder for
    the measured win matrix); True forces it (interpret mode off-TPU —
    tests); False keeps the XLA path. Gradients and loss match the XLA
    path to fp32 roundoff (tests/test_train_kernel.py); BatchNorm
    running stats are updated with identical flax semantics from the
    kernel's on-chip batch statistics.
    """
    @functools.partial(
        jax.jit, static_argnames=("warmup",), donate_argnums=(0,)
    )
    def train_step(state: TrainState, g_clouds, p_clouds, rng,
                   images=None, warmup: bool = False):
        # resolved at TRACE time (inside jit): the CLIs build the step
        # BEFORE entering `jax.set_mesh`, so only here is the mesh the
        # step actually runs under visible (a retrace under a different
        # mesh re-resolves it)
        use_fused = _use_fused_decoder(fused_decoder)
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            kwargs = dict(mode="training", warmup=warmup,
                          skip_decoder=use_fused)
            if svr:
                out, mutated = model.apply(
                    variables, g_clouds, p_clouds, images=images,
                    rngs={"sample": step_rng}, mutable=["batch_stats"],
                    **kwargs,
                )
            else:
                out, mutated = model.apply(
                    variables, g_clouds, p_clouds,
                    rngs={"sample": step_rng}, mutable=["batch_stats"],
                    **kwargs,
                )
            batch_stats = mutated["batch_stats"]
            if use_fused:
                p0, lv, stats_update = _fused_training_decode(
                    model, params, out["g_sample"], p_clouds
                )
                out = {**out, "p0_samples": p0, "p_logvar_sums": lv}
                batch_stats = {
                    **batch_stats,
                    "pc_decoder": stats_update(
                        state.batch_stats["pc_decoder"]
                    ),
                }
            loss, metrics = flow_mixture_loss(
                out, pnll_weight, gnll_weight, gent_weight
            )
            return loss, (batch_stats, metrics)

        grads, (batch_stats, metrics) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        deltas, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, deltas)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    pnll_weight: float = 1.0,
    gnll_weight: float = 1.0,
    gent_weight: float = 1.0,
    svr: bool = False,
) -> Callable:
    """Validation loss step: the training forward path with BatchNorm in
    inference mode — exactly the reference's eval() semantics
    (model.eval() but util_mode still 'training', training.py:110-118).
    """

    @functools.partial(jax.jit, static_argnames=("warmup",))
    def eval_step(state: TrainState, g_clouds, p_clouds, rng,
                  images=None, warmup: bool = False):
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        kwargs = dict(mode="training", train=False, warmup=warmup)
        if svr:
            out = model.apply(
                variables, g_clouds, p_clouds, images=images,
                rngs={"sample": rng}, **kwargs,
            )
        else:
            out = model.apply(
                variables, g_clouds, p_clouds,
                rngs={"sample": rng}, **kwargs,
            )
        _, metrics = flow_mixture_loss(
            out, pnll_weight, gnll_weight, gent_weight
        )
        return metrics

    return eval_step


def make_sample_step(model, n_sampled_points: int, mode: str = "generating",
                     svr: bool = False) -> Callable:
    """Jitted labeled sampling step for evaluation / reconstruction.
    Returns (samples (B,3,N), labels (B,N), logits (B,K))."""

    @jax.jit
    def sample_step(state: TrainState, g_clouds, rng, images=None):
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        kwargs = dict(mode=mode, n_sampled_points=n_sampled_points)
        if svr:
            _, samples, labels, logits = model.apply(
                variables, g_clouds, images=images,
                rngs={"sample": rng}, **kwargs,
            )
        else:
            _, samples, labels, logits = model.apply(
                variables, g_clouds,
                rngs={"sample": rng}, **kwargs,
            )
        return samples, labels, logits

    return sample_step
