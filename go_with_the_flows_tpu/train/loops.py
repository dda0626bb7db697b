"""Training / validation / reconstruction loops.

Behavior port of `lib/networks/training.py` onto the jitted steps:

  * train(): per-step optimizer update with the cosine lr/beta2 schedule
    baked into the optimizer; stdout meter lines every `num_workers` steps
    (training.py:58-67); NaN loss aborts (training.py:43-46 — we raise
    instead of exit()); checkpoint every 100*num_workers steps and at
    epoch end (training.py:71-100); TB scalars per epoch.
  * evaluate_val(): validation loss with BN in inference mode
    (training.py:103-183), best-model checkpointing, optional
    reconstruction figures.
  * reconstruct()/predict(): labeled autoencoding reconstruction dumps
    (training.py:334-390).

Device interaction: metric fetches ride JAX's async dispatch (one step
behind), so the guard/meters cost no pipeline stalls.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.meters import AverageMeter
from .checkpoints import save_checkpoint
from .state import TrainState


class NaNLossError(RuntimeError):
    """Raised when the loss goes NaN/Inf (the reference exits the process,
    training.py:43-46 / :129-135; raising is the fixed behavior flagged in
    SURVEY.md §7)."""


def _fetch(metrics):
    return {k: float(v) for k, v in metrics.items()}


def train(
    loader,
    train_step: Callable,
    state: TrainState,
    epoch: int,
    start_iter: int,
    warmup: bool,
    rng: jax.Array,
    writer=None,
    svr: bool = False,
    mesh=None,
    per_step_tb: bool = False,
    svr_recon_fn: Optional[Callable] = None,
    **config,
) -> TrainState:
    """One training epoch. Returns the updated state.

    `mesh`: when given, each host batch is placed with the batch axis
    sharded over the mesh's 'data' axis (multi-host safe via
    make_array_from_process_local_data) — the data-parallel path.
    Metrics are fetched one step behind so the host never blocks on the
    in-flight device step.

    SVR instrumentation (reference training.py:248-254, 269-291):
    `per_step_tb` writes the running loss/PNLL/GNLL/GENT averages at
    every global step; `svr_recon_fn(state) -> (samples, gts, labels,
    images)` is called on the checkpoint cadence (with `logging_img`)
    and its output logged as SVR reconstruction figures with the
    conditioning image.
    """
    num_workers = max(int(config.get("num_workers", 1)), 1)
    logging = config.get("logging", False)
    # checkpointing must be PROCESS-UNIFORM: save_checkpoint is a
    # collective in multi-process runs, while `logging` (stdout/TB) is
    # rank-0 only. CLIs set checkpointing=True on every process;
    # single-process library callers fall back to the logging flag.
    ckpting = config.get("checkpointing", logging)
    logging_path = config.get("logging_path", ".")
    model_name = config.get("model_name", "model.ckpt")
    # figure/checkpoint cadence: reference hardcodes 100*num_workers
    # steps (training.py:257); configurable so short runs can see it
    ckpt_steps = int(config.get("logging_img_steps", 100 * num_workers))
    # --profile <dir>: capture a jax.profiler device trace of steps
    # [1, profile_steps] (step 0 is the compile) into profile_dir
    profile_dir = config.get("profile_dir") or None
    profile_steps = max(int(config.get("profile_steps", 3)), 1)

    batch_time = AverageMeter()
    data_time = AverageMeter()
    meters = {k: AverageMeter() for k in ("loss", "pnll", "gnll", "gent")}

    from ..parallel.mesh import place_batch

    def put(batch):
        return place_batch(mesh, batch)

    def consume(metrics, bsz, it):
        m = _fetch(metrics)
        if not np.isfinite(m["loss"]):
            raise NaNLossError(
                f"Loss is {m['loss']} at epoch {epoch} iter {it}"
            )
        for k in meters:
            meters[k].update(m[k], bsz)
        if per_step_tb and writer is not None and logging:
            # running averages per global step (training.py:248-254)
            step = epoch * n_batches + it + 1
            writer.add_scalar("train/loss", meters["loss"].avg, step)
            writer.add_scalar("train/PNLL", meters["pnll"].avg, step)
            writer.add_scalar("train/GNLL", meters["gnll"].avg, step)
            writer.add_scalar("train/GENT", meters["gent"].avg, step)

    loader.set_epoch(epoch)
    n_batches = len(loader)
    pending = None  # (metrics, bsz, it) of the in-flight step
    end = time.time()
    import contextlib

    from ..utils import profiling

    trace_scope = contextlib.ExitStack()
    try:
        for i, batch in enumerate(loader):
            it = start_iter + i
            if it >= n_batches:
                break
            data_time.update(time.time() - end)

            if profile_dir and i == 1:  # step 0 was the compile
                trace_scope.enter_context(profiling.trace(profile_dir))
            dev = put(batch)
            g, p = dev["cloud"], dev["eval_cloud"]
            with profiling.annotate(f"train_step_{it}") \
                    if profile_dir else contextlib.nullcontext():
                if svr:
                    state, metrics = train_step(
                        state, g, p, rng, images=dev["image"], warmup=warmup
                    )
                else:
                    state, metrics = train_step(state, g, p, rng,
                                                 warmup=warmup)
            if profile_dir and i == profile_steps:
                jax.block_until_ready(metrics)  # traced compute completes
                trace_scope.close()
                profile_dir = None

            if pending is not None:
                consume(*pending)  # blocks on the PREVIOUS step only
            pending = (metrics, g.shape[0], it)
            batch_time.update(time.time() - end)
            end = time.time()

            if (it + 1) % num_workers == 0 and logging:
                line = (
                    f"Epoch: [{epoch + 1}][{it + 1}/{n_batches}]"
                    f"\tTime {batch_time.val:.3f} ({batch_time.avg:.3f})"
                    f"\tData {data_time.val:.3f} ({data_time.avg:.3f})"
                    f"\tLB {meters['loss'].val:.2f}"
                    f" ({meters['loss'].avg:.2f})"
                    f"\tPNLL {meters['pnll'].val:.2f}"
                    f" ({meters['pnll'].avg:.2f})"
                    f"\tGNLL {meters['gnll'].val:.2f}"
                    f" ({meters['gnll'].avg:.2f})"
                    f"\tGENT {meters['gent'].val:.2f}"
                    f" ({meters['gent'].avg:.2f})\n"
                )
                sys.stdout.write(line)
                sys.stdout.flush()

            if (it + 1) % ckpt_steps == 0:
                if ckpting:
                    save_checkpoint(logging_path, model_name, state, epoch,
                                    it + 1)
                # periodic SVR reconstruction figures with the
                # conditioning image (training.py:269-291). svr_recon_fn
                # contains multi-host collectives (gather_global), so ALL
                # processes run it; only the TB write is rank-0 (writer).
                if svr_recon_fn is not None and config.get("logging_img"):
                    samples, gts, labels, images = svr_recon_fn(state)
                    if writer is not None and logging:
                        from ..viz.tb import add_svr_reconstruction_tb

                        add_svr_reconstruction_tb(
                            images, gts, samples, labels, writer,
                            epoch * n_batches + it + 1,
                        )
    finally:
        trace_scope.close()  # epochs shorter than profile_steps

    if pending is not None:
        consume(*pending)
    if logging and writer is not None and not per_step_tb:
        writer.add_scalar("train/loss", meters["loss"].avg, epoch)
        writer.add_scalar("train/PNLL", meters["pnll"].avg, epoch)
        writer.add_scalar("train/GNLL", meters["gnll"].avg, epoch)
        writer.add_scalar("train/GENT", meters["gent"].avg, epoch)
    if ckpting:
        save_checkpoint(logging_path, model_name, state, epoch + 1, 0)
    return state


def evaluate_val(
    loader,
    eval_step: Callable,
    state: TrainState,
    epoch: int,
    warmup: bool,
    min_loss: float,
    rng: jax.Array,
    writer=None,
    svr: bool = False,
    reconstruct_fn: Optional[Callable] = None,
    mesh=None,
    **config,
) -> float:
    """Validation epoch: training-path loss with BN in inference mode +
    best-model checkpoint. Returns the updated min_loss.

    With `mesh`, each batch is placed as a global batch-sharded array, so
    the per-batch loss — and therefore min_loss and the best-model
    decision — is computed over the GLOBAL batch and is bit-identical on
    every process (the reference's per-rank eval can diverge in its
    best-model choice, train_ae.py:163-167)."""
    from ..parallel.mesh import place_batch_uneven

    logging = config.get("logging", False)
    # process-uniform (see train()): the best-model save must run on
    # every process — the global-batch loss makes min_loss identical
    # everywhere, so the decision itself cannot diverge
    ckpting = config.get("checkpointing", logging)
    logging_path = config.get("logging_path", ".")
    model_name = config.get("model_name", "model.ckpt")
    meters = {k: AverageMeter() for k in ("loss", "pnll", "gnll", "gent")}

    for i, batch in enumerate(loader):
        # uneven final batches are padded by repeating the last row; the
        # scalar loss then weighs those copies like the reference's
        # wrap-padded DistributedSampler does (train_ae.py:100-103)
        dev, _ = place_batch_uneven(mesh, batch)
        g, p = dev["cloud"], dev["eval_cloud"]
        key = jax.random.fold_in(rng, i)  # fresh noise per batch
        if svr:
            metrics = eval_step(
                state, g, p, key, images=dev["image"], warmup=warmup,
            )
        else:
            metrics = eval_step(state, g, p, key, warmup=warmup)
        m = _fetch(metrics)
        if not np.isfinite(m["loss"]):
            raise NaNLossError(f"Eval loss is {m['loss']} at epoch {epoch}")
        for k in meters:
            meters[k].update(m[k], g.shape[0])

    if logging:
        print(f"[epoch {epoch}]: eval loss {meters['loss'].avg:f}")
    if logging and writer is not None:
        writer.add_scalar("val/loss", meters["loss"].avg, epoch)
        writer.add_scalar("val/PNLL", meters["pnll"].avg, epoch)
        writer.add_scalar("val/GNLL", meters["gnll"].avg, epoch)
        writer.add_scalar("val/GENT", meters["gent"].avg, epoch)

    # reconstruct_fn contains multi-host collectives (gather_global), so
    # when figures are on, ALL processes run it; only the TB write is
    # rank-0 (writer). The gating config keys are process-uniform.
    if (
        reconstruct_fn is not None
        and config.get("logging_img")
        and (logging or jax.process_count() > 1)
        and epoch % max(int(config.get("logging_img_frequency", 1)), 1) == 0
    ):
        samples, gts, labels = reconstruct_fn(state, max_batches=1)
        if logging and writer is not None:
            from ..viz.tb import add_figures_reconstruction_tb

            add_figures_reconstruction_tb(gts, samples, labels, writer,
                                          epoch)

    if meters["loss"].avg < min_loss:
        min_loss = meters["loss"].avg
        if ckpting:
            save_checkpoint(
                logging_path, "best_model_" + model_name, state,
                epoch + 1, 0,
            )
    return min_loss


def reconstruct(
    loader,
    sample_step: Callable,
    state: TrainState,
    rng: jax.Array,
    max_batches: Optional[int] = None,
    svr: bool = False,
    mesh=None,
    return_images: bool = False,
):
    """Labeled autoencoding/SVR reconstruction over a dataset
    (training.py:334-376) — batched, no per-shape unrolling needed thanks
    to the static mixture sampling. With `mesh`, batches are globally
    sharded and the outputs allgathered, so every process returns the
    identical full buffers. `return_images` (svr only) appends the host
    conditioning images — the reference's SVR figure path
    (training.py:269-291) needs them."""
    from ..parallel.mesh import (
        place_batch_uneven, gather_global, gather_batch,
    )

    all_samples, all_gts, all_labels, all_images = [], [], [], []
    for b, batch in enumerate(loader):
        if max_batches is not None and b >= max_batches:
            break
        dev, trim = place_batch_uneven(mesh, batch)
        key = jax.random.fold_in(rng, b)
        if svr:
            samples, labels, _ = sample_step(
                state, dev["cloud"], key, images=dev["image"]
            )
        else:
            samples, labels, _ = sample_step(state, dev["cloud"], key)
        all_samples.append(trim(gather_global(samples)))
        # gather only the keys we keep (full image buffers would be
        # ~160x the payload); host batches are unpadded, so no trim
        all_gts.append(gather_batch({"cloud": batch["cloud"]})["cloud"])
        all_labels.append(trim(gather_global(labels)))
        if return_images and svr:
            all_images.append(
                gather_batch({"image": batch["image"]})["image"]
            )
    out = (
        np.concatenate(all_samples),
        np.concatenate(all_gts),
        np.concatenate(all_labels),
    )
    if return_images and svr:
        return out + (np.concatenate(all_images),)
    return out


def predict(
    loader,
    sample_step: Callable,
    state: TrainState,
    rng: jax.Array,
    out_dir: str,
    svr: bool = False,
    mesh=None,
):
    """Reconstruct the whole loader and dump npy files
    (training.py:379-390); multi-host safe (rank-0 writes)."""
    samples, gts, labels = reconstruct(
        loader, sample_step, state, rng, svr=svr, mesh=mesh
    )
    if jax.process_index() != 0:
        return samples, gts, labels
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "all_samples.npy"), samples)
    np.save(os.path.join(out_dir, "all_gts.npy"), gts)
    np.save(os.path.join(out_dir, "all_labels.npy"), labels)
    return samples, gts, labels
