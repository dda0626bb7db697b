"""Evaluation driver.

Behavior port of `lib/networks/evaluating.py:13-266` onto the TPU metric
suite:

  * per-batch labeled mixture sampling with per-sample inference timing
    (evaluating.py:86-98) — here the sampling is a single jitted program
    per batch, no host-side component assignment;
  * de-normalization back to unit / original scale
    (evaluating.py:101-120);
  * optional h5 dump of sampled/gt clouds + labels (+ images)
    (evaluating.py:16-48,122-133). NOTE: the reference's dump never
    triggers because it reads kwargs['saving'] while the CLI sets
    'saving_mode' (the bug is documented in SURVEY.md §7); here the
    `saving` kwarg works;
  * autoencoding -> paired EMD_CD_F1 over full buffers, batch 60,
    CD x1e4 / EMD x1e2 (evaluating.py:167-189);
  * generating -> NaN-cloud replacement, voxel JSD x1e2, and
    compute_all_metrics -> MMD/COV/1-NNA over CD(x1e4)/EMD(x1e2)/F1
    (evaluating.py:196-250);
  * reconstruction (SVR) -> streaming per-batch CD/EMD/F1 meters
    (evaluating.py:138-160,252-261).
"""

from __future__ import annotations

import os
from time import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.evaluation import (
    EMD_CD_F1,
    compute_all_metrics,
    voxel_jsd,
    f_score,
)
from ..ops.chamfer import chamfer
from ..ops.emd import emd_approx
from ..utils.meters import AverageMeter


def _denormalize(r_clouds, p_clouds, batch, **kwargs):
    """Rescale model-frame clouds back to the evaluation frame
    (evaluating.py:101-120). Clouds are (B, 3, N) numpy."""
    if kwargs.get("unit_scale_evaluation"):
        if kwargs.get("cloud_scale"):
            scale = kwargs["cloud_scale_scale"]
            r_clouds = r_clouds * scale
            p_clouds = p_clouds * scale
    if kwargs.get("orig_scale_evaluation"):
        if kwargs.get("cloud_scale"):
            scale = kwargs["cloud_scale_scale"]
            r_clouds = r_clouds * scale
            p_clouds = p_clouds * scale
        if kwargs.get("cloud_translate"):
            shift = np.asarray(
                kwargs["cloud_translate_shift"], np.float32
            ).reshape(1, -1, 1)
            r_clouds = r_clouds + shift
            p_clouds = p_clouds + shift
        if not kwargs.get("cloud_rescale2orig"):
            # orig_s is (B,) in the packed h5 (preprocess writes (n,))
            s = np.asarray(batch["orig_s"]).reshape(-1, 1, 1)
            r_clouds = r_clouds * s
            p_clouds = p_clouds * s
        if not kwargs.get("cloud_recenter2orig"):
            c = np.asarray(batch["orig_c"]).reshape(-1, 3, 1)
            r_clouds = r_clouds + c
            p_clouds = p_clouds + c
    return r_clouds, p_clouds


def evaluate(
    loader,
    sample_step: Callable,
    state,
    rng: jax.Array,
    svr: bool = False,
    mesh=None,
    **kwargs,
):
    """Run one evaluation pass; returns the metric dict (or meter list for
    reconstruction), mirroring the reference's printed protocol.

    Multi-host: with `mesh`, each process's loader shard is assembled
    into a global batch-sharded array, sampling runs as one SPMD program,
    and samples + ground truth are allgathered so every process computes
    the metrics over the FULL evaluation set and returns bit-identical
    numbers (the reference evals per-rank shards, training.py:103-183);
    h5 dumps are written by process 0 only and clamped to the dataset
    size. Note: when len(dataset) is not a multiple of the process
    count, the loader wrap-pads shards (DistributedSampler semantics) so
    up to n_proc-1 duplicate clouds enter the metric buffers — exactly
    the reference's padded-sampler behavior."""
    from ..parallel.mesh import (
        place_batch_uneven,
        gather_global,
        gather_batch,
    )

    util_mode = kwargs.get("util_mode")
    is_saving = kwargs.get("saving", False) and jax.process_index() == 0
    n_points = kwargs.get("sampled_cloud_size")

    clouds_file = None
    if is_saving:
        import h5py

        n_total = kwargs.get("N_sets", 1) * len(loader.dataset)
        clouds_fname = "{}_{}_{}_{}_clouds_{}.h5".format(
            os.path.splitext(kwargs["model_name"])[0],
            loader.dataset.part,
            kwargs["cloud_size"],
            kwargs["sampled_cloud_size"],
            util_mode,
        )
        clouds_fname = os.path.join(kwargs["logging_path"], clouds_fname)
        print(clouds_fname)
        clouds_file = h5py.File(clouds_fname, "w")
        sampled_ds = clouds_file.create_dataset(
            "sampled_clouds", shape=(n_total, 3, n_points), dtype=np.float32
        )
        gt_ds = clouds_file.create_dataset(
            "gt_clouds", shape=(n_total, 3, kwargs["cloud_size"]),
            dtype=np.float32,
        )
        labels_ds = clouds_file.create_dataset(
            "sampled_labels", shape=(n_total, n_points), dtype=np.int8
        )
        if svr:
            img_shape = kwargs.get("image_size", [224, 224])
            images_ds = clouds_file.create_dataset(
                "image_clouds",
                shape=(n_total, 4, img_shape[0], img_shape[1]),
                dtype=np.float32,
            )

    inf_time = AverageMeter()
    gen_buf, ref_buf = [], []
    thresholds = kwargs.get("f1_threshold_lst", [1e-3])
    CD, EMD = AverageMeter(), AverageMeter()
    F1_meters = [AverageMeter() for _ in thresholds]

    write_pos = 0
    for i, batch in enumerate(loader):
        # uneven-tail-safe placement (drop_last=False loaders): pad rows
        # are trimmed from every gathered array below
        dev, trim = place_batch_uneven(mesh, batch)
        g_clouds = dev["cloud"]

        inf_start = time()
        key = jax.random.fold_in(rng, i)
        if svr:
            samples, labels, _ = sample_step(
                state, g_clouds, key, images=dev["image"]
            )
        else:
            samples, labels, _ = sample_step(state, g_clouds, key)
        jax.block_until_ready(samples)
        # timer stops BEFORE the cross-host gathers: 'Inference time' is
        # the model cost (reference evaluating.py:86-98), not transfer.
        # Normalized by the REAL global row count (pre-pad host rows x
        # processes) — samples.shape[0] counts the uneven-tail pad rows
        # and wrap-duplicates as real samples and understates the time
        real_rows = (int(next(iter(batch.values())).shape[0])
                     * jax.process_count())
        inf_time.update((time() - inf_start) / real_rows, real_rows)
        samples = trim(gather_global(samples))
        labels = trim(gather_global(labels))
        # host batches are NEVER padded — gather_batch output is already
        # R process-major blocks of real rows, matching the trimmed
        # device arrays row for row
        batch = gather_batch(batch)
        p_clouds = np.asarray(batch["eval_cloud"])
        bsz = samples.shape[0]

        r_clouds, p_clouds = _denormalize(
            samples, p_clouds, batch, **kwargs
        )

        if clouds_file is not None:
            # clamp at the dataset size: multi-process loader shards are
            # wrap-padded (DistributedSampler semantics), so the gathered
            # stream can hold up to n_proc-1 duplicate rows at the end
            take = max(0, min(bsz, sampled_ds.shape[0] - write_pos))
            sampled_ds[write_pos:write_pos + take] = r_clouds[:take].astype(
                np.float32
            )
            gt_ds[write_pos:write_pos + take] = p_clouds[:take].astype(
                np.float32
            )
            labels_ds[write_pos:write_pos + take] = np.asarray(
                labels[:take]
            ).astype(np.int8)
            if svr:
                images_ds[write_pos:write_pos + take] = np.transpose(
                    np.asarray(batch["image"][:take]), (0, 3, 1, 2)
                ).astype(np.float32)
            write_pos += take

        if util_mode in ("autoencoding", "generating"):
            gen_buf.append(r_clouds)
            ref_buf.append(p_clouds)
        elif util_mode == "reconstruction":
            r_t = np.transpose(r_clouds, (0, 2, 1))
            p_t = np.transpose(p_clouds, (0, 2, 1))
            if kwargs.get("cd"):
                dl, dr = chamfer(jnp.asarray(r_t), jnp.asarray(p_t))
                cd = float(
                    (jnp.mean(dl, axis=1) + jnp.mean(dr, axis=1)).mean()
                )
                CD.update(cd, bsz)
            if kwargs.get("emd"):
                emd = float(
                    emd_approx(jnp.asarray(r_t), jnp.asarray(p_t)).mean()
                )
                EMD.update(emd, bsz)
            if kwargs.get("f1"):
                for t_i, thr in enumerate(thresholds):
                    F1_meters[t_i].update(
                        float(f_score(r_t, p_t, threshold=thr).mean()), bsz
                    )

    print(f"Inference time: {inf_time.avg} sec/sample")

    res: Dict[str, float] = {}
    if util_mode == "autoencoding":
        gen = np.transpose(np.concatenate(gen_buf), (0, 2, 1))
        ref = np.transpose(np.concatenate(ref_buf), (0, 2, 1))
        for thr in thresholds:
            metrics = EMD_CD_F1(
                gen, ref, batch_size=60, reduced=True,
                cd_option=kwargs.get("cd", False),
                emd_option=kwargs.get("emd", False),
                f1_option=kwargs.get("f1", False),
                f1_threshold=thr,
            )
            if kwargs.get("cd"):
                res["cd"] = float(metrics["CD"]) * 1e4
                print("CD:\t{:.2f}".format(res["cd"]))
            if kwargs.get("emd"):
                res["emd"] = float(metrics["EMD"]) * 1e2
                print("EMD:\t{:.2f}".format(res["emd"]))
            if kwargs.get("f1"):
                res[f"f1_{thr:.4f}"] = float(metrics["F1"])
                print("F1-%.4f: %.2f" % (thr, res[f"f1_{thr:.4f}"]))

    elif util_mode == "generating":
        gen = np.transpose(np.concatenate(gen_buf), (0, 2, 1))
        ref = np.transpose(np.concatenate(ref_buf), (0, 2, 1))

        # NaN-cloud replacement (evaluating.py:196-202). Seeded from the
        # eval rng (the reference uses the global np.random state, which
        # makes the reps-level mean±std non-reproducible in the NaN case)
        all_inds = set(range(gen.shape[0]))
        nan_inds = set(np.isnan(gen).sum(axis=(1, 2)).nonzero()[0])
        if nan_inds:
            ok = list(all_inds - nan_inds)
            key = (jax.random.key_data(rng)
                   if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                   else rng)
            seed = int(np.asarray(key).ravel()[-1])
            dup = np.random.default_rng(seed).choice(ok, size=len(nan_inds))
            gen[list(nan_inds)] = gen[dup]

        if kwargs.get("jsd"):
            res["jsd"] = voxel_jsd(gen, ref, warn=False) * 1e2
            print("JSD:\t{:.2f}".format(res["jsd"]))

        for thr in thresholds:
            metrics = compute_all_metrics(
                gen, ref, batch_size=60, f1_threshold=thr,
                cd_option=kwargs.get("cd", False),
                emd_option=kwargs.get("emd", False),
                f1_option=kwargs.get("f1", False),
                # reps-loop rr cache (see compute_all_metrics): the gt
                # set is identical across reps (per-item rng is seeded
                # by (base_seed, epoch, i) and epoch is fixed during
                # eval), so evaluate_ae.py passes one dict across reps
                ref_cache=kwargs.get("ref_cache"),
            )
            if kwargs.get("cd"):
                res["cd_mmds"] = float(metrics["lgan_mmd-CD"]) * 1e4
                res["cd_covs"] = float(metrics["lgan_cov-CD"]) * 1e2
                res["cd_1nns"] = float(metrics["1-NN-CD-acc"]) * 1e2
                print("MMD-CD:\t{:.2f}".format(res["cd_mmds"]))
                print("COV-CD:\t{:.2f}".format(res["cd_covs"]))
                print("1NN-CD:\t{:.2f}".format(res["cd_1nns"]))
            if kwargs.get("emd"):
                res["emd_mmds"] = float(metrics["lgan_mmd-EMD"]) * 1e2
                res["emd_covs"] = float(metrics["lgan_cov-EMD"]) * 1e2
                res["emd_1nns"] = float(metrics["1-NN-EMD-acc"]) * 1e2
                print("MMD-EMD:\t{:.2f}".format(res["emd_mmds"]))
                print("COV-EMD:\t{:.2f}".format(res["emd_covs"]))
                print("1NN-EMD:\t{:.2f}".format(res["emd_1nns"]))
            if kwargs.get("f1"):
                res[f"f1_{thr:.4f}_mmds"] = float(metrics["lgan_mmd-F1"])
                res[f"f1_{thr:.4f}_covs"] = (
                    float(metrics["lgan_cov-F1"]) * 1e2
                )
                res[f"f1_{thr:.4f}_1nns"] = (
                    float(metrics["1-NN-F1-acc"]) * 1e2
                )
                print("MMD-F1-%.4f: %.2f" % (thr, res[f"f1_{thr:.4f}_mmds"]))
                print("COV-F1-%.4f: %.2f" % (thr, res[f"f1_{thr:.4f}_covs"]))
                print("1NN-F1-%.4f: %.2f" % (thr, res[f"f1_{thr:.4f}_1nns"]))

    elif util_mode == "reconstruction":
        if kwargs.get("cd"):
            print("CD: {:.6f}".format(CD.avg))
            res["cd"] = CD.avg
        if kwargs.get("emd"):
            print("EMD: {:.6f}".format(EMD.avg))
            res["emd"] = EMD.avg
        if kwargs.get("f1"):
            for t_i, thr in enumerate(thresholds):
                print("F1-%.4f: %.2f" % (thr, F1_meters[t_i].avg))
                res[f"f1_{thr:.4f}"] = F1_meters[t_i].avg

    if clouds_file is not None:
        clouds_file.close()
    return res
