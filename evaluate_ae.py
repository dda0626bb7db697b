#!/usr/bin/env python
"""Evaluation CLI (counterpart of the reference evaluate_ae.py:17-165).

Loads an experiment's resolved config.yaml + checkpoint, evaluates in
autoencoding / generating / reconstruction mode with the full metric
protocol (CD x1e4, EMD x1e2, F1, JSD x1e2, MMD/COV/1-NNA), generating runs
repeated --reps times and reported as mean±std.
"""

import argparse
import os

import numpy as np


def define_options_parser():
    p = argparse.ArgumentParser(description="Model evaluation script.")
    p.add_argument("experiment_path", type=str,
                   help="Experiment dir containing config.yaml + ckpt.")
    p.add_argument("modelname", type=str, help="Checkpoint name.")
    p.add_argument("part", type=str, help="Dataset part: train/val/test.")
    p.add_argument("cloud_size", type=int, help="GT cloud size.")
    p.add_argument("sampled_cloud_size", type=int, help="Sampled size.")
    p.add_argument("mode", type=str,
                   help="autoencoding | generating | reconstruction | "
                        "interpolation.")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--weights_type", type=str, default="global_weights")
    p.add_argument("--reps", type=int, default=10,
                   help="Repetitions for generating mode.")
    p.add_argument("--orig_scale_evaluation", action="store_true")
    p.add_argument("--unit_scale_evaluation", action="store_true")
    p.add_argument("--save", action="store_true",
                   help="Dump sampled/gt clouds + labels to h5.")
    p.add_argument("--f1_threshold_lst", type=float, nargs="+",
                   default=[1e-3])
    p.add_argument("--jsd", action="store_true")
    p.add_argument("--cd", action="store_true")
    p.add_argument("--emd", action="store_true")
    p.add_argument("--f1", action="store_true")
    p.add_argument("--N_sets", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--interpolation_steps", type=int, default=9,
                   help="Latent interpolation steps between each shape "
                        "pair (interpolation mode).")
    p.add_argument("--interpolation_batches", type=int, default=3,
                   help="Loader batches to interpolate "
                        "(interpolation mode).")
    return p


def main():
    args = define_options_parser().parse_args()

    import jax

    from go_with_the_flows_tpu.utils.compile_cache import (
        enable_compilation_cache,
        require_backend,
    )

    enable_compilation_cache()
    require_backend()
    print(f"jax backend: {jax.default_backend()} "
          f"({jax.device_count()} device(s))", flush=True)

    from go_with_the_flows_tpu.utils.config import (
        load_config, model_config_kwargs,
    )
    from go_with_the_flows_tpu.data.datasets import (
        ShapeNetCoreDataset, ShapeNetAllDataset,
    )
    from go_with_the_flows_tpu.data.cloud_transforms import (
        ComposeCloudTransformation,
    )
    from go_with_the_flows_tpu.data.image_transforms import (
        ComposeImageTransformation,
    )
    from go_with_the_flows_tpu.data.loader import DataLoader
    from go_with_the_flows_tpu.models.mixture import (
        FlowMixtureModel, FlowMixtureSVRModel,
    )
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_sample_step
    from go_with_the_flows_tpu.train.checkpoints import restore_checkpoint
    from go_with_the_flows_tpu.eval.evaluating import evaluate

    config = load_config(os.path.join(args.experiment_path, "config.yaml"))
    from go_with_the_flows_tpu.ops.precision import set_matmul_precision

    # Eval-path precision defaults (override with `eval_matmul_precision`
    # or a legacy `matmul_precision` in the experiment config):
    #   generating     -> 'fast' (bf16): the flagship paired A/B
    #     (tools/eval_precision_ab.py, RESULTS.md round 4) shows every
    #     reported generative metric — MMD/COV/1-NNA over CD AND EMD,
    #     JSD — statistically identical to fp32-'highest' sampling (the
    #     metrics are distributional; per-point bf16 drift is a
    #     different random draw from the same flow)
    #   autoencoding / reconstruction -> 'high' (3-pass, ~f32): the
    #     PAIRED protocol's CD/EMD also match at 'fast' to 4 significant
    #     figures, but F1@1e-4 (threshold counting) moves ~2% relative —
    #     keep the ~f32 mode where pairing makes drift visible
    default_prec = "fast" if args.mode == "generating" else "high"
    set_matmul_precision(
        config.get("eval_matmul_precision",
                   config.get("matmul_precision", default_prec))
    )
    config["logging_path"] = args.experiment_path
    config["model_name"] = args.modelname
    config["cloud_size"] = args.cloud_size
    config["sampled_cloud_size"] = args.sampled_cloud_size
    config["util_mode"] = args.mode
    config["batch_size"] = args.batch_size
    config["weights_type"] = args.weights_type
    config["saving"] = args.save
    config["N_sets"] = args.N_sets
    config["orig_scale_evaluation"] = args.orig_scale_evaluation
    config["unit_scale_evaluation"] = args.unit_scale_evaluation
    config["f1_threshold_lst"] = args.f1_threshold_lst
    config["jsd"] = args.jsd
    config["cd"] = args.cd
    config["emd"] = args.emd
    config["f1"] = args.f1

    svr = config.get("train_mode") == "p_rnvp_mc_g_rnvp_vae_ic"
    need_orig = args.orig_scale_evaluation

    common = dict(
        path2data=config["path2data"],
        meshes_fname=config["meshes_fname"],
        cloud_size=args.cloud_size,
        return_eval_cloud=True,
        return_original_scale=need_orig,
        chosen_label=config.get("chosen_label"),
        base_seed=args.seed,
    )
    transform, transform_val = ComposeCloudTransformation(**config)
    if svr:
        image_transform = ComposeImageTransformation(**config)
        dataset = ShapeNetAllDataset(
            part=args.part, images_fname=config["images_fname"],
            image_transform=image_transform, cloud_transform=transform_val,
            **common,
        )
    else:
        dataset = ShapeNetCoreDataset(
            part=args.part, cloud_transform=transform_val, **common
        )
    import jax

    loader = DataLoader(
        dataset, batch_size=args.batch_size, shuffle=False,
        drop_last=False,  # the eval protocol covers the full split
        num_workers=config.get("num_workers", 0),
        worker_type=config.get("worker_type", "thread"),
        num_replicas=jax.process_count(), rank=jax.process_index(),
    )
    print(f"Dataset init: done ({len(dataset)} items).")

    model_cls = FlowMixtureSVRModel if svr else FlowMixtureModel
    kwargs = model_config_kwargs(config)
    kwargs["weights_type"] = args.weights_type
    if svr:
        kwargs["g_prior_n_layers"] = config.get("g_prior_n_layers", 1)
    model = model_cls(**kwargs)

    optimizer = make_optimizer(epoch_length=max(len(loader), 1), **config)
    sample_batch = next(iter(loader))
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), sample_batch, optimizer,
        svr=svr,
    )
    state, epoch, _ = restore_checkpoint(
        args.experiment_path, args.modelname, state,
        restore_optimizer=False,
    )
    print(f"Model loaded (epoch {epoch}).")

    rng = jax.random.PRNGKey(args.seed + 1)

    if args.mode == "interpolation":
        # the eval mode the reference intended but shipped commented out
        # (evaluating.py:268-382): posterior-mean codes of shuffled shape
        # pairs, linear latent interpolation, labeled mixture decode of
        # every interpolant, h5 dump
        from go_with_the_flows_tpu.eval.interpolate import interpolate

        if args.interpolation_steps < 2:
            raise SystemExit("--interpolation_steps must be >= 2 "
                             "(the endpoints themselves)")
        # multi-host: each process's loader holds a different shard —
        # only process 0 writes (its shard), matching evaluate()'s
        # h5-dump gating
        out_path = None
        if jax.process_index() == 0:
            out_path = os.path.join(
                args.experiment_path, f"interpolations_{args.part}.h5"
            )
        c1, _, interps, labels = interpolate(
            loader, model, state, rng,
            n_steps=args.interpolation_steps,
            n_batches=args.interpolation_batches,
            out_path=out_path,
        )
        print(f"Interpolated {c1.shape[0]} shape pairs x "
              f"{interps.shape[-1]} steps "
              f"(labels 1..{int(labels.max())}).")
        if out_path is not None:
            print(f"Saved interpolations to {out_path}.")
        return

    mode = args.mode if args.mode != "reconstruction" or svr else "autoencoding"
    sample_step = make_sample_step(
        model, n_sampled_points=args.sampled_cloud_size,
        mode=mode, svr=svr,
    )

    from go_with_the_flows_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    state = replicate(mesh, state)
    with jax.set_mesh(mesh):
        if args.mode in ("autoencoding", "reconstruction"):
            evaluate(loader, sample_step, state, rng, svr=svr, mesh=mesh,
                     **config)
        elif args.mode == "generating":
            results = []
            # ref-vs-ref pairwise matrices are identical across reps —
            # computed on rep 0, reused afterwards (checksum-guarded;
            # see metrics.evaluation.compute_all_metrics)
            ref_cache = {}
            for rep in range(args.reps):
                res = evaluate(
                    loader, sample_step, state,
                    jax.random.fold_in(rng, rep), svr=svr, mesh=mesh,
                    ref_cache=ref_cache, **config,
                )
                results.append(res)
            agg = {}
            for key in results[0]:
                vals = np.array([r[key] for r in results])
                agg[key] = f"{vals.mean():.2f} ± {vals.std():.2f}"
            print("==== mean ± std over", args.reps, "reps ====")
            for k, v in agg.items():
                print(f"{k}: {v}")
        else:
            raise ValueError(f"Unknown mode {args.mode}")


if __name__ == "__main__":
    main()
