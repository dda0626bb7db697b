#!/usr/bin/env python
"""Training CLI for generative modeling / autoencoding.

Drop-in counterpart of the reference's train_ae.py (same positional args
and flags, same YAML configs). TPU-native execution: one SPMD program over
a jax.sharding Mesh replaces the reference's mp.spawn + NCCL DDP + SyncBN
stack (train_ae.py:68-79,151-153,183-193); multi-host runs use
`jax.distributed.initialize` (--distributed with -n/-nr + --coordinator).
"""

import argparse
import os

import numpy as np


def define_options_parser():
    parser = argparse.ArgumentParser(
        description="Model training script. Provide a suitable config."
    )
    parser.add_argument("config", type=str, help="Path to YAML config.")
    parser.add_argument("modelname", type=str, help="Checkpoint name.")
    parser.add_argument("n_epochs", type=int, help="Total epochs.")
    parser.add_argument("lr", type=float, help="Learning rate value.")
    parser.add_argument("--cloud_random_rotate", action="store_true",
                        help="Random 3D rotation augmentation.")
    parser.add_argument("--weights_type", type=str,
                        default="global_weights",
                        help="global_weights | learned_weights.")
    parser.add_argument("--warmup_epoch", type=int, default=5,
                        help="Epochs using global weights.")
    parser.add_argument("--jobid", type=str, default="1")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_optimizer", action="store_true")
    parser.add_argument("--distributed", action="store_true",
                        help="Multi-host: initialize jax.distributed.")
    parser.add_argument("-n", "--nodes", default=1, type=int, metavar="N")
    parser.add_argument("-g", "--gpus", default=0, type=int,
                        help="Unused on TPU (devices are auto-discovered); "
                             "kept for CLI parity.")
    parser.add_argument("-nr", "--nr", default=0, type=int,
                        help="Rank of this host among the nodes.")
    parser.add_argument("--coordinator", type=str, default="127.0.0.1:9731",
                        help="Multi-host coordinator address.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of a few early "
                             "training steps into DIR (TensorBoard-viewable).")
    parser.add_argument("--profile_steps", type=int, default=3,
                        help="Number of steps to trace under --profile.")
    return parser


def main():
    args = define_options_parser().parse_args()

    import jax

    from go_with_the_flows_tpu.utils.compile_cache import (
        enable_compilation_cache,
        require_backend,
    )
    from go_with_the_flows_tpu.parallel.mesh import distributed_init

    enable_compilation_cache()
    # multi-host init MUST precede any backend-initializing call
    # (jax.distributed.initialize raises after jax.devices() & co.)
    if args.distributed and args.nodes > 1:
        distributed_init(args.coordinator, args.nodes, args.nr)
    require_backend()
    # visibility against the silent-CPU-fallback trap: a flapping TPU
    # runtime can fail init and jax quietly selects the CPU backend —
    # a flagship epoch then takes minutes of host compute instead of
    # sub-second device steps. One loud line makes it diagnosable.
    print(f"jax backend: {jax.default_backend()} "
          f"({jax.device_count()} device(s))", flush=True)

    from go_with_the_flows_tpu.utils.config import (
        load_config, resolve_config, model_config_kwargs, count_params,
    )
    from go_with_the_flows_tpu.parallel.mesh import make_mesh, shard_batch
    from go_with_the_flows_tpu.data.datasets import ShapeNetCoreDataset
    from go_with_the_flows_tpu.data.cloud_transforms import (
        ComposeCloudTransformation,
    )
    from go_with_the_flows_tpu.data.loader import DataLoader
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_train_step, make_eval_step, make_sample_step,
    )
    from go_with_the_flows_tpu.train import loops
    from go_with_the_flows_tpu.train.checkpoints import (
        restore_checkpoint, checkpoint_exists,
    )

    config = resolve_config(
        load_config(args.config),
        modelname=args.modelname,
        n_epochs=args.n_epochs,
        lr=args.lr,
        weights_type=args.weights_type,
        jobid=args.jobid,
        resume=args.resume,
        resume_optimizer=args.resume_optimizer,
        cloud_random_rotate=args.cloud_random_rotate or
        config_flag(args.config, "cloud_random_rotate"),
        config_path=args.config,
        profile_dir=args.profile,
        profile_steps=args.profile_steps,
    )
    from go_with_the_flows_tpu.ops.precision import set_matmul_precision

    # TRAINING default 'fast' (bf16 matmuls, fused Pallas train kernel;
    # 1,276 vs 873 clouds/s at 'high' on v5e): promoted by the FULL
    # 3000-step training -> end-metric A/B (tools/train_quality_ab.py,
    # RESULTS.md round-4 section) — per-variant MMD/COV/1-NNA/JSD under
    # CD and EMD are statistically indistinguishable from 'highest'
    # (every gap well inside the paired-rep std) and the loss curves
    # track to <=0.3% through convergence. `matmul_precision: high`
    # gives 3-pass ~f32 matmuls; `highest` is strict fp32-pass parity
    # with the torch reference.
    set_matmul_precision(config.get("matmul_precision", "fast"))
    config["logging"] = jax.process_index() == 0
    # checkpointing is process-uniform: save/restore are collectives in
    # multi-process runs (see train/checkpoints.py), so EVERY process
    # must reach them — unlike stdout/TB logging, which is rank-0 only
    config["checkpointing"] = True
    if config["logging"]:
        os.makedirs(config["logging_path"], exist_ok=True)
        import yaml

        with open(os.path.join(config["logging_path"], "config.yaml"),
                  "w") as f:
            yaml.safe_dump(config, f)

    # data --------------------------------------------------------------
    transform, transform_val = ComposeCloudTransformation(**config)
    n_proc, rank = jax.process_count(), jax.process_index()
    local_bs = config["batch_size"] // n_proc
    common = dict(
        path2data=config["path2data"],
        meshes_fname=config["meshes_fname"],
        cloud_size=config["cloud_size"],
        return_eval_cloud=True,
        return_original_scale=config.get("cloud_rescale2orig", False)
        or config.get("cloud_recenter2orig", False),
        chosen_label=config.get("chosen_label"),
        base_seed=args.seed,
    )
    train_dataset = ShapeNetCoreDataset(
        part="train", cloud_transform=transform, **common
    )
    val_dataset = ShapeNetCoreDataset(
        part="val", cloud_transform=transform_val, **common
    )
    train_loader = DataLoader(
        train_dataset, batch_size=local_bs,
        shuffle=config.get("shuffle", True),
        num_workers=config.get("num_workers", 0),
        worker_type=config.get("worker_type", "thread"),
        num_replicas=n_proc, rank=rank, seed=args.seed,
    )
    val_loader = DataLoader(
        val_dataset, batch_size=local_bs, shuffle=False,
        num_workers=config.get("num_workers", 0),
        worker_type=config.get("worker_type", "thread"),
        num_replicas=n_proc, rank=rank, seed=args.seed,
    )
    print(f"Size of training data: {len(train_dataset)}")
    print(f"Size of validation data: {len(val_dataset)}")

    # model / optimizer ---------------------------------------------------
    mesh = make_mesh()
    model = FlowMixtureModel(**model_config_kwargs(config))
    optimizer = make_optimizer(epoch_length=len(train_loader), **config)
    rng = jax.random.PRNGKey(args.seed)

    sample_batch = next(iter(train_loader))
    state = create_train_state(model, rng, sample_batch, optimizer)
    print("Total number of parameters:", count_params(state.params))

    cur_epoch, cur_iter = 0, 0
    if config["resume"] and checkpoint_exists(
        config["logging_path"], config["model_name"]
    ):
        state, cur_epoch, cur_iter = restore_checkpoint(
            config["logging_path"], config["model_name"], state,
            restore_optimizer=config["resume_optimizer"],
        )
        print(f"Resumed from epoch {cur_epoch} iter {cur_iter}.")
    from go_with_the_flows_tpu.parallel.mesh import replicate

    state = replicate(mesh, state)

    train_step = make_train_step(
        model, optimizer,
        pnll_weight=config.get("pnll_weight", 1.0),
        gnll_weight=config.get("gnll_weight", 1.0),
        gent_weight=config.get("gent_weight", 1.0),
    )
    eval_step = make_eval_step(
        model,
        pnll_weight=config.get("pnll_weight", 1.0),
        gnll_weight=config.get("gnll_weight", 1.0),
        gent_weight=config.get("gent_weight", 1.0),
    )
    ae_sample_step = make_sample_step(
        model, n_sampled_points=config["cloud_size"], mode="autoencoding"
    )

    writer = None
    if config["logging"]:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(config["logging_path"], "log"))

    def reconstruct_fn(st, max_batches=1):
        return loops.reconstruct(
            val_loader, ae_sample_step, st,
            jax.random.fold_in(rng, 999), max_batches=max_batches,
            mesh=mesh,
        )

    min_loss = 1e4
    with jax.set_mesh(mesh):
        for epoch in range(cur_epoch, config["n_epochs"]):
            warmup = epoch < args.warmup_epoch
            state = loops.train(
                train_loader, train_step, state, epoch, cur_iter, warmup,
                jax.random.fold_in(rng, epoch), writer=writer, mesh=mesh,
                **config,
            )
            min_loss = loops.evaluate_val(
                val_loader, eval_step, state, epoch, warmup, min_loss,
                jax.random.fold_in(rng, 10_000 + epoch), writer=writer,
                reconstruct_fn=reconstruct_fn, mesh=mesh, **config,
            )
            cur_iter = 0

    if writer is not None:
        writer.close()
    train_loader.close()
    val_loader.close()


def config_flag(path, key):
    import yaml

    with open(path) as f:
        return bool(yaml.safe_load(f).get(key, False))


if __name__ == "__main__":
    main()
