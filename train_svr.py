#!/usr/bin/env python
"""Training CLI for single-view reconstruction (counterpart of the
reference train_svr.py): ShapeNetAll13 clouds + renderings,
FlowMixtureSVRModel, train-only loop (the reference has no SVR val loop,
train_svr.py:151-154)."""

import argparse
import os


def define_options_parser():
    parser = argparse.ArgumentParser(
        description="SVR model training script. Provide a suitable config."
    )
    parser.add_argument("config", type=str)
    parser.add_argument("modelname", type=str)
    parser.add_argument("n_epochs", type=int)
    parser.add_argument("lr", type=float)
    parser.add_argument("--weights_type", type=str,
                        default="global_weights")
    parser.add_argument("--warmup_epoch", type=int, default=5)
    parser.add_argument("--jobid", type=str, default="1")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume_optimizer", action="store_true")
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("-n", "--nodes", default=1, type=int)
    parser.add_argument("-g", "--gpus", default=0, type=int)
    parser.add_argument("-nr", "--nr", default=0, type=int)
    parser.add_argument("--coordinator", type=str, default="127.0.0.1:9731")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of a few early "
                             "training steps into DIR.")
    parser.add_argument("--profile_steps", type=int, default=3)
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
    print(f"jax backend: {jax.default_backend()} "
          f"({jax.device_count()} device(s))", flush=True)

    from go_with_the_flows_tpu.utils.config import (
        load_config, resolve_config, model_config_kwargs, count_params,
    )
    from go_with_the_flows_tpu.parallel.mesh import make_mesh
    from go_with_the_flows_tpu.data.datasets import ShapeNetAllDataset
    from go_with_the_flows_tpu.data.cloud_transforms import (
        ComposeCloudTransformation,
    )
    from go_with_the_flows_tpu.data.image_transforms import (
        ComposeImageTransformation,
    )
    from go_with_the_flows_tpu.data.loader import DataLoader
    from go_with_the_flows_tpu.models.mixture import FlowMixtureSVRModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import (
        make_train_step, make_sample_step,
    )
    from go_with_the_flows_tpu.train import loops
    from go_with_the_flows_tpu.train.checkpoints import (
        restore_checkpoint, checkpoint_exists,
    )

    config = resolve_config(
        load_config(args.config), modelname=args.modelname,
        n_epochs=args.n_epochs, lr=args.lr,
        weights_type=args.weights_type, jobid=args.jobid,
        resume=args.resume, resume_optimizer=args.resume_optimizer,
        config_path=args.config,
        profile_dir=args.profile, profile_steps=args.profile_steps,
    )
    from go_with_the_flows_tpu.ops.precision import set_matmul_precision

    # training default 'fast' — same evidence base as train_ae.py (full
    # training -> end-metric A/B, RESULTS.md); 'high'/'highest' opt into
    # ~f32 / strict-fp32 matmul passes
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

    transform, _ = ComposeCloudTransformation(**config)
    image_transform = ComposeImageTransformation(**config)
    n_proc, rank = jax.process_count(), jax.process_index()
    local_bs = config["batch_size"] // n_proc
    train_dataset = ShapeNetAllDataset(
        path2data=config["path2data"],
        part="train",
        images_fname=config["images_fname"],
        meshes_fname=config["meshes_fname"],
        cloud_size=config["cloud_size"],
        return_eval_cloud=True,
        image_transform=image_transform,
        cloud_transform=transform,
        base_seed=args.seed,
    )
    train_loader = DataLoader(
        train_dataset, batch_size=local_bs,
        shuffle=config.get("shuffle", True),
        num_workers=config.get("num_workers", 0),
        worker_type=config.get("worker_type", "thread"),
        num_replicas=n_proc, rank=rank, seed=args.seed,
    )
    print(f"Size of training data: {len(train_dataset)}")

    mesh = make_mesh()
    kwargs = model_config_kwargs(config)
    kwargs["g_prior_n_layers"] = config.get("g_prior_n_layers", 1)
    model = FlowMixtureSVRModel(**kwargs)
    optimizer = make_optimizer(epoch_length=len(train_loader), **config)
    rng = jax.random.PRNGKey(args.seed)

    sample_batch = next(iter(train_loader))
    state = create_train_state(model, rng, sample_batch, optimizer, svr=True)
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
        model, optimizer, svr=True,
        pnll_weight=config.get("pnll_weight", 1.0),
        gnll_weight=config.get("gnll_weight", 1.0),
        gent_weight=config.get("gent_weight", 1.0),
    )

    writer = None
    if config["logging"]:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(config["logging_path"], "log"))

    # periodic SVR reconstruction figures (reference training.py:269-291):
    # reconstruction-mode sampling conditioned on the image prior
    svr_sample_step = make_sample_step(
        model, n_sampled_points=config["cloud_size"],
        mode="reconstruction", svr=True,
    )

    def svr_recon_fn(st):
        return loops.reconstruct(
            train_loader, svr_sample_step, st,
            jax.random.fold_in(rng, 888), max_batches=1, svr=True,
            mesh=mesh, return_images=True,
        )

    with jax.set_mesh(mesh):
        for epoch in range(cur_epoch, config["n_epochs"]):
            warmup = epoch < args.warmup_epoch
            state = loops.train(
                train_loader, train_step, state, epoch, cur_iter, warmup,
                jax.random.fold_in(rng, epoch), writer=writer, svr=True,
                mesh=mesh, per_step_tb=True, svr_recon_fn=svr_recon_fn,
                **config,
            )
            cur_iter = 0

    if writer is not None:
        writer.close()
    train_loader.close()


if __name__ == "__main__":
    main()
