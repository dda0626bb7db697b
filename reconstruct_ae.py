#!/usr/bin/env python
"""Reconstruction dump CLI (counterpart of reference reconstruct_ae.py):
loads an experiment, reconstructs the val split in autoencoding mode, and
dumps all_samples/all_gts/all_labels .npy files. (The reference passes the
(train, val) transform tuple as one transform — reconstruct_ae.py:31, a
bug documented in SURVEY.md §7; here the val transform is used.)"""

import argparse
import os


def main():
    p = argparse.ArgumentParser(description="AE reconstruction dump.")
    p.add_argument("experiment_path", type=str)
    p.add_argument("modelname", type=str)
    p.add_argument("--part", type=str, default="val")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

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
    from go_with_the_flows_tpu.data.datasets import ShapeNetCoreDataset
    from go_with_the_flows_tpu.data.cloud_transforms import (
        ComposeCloudTransformation,
    )
    from go_with_the_flows_tpu.data.loader import DataLoader
    from go_with_the_flows_tpu.models.mixture import FlowMixtureModel
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.step import make_sample_step
    from go_with_the_flows_tpu.train.checkpoints import restore_checkpoint
    from go_with_the_flows_tpu.train.loops import predict

    config = load_config(os.path.join(args.experiment_path, "config.yaml"))
    from go_with_the_flows_tpu.ops.precision import set_matmul_precision

    # eval-path default 'high' (see evaluate_ae.py / ops/precision.py)
    set_matmul_precision(
        config.get("eval_matmul_precision",
                   config.get("matmul_precision", "high"))
    )
    _, transform_val = ComposeCloudTransformation(**config)
    dataset = ShapeNetCoreDataset(
        path2data=config["path2data"],
        part=args.part,
        meshes_fname=config["meshes_fname"],
        cloud_size=config["cloud_size"],
        return_eval_cloud=True,
        cloud_transform=transform_val,
        chosen_label=config.get("chosen_label"),
        base_seed=args.seed,
    )
    import jax

    loader = DataLoader(dataset, batch_size=args.batch_size,
                        shuffle=False, drop_last=False,
                        num_replicas=jax.process_count(),
                        rank=jax.process_index())

    model = FlowMixtureModel(**model_config_kwargs(config))
    optimizer = make_optimizer(epoch_length=max(len(loader), 1), **config)
    sample_batch = next(iter(loader))
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), sample_batch, optimizer
    )
    state, epoch, _ = restore_checkpoint(
        args.experiment_path, args.modelname, state, restore_optimizer=False
    )
    print(f"Model loaded (epoch {epoch}).")

    sample_step = make_sample_step(
        model, n_sampled_points=config["cloud_size"], mode="autoencoding"
    )
    from go_with_the_flows_tpu.parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    state = replicate(mesh, state)
    with jax.set_mesh(mesh):
        predict(
            loader, sample_step, state, jax.random.PRNGKey(args.seed + 1),
            out_dir=args.experiment_path, mesh=mesh,
        )
    print("Saved all_samples.npy / all_gts.npy / all_labels.npy to",
          args.experiment_path)


if __name__ == "__main__":
    main()
