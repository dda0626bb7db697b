"""Import a reference PyTorch checkpoint into an orbax checkpoint.

The reference saves ``{'epoch', 'iter', 'model_state', 'optimizer_state'}``
via ``torch.save(..., pickle_protocol=4)`` (reference
lib/networks/utils.py:25-27). This CLI converts ``model_state`` into the
flax variable trees of FlowMixtureModel / FlowMixtureSVRModel (both the
scanned default decoder layout and ``--unrolled``) and writes an orbax
checkpoint that ``evaluate_ae.py`` / ``train_ae.py --resume`` (without
``--resume_optimizer``) consume directly.

Usage:
  python tools/import_torch_ckpt.py <torch_ckpt.pkl> <config.yaml> \
      <out_dir> [--model_name model.ckpt] [--unrolled]

The optimizer state is NOT converted (fresh optax state) — the torch Adam
moments have no exact optax counterpart layout; the reference itself
supports resuming without optimizer state (train_ae.py:144-146).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def define_options_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt", help="reference .pkl checkpoint path")
    p.add_argument("config", help="experiment config.yaml")
    p.add_argument("out_dir", help="directory to write the orbax ckpt into")
    p.add_argument("--model_name", default="model.ckpt")
    p.add_argument("--unrolled", action="store_true",
                   help="keep the per-layer (unrolled) decoder param layout")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = define_options_parser().parse_args(argv)

    import torch
    import jax

    from go_with_the_flows_tpu.utils.config import (
        load_config, model_config_kwargs,
    )
    from go_with_the_flows_tpu.utils.torch_import import (
        mixture_variables_from_state_dict,
    )
    from go_with_the_flows_tpu.models.mixture import (
        FlowMixtureModel, FlowMixtureSVRModel,
    )
    from go_with_the_flows_tpu.optim import make_optimizer
    from go_with_the_flows_tpu.train.state import create_train_state
    from go_with_the_flows_tpu.train.checkpoints import save_checkpoint

    config = load_config(args.config)
    svr = config.get("train_mode") == "p_rnvp_mc_g_rnvp_vae_ic"

    # reference checkpoints are protocol-4 pickles (utils.py:27), which the
    # weights_only unpickler rejects; only feed trusted checkpoints here
    payload = torch.load(args.torch_ckpt, map_location="cpu",
                         weights_only=False)
    state_dict = payload["model_state"]
    # DDP checkpoints prefix every key with 'module.'
    state_dict = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }

    variables = mixture_variables_from_state_dict(
        state_dict, config, svr=svr, scan_couplings=not args.unrolled
    )

    kwargs = model_config_kwargs(config)
    kwargs["scan_couplings"] = not args.unrolled
    if svr:
        kwargs["g_prior_n_layers"] = config.get("g_prior_n_layers", 1)
        model = FlowMixtureSVRModel(**kwargs)
    else:
        model = FlowMixtureModel(**kwargs)

    # Template state (random init) so opt_state/step have the right
    # structure; params/batch_stats are then replaced by the imports.
    N = int(config.get("cloud_size", 2048))
    B = 2
    rng = np.random.RandomState(args.seed)
    batch = {
        "cloud": rng.randn(B, 3, N).astype(np.float32),
        "eval_cloud": rng.randn(B, 3, N).astype(np.float32),
    }
    if svr:
        batch["image"] = rng.rand(B, 224, 224, 4).astype(np.float32)
    optimizer = make_optimizer(
        epoch_length=max(int(config.get("epoch_length", 100)), 1),
        cycle_length=config.get("cycle_length", 1),
        min_lr=config.get("min_lr", 1e-4),
        max_lr=config.get("max_lr", 1e-3),
        beta1=config.get("beta1", 0.9),
        min_beta2=config.get("min_beta2", 0.99),
        max_beta2=config.get("max_beta2", 0.99),
        wd=config.get("wd", 0.0),
    )
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), batch, optimizer, svr=svr
    )

    # structural sanity: the imported trees must match the template
    def check(name, got, want):
        gs = jax.tree.structure(got)
        ws = jax.tree.structure(want)
        if gs != ws:
            raise SystemExit(
                f"imported {name} tree does not match the model:\n"
                f"  imported: {gs}\n  expected: {ws}"
            )

    check("params", variables["params"], jax.tree.map(np.asarray, state.params))
    check("batch_stats", variables["batch_stats"],
          jax.tree.map(np.asarray, state.batch_stats))

    def cast_checked(t, v):
        v = np.asarray(v, dtype=t.dtype)
        # exact-shape assert, NOT reshape: a reshape would silently
        # accept same-size wrong-shape leaves (e.g. an untransposed
        # square kernel) and produce a scrambled checkpoint
        assert v.shape == t.shape, (v.shape, t.shape)
        return v

    state = state.replace(
        params=jax.tree.map(
            cast_checked,
            jax.tree.map(np.asarray, state.params), variables["params"],
        ),
        batch_stats=jax.tree.map(
            cast_checked,
            jax.tree.map(np.asarray, state.batch_stats),
            variables["batch_stats"],
        ),
    )

    os.makedirs(args.out_dir, exist_ok=True)
    epoch = int(payload.get("epoch", 0))
    iteration = int(payload.get("iter", 0))
    save_checkpoint(args.out_dir, args.model_name, state, epoch, iteration)
    print(
        f"Imported {args.torch_ckpt} -> "
        f"{os.path.join(args.out_dir, args.model_name.replace('.pkl', '.ckpt'))} "
        f"(epoch {epoch}, iter {iteration}, "
        f"{'unrolled' if args.unrolled else 'scanned'} decoder layout, "
        f"{'SVR' if svr else 'AE/gen'} model)"
    )


if __name__ == "__main__":
    main()
