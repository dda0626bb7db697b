"""Flat-key YAML config system (reference configs/*.yaml + the CLI
override/write-back protocol of train_ae.py:46-66)."""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, Optional

import jax
import numpy as np
import yaml


def load_config(path: str) -> Dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def resolve_config(
    config: Dict,
    modelname: str,
    n_epochs: Optional[int] = None,
    lr: Optional[float] = None,
    weights_type: Optional[str] = None,
    jobid: str = "1",
    resume: bool = False,
    resume_optimizer: bool = False,
    cloud_random_rotate: Optional[bool] = None,
    config_path: Optional[str] = None,
    write_back: bool = True,
    **extra,
) -> Dict:
    """Apply the reference's CLI-over-YAML mutations (train_ae.py:47-66):
    jobid, generated logging_path (written back into the YAML), model_name,
    n_epochs, min_lr = max_lr = lr, resume flags, weights_type,
    cloud_random_rotate."""
    config = dict(config)
    config["jobid"] = jobid
    if "logging_path" not in config:
        ext = jobid if jobid != "" else datetime.now().strftime(
            "%Y%m%d_%H%M%S"
        )
        config["logging_path"] = os.path.join(
            config["path2save"], f"{modelname}_{ext}"
        )
        if write_back and config_path is not None:
            with open(config_path, "w") as f:
                yaml.safe_dump(config, f)
    config["model_name"] = f"{modelname}.ckpt"
    if n_epochs is not None:
        config["n_epochs"] = n_epochs
    if lr is not None:
        config["min_lr"] = config["max_lr"] = lr
    if weights_type is not None:
        config["weights_type"] = weights_type
    if cloud_random_rotate is not None:
        config["cloud_random_rotate"] = cloud_random_rotate
    config["resume"] = bool(resume)
    config["resume_optimizer"] = bool(resume_optimizer)
    # runtime-only extras (e.g. profile_dir) — never written back to YAML
    config.update(extra)
    return config


def model_config_kwargs(config: Dict) -> Dict:
    """Extract FlowMixtureModel constructor kwargs from a flat config."""
    keys = [
        "n_components", "params_reduce_mode", "weights_type",
        "g_latent_space_size", "g_prior_n_flows", "g_prior_n_features",
        "g_posterior_n_layers", "p_latent_space_size", "p_prior_n_layers",
        "p_decoder_n_flows", "p_decoder_n_features", "p_decoder_base_type",
        "p_decoder_base_var", "pc_enc_init_n_features", "pc_enc_n_features",
    ]
    out = {k: config[k] for k in keys if k in config}
    if "pc_enc_n_features" in out:
        out["pc_enc_n_features"] = tuple(out["pc_enc_n_features"])
    return out


def count_params(tree) -> int:
    return int(
        sum(np.prod(x.shape) for x in jax.tree.leaves(tree))
    )
