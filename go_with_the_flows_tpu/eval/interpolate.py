"""Latent interpolation + unconditional sampling utilities.

Working implementations of the utilities the reference ships commented
out (evaluating.py:268-458): encode two batches to posterior means,
linearly interpolate the shape codes over `n_steps`, decode every
interpolant with mixture labels, and dump an h5 in the reference's
intended layout (clouds1, clouds2, interpolations, labels).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def encode_codes(model, state, g_clouds, mode: str = "autoencoding"):
    """Posterior-mean shape codes for a batch (B, 3, N) -> (B, G)."""
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        g_clouds, mode, False,
        method=type(model).encode,
    )
    return out["g_sample"]


def decode_codes(model, state, codes, n_points: int, rng):
    """Decode shape codes -> labeled clouds ((B,3,N), (B,N) labels)."""
    samples, labels, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        codes, n_points, False,
        method=type(model).decode_sampling,
        rngs={"sample": rng},
    )
    return samples, labels


def interpolate(
    loader,
    model,
    state,
    rng: jax.Array,
    n_steps: int = 9,
    n_batches: int = 3,
    out_path: Optional[str] = None,
):
    """Latent interpolation between shapes of a loader
    (reference evaluating.py:269-360, de-commented and jit-friendly).

    Pairs each cloud with a shuffled partner, interpolates the posterior
    means over `n_steps`, decodes every interpolant. Returns
    (clouds1, clouds2, interpolations (B,3,N,S), labels (B,N,S)) and
    optionally writes the h5 dump.
    """
    all_c1, all_c2, all_interp, all_labels = [], [], [], []
    host_rng = np.random.default_rng(0)
    for i, batch in enumerate(loader):
        if i == n_batches:
            break
        clouds = jnp.asarray(batch["cloud"])
        ref_clouds = np.asarray(batch["eval_cloud"])
        inds = host_rng.permutation(ref_clouds.shape[0])
        ref_clouds = jnp.asarray(ref_clouds[inds])
        n_points = clouds.shape[2]

        codes1 = encode_codes(model, state, clouds)
        codes2 = encode_codes(model, state, ref_clouds)

        interp_steps, label_steps = [], []
        for s in range(n_steps):
            t = s / (n_steps - 1)
            codes = (1.0 - t) * codes1 + t * codes2
            samples, labels = decode_codes(
                model, state, codes, n_points,
                jax.random.fold_in(rng, i * n_steps + s),
            )
            interp_steps.append(np.asarray(samples))
            label_steps.append(np.asarray(labels))

        all_c1.append(np.asarray(clouds))
        all_c2.append(np.asarray(ref_clouds))
        all_interp.append(np.stack(interp_steps, axis=-1))
        all_labels.append(np.stack(label_steps, axis=-1))

    clouds1 = np.concatenate(all_c1)
    clouds2 = np.concatenate(all_c2)
    interpolations = np.concatenate(all_interp)
    labels = np.concatenate(all_labels)

    if out_path is not None:
        import h5py

        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with h5py.File(out_path, "w") as f:
            f.create_dataset("clouds1", data=clouds1)
            f.create_dataset("clouds2", data=clouds2)
            f.create_dataset("interpolations", data=interpolations)
            f.create_dataset("labels", data=labels.astype(np.uint8))
    return clouds1, clouds2, interpolations, labels


def sample_unconditional(
    model,
    state,
    rng: jax.Array,
    n_clouds: int,
    n_points: int,
    batch_size: int = 16,
):
    """Unconditional generation (the reference's commented `sample`
    utility): draw from the learned base prior, push through the prior
    flow, decode labeled clouds. Returns ((S,3,N), (S,N) labels)."""
    samples_all, labels_all = [], []
    dummy = jnp.zeros((batch_size, 3, 8), jnp.float32)
    for s in range(0, n_clouds, batch_size):
        key = jax.random.fold_in(rng, s)
        _, samples, labels, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            dummy, mode="generating", n_sampled_points=n_points,
            rngs={"sample": key},
        )
        samples_all.append(np.asarray(samples))
        labels_all.append(np.asarray(labels))
    return (
        np.concatenate(samples_all)[:n_clouds],
        np.concatenate(labels_all)[:n_clouds],
    )
