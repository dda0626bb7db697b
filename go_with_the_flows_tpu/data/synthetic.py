"""Synthetic ShapeNet-format HDF5 writers — golden fixtures for tests and
end-to-end smoke training (the reference has no equivalent; SURVEY.md §4
prescribes golden tests on tiny synthetic meshes)."""

from __future__ import annotations

import numpy as np


def _unit_cube_mesh(rng, scale=0.5, jitter=0.05):
    """A jittered cube: 8 vertices, 12 triangles."""
    v = np.array(
        [
            [x, y, z]
            for x in (-1, 1)
            for y in (-1, 1)
            for z in (-1, 1)
        ],
        np.float32,
    ) * scale
    v = v + rng.normal(scale=jitter, size=v.shape).astype(np.float32)
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2],  # x-
            [4, 6, 7], [4, 7, 5],  # x+
            [0, 4, 5], [0, 5, 1],  # y-
            [2, 3, 7], [2, 7, 6],  # y+
            [0, 2, 6], [0, 6, 4],  # z-
            [1, 5, 7], [1, 7, 3],  # z+
        ],
        np.uint32,
    )
    return v, f


def write_synthetic_meshes_h5(
    path: str,
    n_shapes: int = 8,
    parts=("train", "val", "test"),
    n_categories: int = 55,
    labels=None,
    seed: int = 0,
):
    """Write a packed-mesh HDF5 in the reference's ragged layout
    (preprocess_ShapeNetCore.py:81-133): per part, `<part>_vertices_c` /
    `<part>_faces_vc` concatenated with `*_bounds` prefix sums, plus
    labels and orig/bbox scale metadata."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for part in parts:
            verts, faces = [], []
            v_bounds, f_bounds = [0], [0]
            for _ in range(n_shapes):
                v, fc = _unit_cube_mesh(rng)
                verts.append(v)
                faces.append(fc)
                v_bounds.append(v_bounds[-1] + len(v))
                f_bounds.append(f_bounds[-1] + len(fc))
            f.create_dataset(
                part + "_vertices_c", data=np.concatenate(verts)
            )
            f.create_dataset(
                part + "_faces_vc", data=np.concatenate(faces)
            )
            f.create_dataset(
                part + "_vertices_c_bounds",
                data=np.asarray(v_bounds, np.uint64),
            )
            f.create_dataset(
                part + "_faces_bounds", data=np.asarray(f_bounds, np.uint64)
            )
            if labels is None:
                part_labels = rng.integers(
                    0, n_categories, size=n_shapes
                ).astype(np.uint8)
            else:
                part_labels = np.asarray(labels, np.uint8)
            f.create_dataset(part + "_labels", data=part_labels)
            f.create_dataset(
                part + "_orig_c",
                data=rng.normal(size=(n_shapes, 3)).astype(np.float32) * 0.01,
            )
            f.create_dataset(  # (n,) matching the preprocess CLIs
                part + "_orig_s", data=np.ones((n_shapes,), np.float32)
            )
            f.create_dataset(
                part + "_bbox_c",
                data=np.zeros((n_shapes, 3), np.float32),
            )
            f.create_dataset(
                part + "_bbox_s", data=np.ones((n_shapes,), np.float32)
            )
    return path


def write_synthetic_images_h5(
    path: str,
    n_shapes: int = 8,
    parts=("train", "test"),
    views: int = 24,
    hw: int = 137,
    seed: int = 0,
):
    """Write a renderings HDF5 in the reference layout
    (preprocess_ShapeNetAll.py:65-78): `<part>_images` of shape
    (views * n_shapes, 4, H, W) uint8 RGBA."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for part in parts:
            imgs = rng.integers(
                0, 256, size=(views * n_shapes, 4, hw, hw)
            ).astype(np.uint8)
            f.create_dataset(part + "_images", data=imgs)
    return path
