#!/usr/bin/env python
"""Seeded per-category reshuffle of the train/val/test splits
(counterpart of reference resample_ShapeNetCore.py): for each of the 55
categories, pool all its shapes across parts, shuffle with numpy seed 1,
and redistribute preserving the original split sizes. Writes
`<input>_resampled.h5` with the same ragged layout.
"""

import argparse

import numpy as np


def define_options_parser():
    p = argparse.ArgumentParser(description="Resample ShapeNetCore splits.")
    p.add_argument("data_path", type=str, help="Packed meshes .h5 path.")
    return p


def _copy_shape(fin, fout, src_part, src_i, dst_part, dst_i, bounds_state):
    """Append shape src_i of src_part into dst_part of fout."""
    vb = np.asarray(fin[f"{src_part}_vertices_c_bounds"])
    fb = np.asarray(fin[f"{src_part}_faces_bounds"])
    verts = fin[f"{src_part}_vertices_c"][vb[src_i]:vb[src_i + 1]]
    faces = fin[f"{src_part}_faces_vc"][fb[src_i]:fb[src_i + 1]]

    vc = fout[f"{dst_part}_vertices_c"]
    fvc = fout[f"{dst_part}_faces_vc"]
    vc.resize(vc.shape[0] + len(verts), axis=0)
    vc[-len(verts):] = verts
    fvc.resize(fvc.shape[0] + len(faces), axis=0)
    fvc[-len(faces):] = faces

    fout[f"{dst_part}_vertices_c_bounds"][dst_i + 1] = (
        bounds_state[dst_part]["v"] + len(verts)
    )
    fout[f"{dst_part}_faces_bounds"][dst_i + 1] = (
        bounds_state[dst_part]["f"] + len(faces)
    )
    bounds_state[dst_part]["v"] += len(verts)
    bounds_state[dst_part]["f"] += len(faces)

    for key in ("orig_c", "orig_s", "bbox_c", "bbox_s", "labels"):
        src = f"{src_part}_{key}"
        if src in fin:
            fout[f"{dst_part}_{key}"][dst_i] = fin[src][src_i]


def main():
    import h5py

    args = define_options_parser().parse_args()
    np.random.seed(seed=1)

    fin = h5py.File(args.data_path, "r")
    parts = ("train", "val", "test")
    labels = {p: np.asarray(fin[f"{p}_labels"]) for p in parts}

    assignments = {p: [] for p in parts}  # (src_part, src_index)
    for c in range(55):
        pool = []
        sizes = {}
        for p in parts:
            inds = (labels[p] == c).nonzero()[0]
            sizes[p] = len(inds)
            pool += [(p, int(i)) for i in inds]
        order = np.arange(len(pool))
        np.random.shuffle(order)
        shuffled = [pool[j] for j in order]
        assignments["train"] += shuffled[: sizes["train"]]
        assignments["val"] += shuffled[
            sizes["train"]: sizes["train"] + sizes["val"]
        ]
        assignments["test"] += shuffled[sizes["train"] + sizes["val"]:]

    out_path = args.data_path[:-3] + "_resampled.h5"
    fout = h5py.File(out_path, "w")
    for key in fin.keys():
        if any(s in key for s in ("bounds", "labels", "orig", "bbox")):
            fout.create_dataset(key, shape=fin[key].shape,
                                dtype=fin[key].dtype)
        else:
            fout.create_dataset(
                key, shape=(0,) + fin[key].shape[1:],
                maxshape=(None,) + fin[key].shape[1:], dtype=fin[key].dtype,
            )

    bounds_state = {p: {"v": 0, "f": 0} for p in parts}
    for p in parts:
        fout[f"{p}_vertices_c_bounds"][0] = 0
        fout[f"{p}_faces_bounds"][0] = 0
        for dst_i, (src_part, src_i) in enumerate(assignments[p]):
            _copy_shape(fin, fout, src_part, src_i, p, dst_i, bounds_state)
        print(f"{p}: {len(assignments[p])} shapes")

    fin.close()
    fout.close()
    print("wrote", out_path)


if __name__ == "__main__":
    main()
