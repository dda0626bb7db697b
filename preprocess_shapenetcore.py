#!/usr/bin/env python
"""Offline preprocessing: ShapeNetCore.v2 OBJ files -> one packed-mesh
HDF5 (counterpart of reference preprocess_ShapeNetCore.py).

Reads the official all.csv split, maps the 55 synsets to labels 0..54
(sorted synset order, reference :140-143), parses + cleans every
model_normalized.obj in a multiprocessing pool, and packs ragged
vertices/faces with `*_bounds` prefix-sum indices plus orig/bbox scale
metadata per part (train/val/test).

Usage: preprocess_shapenetcore.py data_dir save_dir n_processes batch_size
"""

import argparse
import multiprocessing
import os

import numpy as np


def define_options_parser():
    p = argparse.ArgumentParser(
        description="ShapeNetCore preprocessor: OBJ -> packed .h5."
    )
    p.add_argument("data_dir", type=str,
                   help="Unpacked dataset dir (with all.csv + shapes/).")
    p.add_argument("save_dir", type=str, help="Output dir.")
    p.add_argument("n_processes", type=int, help="Parallel workers.")
    p.add_argument("batch_size", type=int, help="Shapes per batch.")
    return p


def process_obj_file(path):
    from go_with_the_flows_tpu.data.objmesh import ObjMesh

    mesh = ObjMesh(path)
    mesh.cleanup()
    return mesh.reformat()


def collect_samples(data_dir, split, part, cat2label):
    """Filenames + labels for a part, skipping missing shapes
    (reference :38-53)."""
    rows = split[split["split"] == part]
    samples, labels = [], []
    for synset, model in zip(rows["synsetId"].values, rows["modelId"].values):
        name = "0{}/{}/models/".format(str(synset), str(model))
        obj = os.path.join(data_dir, "shapes", name, "model_normalized.obj")
        if os.path.exists(obj):
            samples.append(obj)
            labels.append(cat2label["0{}".format(str(synset))])
        else:
            print(f"{name} missing, skipping this shape.")
    return samples, labels


def process(part, cat2label, split, fout, args):
    import h5py  # noqa: F401 (fout is an h5py File)

    samples, labels = collect_samples(
        args.data_dir, split, part, cat2label
    )
    n = len(samples)
    print(f"{part}: {n} shapes")

    vcb = fout.create_dataset(f"{part}_vertices_c_bounds", (n + 1,),
                              dtype=np.uint64)
    fb = fout.create_dataset(f"{part}_faces_bounds", (n + 1,),
                             dtype=np.uint64)
    vc = fout.create_dataset(f"{part}_vertices_c", (0, 3),
                             maxshape=(None, 3), dtype=np.float32)
    fvc = fout.create_dataset(f"{part}_faces_vc", (0, 3),
                              maxshape=(None, 3), dtype=np.uint32)
    orig_c = fout.create_dataset(f"{part}_orig_c", (n, 3), dtype=np.float32)
    orig_s = fout.create_dataset(f"{part}_orig_s", (n,), dtype=np.float32)
    bbox_c = fout.create_dataset(f"{part}_bbox_c", (n, 3), dtype=np.float32)
    bbox_s = fout.create_dataset(f"{part}_bbox_s", (n,), dtype=np.float32)
    fout.create_dataset(f"{part}_labels",
                        data=np.asarray(labels, np.uint8))

    vcb[0] = 0
    fb[0] = 0
    pool = multiprocessing.Pool(processes=args.n_processes)
    done = 0
    for start in range(0, n, args.batch_size):
        chunk = samples[start:start + args.batch_size]
        results = pool.map(process_obj_file, chunk)
        for data in results:
            i = done
            nv, nf = len(data["vertices_c"]), len(data["faces_vc"])
            vc.resize(vc.shape[0] + nv, axis=0)
            vc[-nv:] = data["vertices_c"]
            fvc.resize(fvc.shape[0] + nf, axis=0)
            fvc[-nf:] = data["faces_vc"]
            vcb[i + 1] = vcb[i] + nv
            fb[i + 1] = fb[i] + nf
            orig_c[i] = data["orig_c"]
            orig_s[i] = data["orig_s"]
            bbox_c[i] = data["bbox_c"]
            bbox_s[i] = data["bbox_s"]
            done += 1
        print(f"{part}: {done}/{n}")
    pool.close()
    pool.join()


def main():
    import h5py
    import pandas as pd

    args = define_options_parser().parse_args()
    split = pd.read_csv(os.path.join(args.data_dir, "all.csv"))
    cat2label = {
        "0{}".format(str(cat)): i
        for i, cat in enumerate(np.unique(split["synsetId"].values))
    }
    os.makedirs(args.save_dir, exist_ok=True)
    with h5py.File(
        os.path.join(args.save_dir, "ShapeNetCore55v2_meshes.h5"), "w"
    ) as fout:
        for part in ("train", "val", "test"):
            process(part, cat2label, split, fout, args)


if __name__ == "__main__":
    main()
