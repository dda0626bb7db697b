#!/usr/bin/env python
"""Offline preprocessing for SVR: ShapeNetAll13 (3D-R2N2) renderings +
ShapeNetCore.v1 meshes -> ShapeNetAll13_images.h5 / ShapeNetAll13_meshes.h5
(counterpart of reference preprocess_ShapeNetAll.py).

Per category (the 13 R2N2 synsets): 80/20 train/test by sorted model name
(reference :54-57); 24 rendering PNGs per shape packed as
(24*S, 4, 137, 137) uint8 (reference :65,71-78); meshes parsed/cleaned
like ShapeNetCore and packed in the same ragged layout.
"""

import argparse
import multiprocessing
import os
import shutil
from itertools import product

import numpy as np


def define_options_parser():
    p = argparse.ArgumentParser(description="ShapeNetAll13 preprocessor.")
    p.add_argument("sna_data_dir", type=str,
                   help="Dir with ShapeNetRendering/ (and ShapeNetMesh/).")
    p.add_argument("snc1_data_dir", type=str,
                   help="ShapeNetCore.v1 root (meshes are copied from it).")
    p.add_argument("save_dir", type=str)
    p.add_argument("n_processes", type=int)
    p.add_argument("batch_size", type=int)
    p.add_argument("--skip_copy", action="store_true",
                   help="Skip the ShapeNetCore.v1 -> ShapeNetMesh copy.")
    return p


def process_png_file(path):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)  # (H, W, 4) BGRA
    img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    return np.transpose(img, (2, 0, 1))[None].astype(np.uint8)


def process_obj_file(path):
    from go_with_the_flows_tpu.data.objmesh import ObjMesh

    mesh = ObjMesh(path)
    mesh.cleanup()
    return mesh.reformat()


def _part_samples(args, cats, part):
    samples, labels = [], []
    cat2label = {cat: i for i, cat in enumerate(cats)}
    for cat in cats:
        root = os.path.join(args.sna_data_dir, "ShapeNetMesh", cat)
        names = sorted(
            n for n in os.listdir(root)
            if os.path.isdir(os.path.join(root, n))
        )
        cut = int(0.8 * len(names))
        names = names[:cut] if part == "train" else names[cut:]
        samples += [(cat, n) for n in names]
        labels += len(names) * [cat2label[cat]]
    return samples, labels


def process_images(part, cats, fout, args):
    samples, labels = _part_samples(args, cats, part)
    n = len(samples)
    images = fout.create_dataset(
        f"{part}_images", shape=(24 * n, 4, 137, 137), dtype=np.uint8
    )
    fout.create_dataset(f"{part}_labels",
                        data=np.asarray(labels, np.uint8))
    pool = multiprocessing.Pool(args.n_processes)
    bs = max(args.batch_size // 24, 1)
    for start in range(0, n, bs):
        chunk = samples[start:start + bs]
        paths = [
            os.path.join(args.sna_data_dir, "ShapeNetRendering", cat, name,
                         "rendering", f"{v:02d}.png")
            for (cat, name), v in product(chunk, range(24))
        ]
        results = pool.map(process_png_file, paths)
        images[24 * start:24 * (start + len(chunk))] = np.concatenate(
            results, 0
        )
        print(f"Packing {part} images: [{start + len(chunk)}/{n}]")
    pool.close()
    pool.join()


def process_meshes(part, cats, fout, args):
    samples, labels = _part_samples(args, cats, part)
    paths = [
        os.path.join(args.sna_data_dir, "ShapeNetMesh", cat, name,
                     "model.obj")
        for cat, name in samples
    ]
    n = len(paths)
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

    pool = multiprocessing.Pool(args.n_processes)
    done = 0
    for start in range(0, n, args.batch_size):
        for data in pool.map(process_obj_file,
                             paths[start:start + args.batch_size]):
            i = done
            nv, nf = len(data["vertices_c"]), len(data["faces_vc"])
            vc.resize(vc.shape[0] + nv, axis=0)
            vc[-nv:] = data["vertices_c"]
            fvc.resize(fvc.shape[0] + nf, axis=0)
            fvc[-nf:] = data["faces_vc"]
            vcb[i + 1] = vcb[i] + nv
            fb[i + 1] = fb[i] + nf
            orig_c[i], orig_s[i] = data["orig_c"], data["orig_s"]
            bbox_c[i], bbox_s[i] = data["bbox_c"], data["bbox_s"]
            done += 1
        print(f"Packing {part} meshes: [{done}/{n}]")
    pool.close()
    pool.join()


def main():
    import h5py

    args = define_options_parser().parse_args()

    render_root = os.path.join(args.sna_data_dir, "ShapeNetRendering")
    cats_all = sorted(os.listdir(render_root))
    if not args.skip_copy:
        for cat in cats_all:
            for sample in sorted(os.listdir(os.path.join(render_root, cat))):
                dst = os.path.join(args.sna_data_dir, "ShapeNetMesh",
                                   cat, sample)
                if not os.path.exists(dst):
                    shutil.copytree(
                        os.path.join(args.snc1_data_dir, cat, sample), dst
                    )

    cats = sorted(os.listdir(os.path.join(args.sna_data_dir,
                                          "ShapeNetMesh")))
    os.makedirs(args.save_dir, exist_ok=True)
    with h5py.File(os.path.join(args.save_dir,
                                "ShapeNetAll13_images.h5"), "w") as f:
        process_images("train", cats, f, args)
        process_images("test", cats, f, args)
    with h5py.File(os.path.join(args.save_dir,
                                "ShapeNetAll13_meshes.h5"), "w") as f:
        process_meshes("train", cats, f, args)
        process_meshes("test", cats, f, args)


if __name__ == "__main__":
    main()
