"""HDF5-backed ShapeNet datasets (host side, torch-free).

Behavior port of `lib/datasets/datasets.py`:

  * ShapeNetCoreDataset (datasets.py:11-106): packed-mesh HDF5 with ragged
    vertices/faces addressed via `*_bounds` prefix-sum indices; per-item
    on-the-fly surface sampling of `cloud` (+ `eval_cloud`); optional
    orig/bbox scale metadata; `chosen_label` category filter; lazily opened
    SWMR handle per worker process.
  * ShapeNetAllDataset (datasets.py:109-222): adds the renderings HDF5 —
    24 images per shape, len = 24 * n_shapes, sh_i = i // 24, im_i = i.

RNG: the reference reseeds global numpy from the wall clock per item
(datasets.py:70). Here each item gets a Generator seeded from (base_seed,
epoch, index) for reproducible-but-fresh sampling; pass `reseed_like_ref=
True` to reproduce the wall-clock behavior.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .cloud_sampling import sample_cloud


def _h5():
    import h5py

    return h5py


class ShapeNetCoreDataset:
    N_CATEGORIES = 55

    def __init__(
        self,
        path2data: str,
        part: str = "train",
        meshes_fname: str = "meshes.h5",
        cloud_size: int = 2 ** 10,
        return_eval_cloud: bool = False,
        return_original_scale: bool = False,
        return_bbox_scale: bool = False,
        cloud_transform=None,
        sample_labels: bool = False,
        chosen_label: Optional[int] = None,
        base_seed: int = 0,
        reseed_like_ref: bool = False,
    ):
        self.path2data = path2data
        self.meshes_fname = meshes_fname
        self.cloud_size = cloud_size
        self.return_eval_cloud = return_eval_cloud
        self.return_original_scale = return_original_scale
        self.return_bbox_scale = return_bbox_scale
        self.cloud_transform = cloud_transform
        self.sample_labels = sample_labels
        self.chosen_label = chosen_label
        self.base_seed = base_seed
        self.reseed_like_ref = reseed_like_ref
        self.epoch = 0

        self.data_file = None
        self.choose_part(part)

    def _path(self):
        return os.path.join(self.path2data, self.meshes_fname)

    def choose_part(self, part: str):
        self.part = part
        h5 = _h5()
        with h5.File(self._path(), "r", libver="latest", swmr=True) as fin:
            if self.sample_labels:
                raw = np.asarray(fin[part + "_labels"])
                self.labels = np.zeros(
                    (raw.shape[0], self.N_CATEGORIES), np.float32
                )
                self.labels[np.arange(raw.shape[0]), raw] = 1.0
            self.vertices_c_bounds = np.asarray(
                fin[part + "_vertices_c_bounds"], np.uint64
            )
            self.faces_bounds = np.asarray(
                fin[part + "_faces_bounds"], np.uint64
            )
            if self.return_original_scale:
                self.original_centers = np.asarray(
                    fin[part + "_orig_c"], np.float32
                )
                self.original_scales = np.asarray(
                    fin[part + "_orig_s"], np.float32
                )
            if self.return_bbox_scale:
                self.bbox_centers = np.asarray(
                    fin[part + "_bbox_c"], np.float32
                )
                self.bbox_scales = np.asarray(
                    fin[part + "_bbox_s"], np.float32
                )
            if self.chosen_label is not None:
                self.chosen_label_inds = (
                    np.asarray(fin[part + "_labels"], np.uint8)
                    == self.chosen_label
                ).nonzero()[0]

    def close(self):
        if self.data_file is not None:
            self.data_file.close()
            self.data_file = None

    def __getstate__(self):
        """Spawn-picklable (the loader's process-pool workers): open h5
        handles cannot cross a process boundary — drop them; each worker
        lazily reopens its own SWMR handle on first read."""
        state = self.__dict__.copy()
        for key in ("data_file", "images_file"):
            if key in state:
                state[key] = None
        return state

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        if self.chosen_label is not None:
            return self.chosen_label_inds.shape[0]
        return self.vertices_c_bounds.shape[0] - 1

    def _rng(self, i):
        if self.reseed_like_ref:
            from datetime import datetime

            now = datetime.now()
            return np.random.default_rng(now.second + now.microsecond)
        return np.random.default_rng(
            (self.base_seed, self.epoch, i)
        )

    def _read_mesh(self, i):
        if self.data_file is None:
            h5 = _h5()
            self.data_file = h5.File(
                self._path(), "r", libver="latest", swmr=True
            )
        f = self.data_file
        vertices = np.asarray(
            f[self.part + "_vertices_c"][
                self.vertices_c_bounds[i]:self.vertices_c_bounds[i + 1]
            ],
            np.float32,
        )
        faces = np.asarray(
            f[self.part + "_faces_vc"][
                self.faces_bounds[i]:self.faces_bounds[i + 1]
            ],
            np.uint32,
        )
        return vertices, faces

    def __getitem__(self, i):
        rng = self._rng(i)
        if self.chosen_label is not None:
            i = self.chosen_label_inds[i]
        vertices, faces = self._read_mesh(i)
        sample = sample_cloud(
            vertices, faces, size=self.cloud_size,
            return_eval_cloud=self.return_eval_cloud, rng=rng,
        )
        return self._finalize(sample, i)

    def _finalize(self, sample, i):
        if self.return_original_scale:
            sample["orig_c"] = self.original_centers[i]
            sample["orig_s"] = self.original_scales[i]
        if self.return_bbox_scale:
            sample["bbox_c"] = self.bbox_centers[i]
            sample["bbox_s"] = self.bbox_scales[i]
        if self.cloud_transform is not None:
            sample = self.cloud_transform(sample)
        if self.sample_labels:
            sample["label"] = self.labels[i]
        return sample

    def get_batch(self, indices):
        """Batched fast path: one multithreaded native sampling call for
        the whole batch (csrc/sampler.cpp), then per-sample metadata +
        transforms. Returns a list of sample dicts; None if the native
        sampler is unavailable (the loader falls back to __getitem__)."""
        from . import native

        if not native.native_available():
            return None
        if self.chosen_label is not None:
            indices = [int(self.chosen_label_inds[i]) for i in indices]
        else:
            indices = [int(i) for i in indices]

        meshes = [self._read_mesh(i) for i in indices]
        verts = np.concatenate([v for v, _ in meshes])
        faces = np.concatenate([f for _, f in meshes])
        v_bounds = np.cumsum(
            [0] + [len(v) for v, _ in meshes]
        ).astype(np.int64)
        f_bounds = np.cumsum(
            [0] + [len(f) for _, f in meshes]
        ).astype(np.int64)
        n = 2 * self.cloud_size if self.return_eval_cloud else self.cloud_size
        seed = int(self._rng(indices[0]).integers(0, 2 ** 62))
        pts = native.sample_batch_native(
            verts, v_bounds, faces, f_bounds, n_samples=n, seed=seed
        )  # (B, 3, n)

        samples = []
        for b, i in enumerate(indices):
            if self.return_eval_cloud:
                sample = {
                    "cloud": np.ascontiguousarray(pts[b, :, ::2]),
                    "eval_cloud": np.ascontiguousarray(pts[b, :, 1::2]),
                }
            else:
                sample = {"cloud": pts[b]}
            samples.append(self._finalize(sample, i))
        return samples


class ShapeNetAllDataset(ShapeNetCoreDataset):
    """ShapeNetAll13 (3D-R2N2 renderings): each shape has 24 rendered
    views; dataset length is 24 * n_shapes (datasets.py:167-181)."""

    VIEWS = 24

    def __init__(
        self,
        path2data: str,
        part: str = "train",
        images_fname: str = "images.h5",
        image_transform=None,
        **kwargs,
    ):
        self.images_fname = images_fname
        self.image_transform = image_transform
        self.images_file = None
        super().__init__(path2data, part=part, **kwargs)

    def close(self):
        super().close()
        if self.images_file is not None:
            self.images_file.close()
            self.images_file = None

    def __len__(self):
        if self.chosen_label is not None:
            return self.VIEWS * self.chosen_label_inds.shape[0]
        return self.VIEWS * (self.vertices_c_bounds.shape[0] - 1)

    def get_batch(self, indices):
        """Batched native sampling for the SVR dataset: shapes are sampled
        in one native call, images loaded per view."""
        from . import native

        if not native.native_available():
            return None
        pairs = []  # (sh_i, im_i) in dataset-index space
        for i in indices:
            i = int(i)
            if self.chosen_label is not None:
                sh_i = int(self.chosen_label_inds[i // self.VIEWS])
                im_i = self.VIEWS * sh_i + (i % self.VIEWS)
            else:
                sh_i = i // self.VIEWS
                im_i = i
            pairs.append((sh_i, im_i))

        meshes = [self._read_mesh(sh) for sh, _ in pairs]
        verts = np.concatenate([v for v, _ in meshes])
        faces = np.concatenate([f for _, f in meshes])
        v_bounds = np.cumsum(
            [0] + [len(v) for v, _ in meshes]
        ).astype(np.int64)
        f_bounds = np.cumsum(
            [0] + [len(f) for _, f in meshes]
        ).astype(np.int64)
        n = 2 * self.cloud_size if self.return_eval_cloud else self.cloud_size
        seed = int(self._rng(pairs[0][1]).integers(0, 2 ** 62))
        pts = native.sample_batch_native(
            verts, v_bounds, faces, f_bounds, n_samples=n, seed=seed
        )

        if self.images_file is None:
            h5 = _h5()
            self.images_file = h5.File(
                os.path.join(self.path2data, self.images_fname),
                "r", libver="latest", swmr=True,
            )
        samples = []
        for b, (sh_i, im_i) in enumerate(pairs):
            if self.return_eval_cloud:
                sample = {
                    "cloud": np.ascontiguousarray(pts[b, :, ::2]),
                    "eval_cloud": np.ascontiguousarray(pts[b, :, 1::2]),
                }
            else:
                sample = {"cloud": pts[b]}
            image = np.asarray(self.images_file[self.part + "_images"][im_i])
            if self.image_transform is not None:
                image = self.image_transform(image)
            sample["image"] = image
            samples.append(self._finalize(sample, sh_i))
        return samples

    def __getitem__(self, i):
        rng = self._rng(i)
        if self.chosen_label is not None:
            sh_i = self.chosen_label_inds[i // self.VIEWS]
            im_i = self.VIEWS * sh_i + (i % self.VIEWS)
        else:
            sh_i = i // self.VIEWS
            im_i = i

        if self.images_file is None:
            h5 = _h5()
            self.images_file = h5.File(
                os.path.join(self.path2data, self.images_fname),
                "r", libver="latest", swmr=True,
            )
        vertices, faces = self._read_mesh(sh_i)
        sample = sample_cloud(
            vertices, faces, size=self.cloud_size,
            return_eval_cloud=self.return_eval_cloud, rng=rng,
        )
        sample["image"] = np.asarray(
            self.images_file[self.part + "_images"][im_i]
        )
        if self.return_original_scale:
            sample["orig_c"] = self.original_centers[sh_i]
            sample["orig_s"] = self.original_scales[sh_i]
        if self.return_bbox_scale:
            sample["bbox_c"] = self.bbox_centers[sh_i]
            sample["bbox_s"] = self.bbox_scales[sh_i]
        if self.image_transform is not None:
            sample["image"] = self.image_transform(sample["image"])
        if self.cloud_transform is not None:
            sample = self.cloud_transform(sample)
        if self.sample_labels:
            sample["label"] = self.labels[sh_i]
        return sample
