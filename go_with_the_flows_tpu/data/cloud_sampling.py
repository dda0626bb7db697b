"""Mesh-surface point sampling (host side).

Behavior-equivalent rewrite of the reference's
`lib/datasets/cloud_sampling.py:4-32`: area-weighted triangle choice +
uniform barycentric sampling with fold-over reflection; when
`return_eval_cloud` is set, 2N points are drawn and the even/odd strides
become `cloud` / `eval_cloud`. Output clouds are (3, N).

Differences: takes an explicit `rng` (numpy Generator) instead of global
numpy state (the reference reseeds np.random from the wall clock per item,
datasets.py:70 — we thread seeds for reproducibility), and the hot path
can be served by the native C++ sampler (ops/native) when built.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def sample_cloud(
    vertices: np.ndarray,
    faces: np.ndarray,
    size: int = 2 ** 10,
    return_eval_cloud: bool = False,
    rng: Optional[np.random.Generator] = None,
    use_native: Optional[bool] = None,
) -> Dict[str, np.ndarray]:
    if rng is None:
        rng = np.random.default_rng()
    n = 2 * size if return_eval_cloud else size

    if use_native is None:
        use_native = len(faces) > 64  # skip ctypes overhead on tiny meshes
    if use_native:
        from . import native

        if native.native_available():
            seed = int(rng.integers(0, 2 ** 62))
            pts = native.sample_cloud_native(vertices, faces, n, seed)
            if return_eval_cloud:
                return {
                    "cloud": np.ascontiguousarray(pts[:, ::2]),
                    "eval_cloud": np.ascontiguousarray(pts[:, 1::2]),
                }
            return {"cloud": pts}

    tri = vertices[faces]  # (F, 3, 3)
    cross = np.cross(tri[:, 2] - tri[:, 0], tri[:, 2] - tri[:, 1])
    areas = np.sqrt((cross ** 2).sum(1)) / 2.0
    total = areas.sum()
    if total <= 0:
        probs = np.full(len(areas), 1.0 / len(areas))
    else:
        probs = areas / total

    chosen = rng.choice(len(tri), size=n, p=probs)
    t = tri[chosen]  # (n, 3, 3)

    s1 = rng.random((n, 1), dtype=np.float32)
    s2 = rng.random((n, 1), dtype=np.float32)
    over = (s1 + s2) > 1.0
    s1[over] = 1.0 - s1[over]
    s2[over] = 1.0 - s2[over]

    pts = (
        t[:, 0] + s1 * (t[:, 1] - t[:, 0]) + s2 * (t[:, 2] - t[:, 0])
    ).astype(np.float32)

    if return_eval_cloud:
        return {"cloud": pts[::2].T, "eval_cloud": pts[1::2].copy().T}
    return {"cloud": pts.T}
