"""Offline preprocessing tests: OBJ parse/cleanup golden behavior,
preprocess CLI on a miniature ShapeNet layout, and split resampling."""

import os
import subprocess
import sys

import numpy as np
import pytest

from go_with_the_flows_tpu.data.objmesh import ObjMesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# A deliberately messy cube OBJ: comments, duplicate vertex (9 == 1),
# a degenerate face, a duplicate face, an extra empty group.
MESSY_OBJ = """# messy cube
g body
v -1 -1 -1
v -1 -1 1
v -1 1 -1
v -1 1 1
v 1 -1 -1
v 1 -1 1
v 1 1 -1
v 1 1 1
v -1 -1 -1
f 1 2 4
f 1 4 3
f 5 7 8
f 5 8 6
f 1 5 6
f 1 6 2
f 3 4 8
f 3 8 7
f 1 3 7
f 1 7 5
f 2 6 8
f 2 8 4
f 2 8 4
f 9 2 4
f 1 1 2
g empty_group
"""


@pytest.fixture
def messy_obj(tmp_path):
    p = tmp_path / "messy.obj"
    p.write_text(MESSY_OBJ)
    return str(p)


class TestObjMesh:
    def test_cleanup_and_reformat(self, messy_obj):
        mesh = ObjMesh(messy_obj)
        assert len(mesh.vertices) == 9
        mesh.cleanup()
        data = mesh.reformat()
        # duplicate vertex merged away
        assert data["vertices_c"].shape == (8, 3)
        # 12 unique cube faces: dup face, dup-vertex face (9 2 4 == 1 2 4)
        # and the degenerate (1 1 2) all dropped
        assert data["faces_vc"].shape == (12, 3)
        # unit sphere scaling
        norms = np.linalg.norm(data["vertices_c"], axis=1)
        np.testing.assert_allclose(norms.max(), 1.0, rtol=1e-5)
        # cube centroid at origin -> orig_c ~ 0, orig_s = sqrt(3)
        np.testing.assert_allclose(data["orig_c"], 0.0, atol=1e-5)
        np.testing.assert_allclose(data["orig_s"], np.sqrt(3), rtol=1e-5)
        np.testing.assert_allclose(data["bbox_s"], 2.0 / np.sqrt(3),
                                   rtol=1e-5)

    def test_sampleable_after_cleanup(self, messy_obj):
        from go_with_the_flows_tpu.data.cloud_sampling import sample_cloud

        mesh = ObjMesh(messy_obj)
        mesh.cleanup()
        data = mesh.reformat()
        s = sample_cloud(data["vertices_c"], data["faces_vc"], 64,
                         rng=np.random.default_rng(0))
        assert s["cloud"].shape == (3, 64)
        assert np.isfinite(s["cloud"]).all()


def test_preprocess_and_resample_cli(tmp_path):
    """Miniature ShapeNet layout -> preprocess CLI -> resample CLI ->
    loadable by ShapeNetCoreDataset."""
    import pandas as pd
    import h5py

    data_dir = tmp_path / "sn"
    rows = []
    for synset, models in [("2691156", ["m0", "m1"]),
                           ("2958343", ["m2"])]:
        for part, model in zip(["train", "train", "val"], models + [""]):
            pass
    # 2 synsets x 2 models each; splits: train/val/test coverage
    specs = [
        ("2691156", "a0", "train"), ("2691156", "a1", "val"),
        ("2691156", "a2", "test"), ("2958343", "b0", "train"),
        ("2958343", "b1", "train"), ("2958343", "b2", "test"),
    ]
    for synset, model, part in specs:
        d = data_dir / "shapes" / f"0{synset}" / model / "models"
        d.mkdir(parents=True)
        (d / "model_normalized.obj").write_text(MESSY_OBJ)
        rows.append({"synsetId": synset, "modelId": model, "split": part})
    pd.DataFrame(rows).to_csv(data_dir / "all.csv", index=False)

    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out_dir = tmp_path / "out"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocess_shapenetcore.py"),
         str(data_dir), str(out_dir), "1", "4"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    h5_path = out_dir / "ShapeNetCore55v2_meshes.h5"
    with h5py.File(h5_path, "r") as f:
        assert f["train_labels"].shape == (3,)
        assert f["train_vertices_c_bounds"].shape == (4,)
        assert f["train_vertices_c"].shape[0] == 3 * 8

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "resample_shapenetcore.py"),
         str(h5_path)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr
    resampled = str(h5_path)[:-3] + "_resampled.h5"

    from go_with_the_flows_tpu.data.datasets import ShapeNetCoreDataset

    ds = ShapeNetCoreDataset(
        os.path.dirname(resampled), part="train",
        meshes_fname=os.path.basename(resampled), cloud_size=16,
        return_eval_cloud=True,
    )
    assert len(ds) == 3
    s = ds[0]
    assert s["cloud"].shape == (3, 16)
    assert np.isfinite(s["cloud"]).all()
    ds.close()
