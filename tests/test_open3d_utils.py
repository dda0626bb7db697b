"""Stub-based smoke test for viz/open3d_utils.py (VERDICT r4 weak #5).

open3d is not installed in the TPU image (the reference's
lib/visualization/utils_open3d.py has the same import gate and zero
tests); a minimal fake of the open3d API exercises the geometry
construction, label->palette mapping, transpose handling and the
off-screen capture call sequence without the real renderer.
"""

import sys
import types

import numpy as np

from go_with_the_flows_tpu.viz import open3d_utils as o3u


class _FakeVector3d:
    def __init__(self, arr):
        self.arr = np.asarray(arr)


class _FakePointCloud:
    def __init__(self):
        self.points = None
        self.colors = None


class _FakeVisualizer:
    def __init__(self):
        self.calls = []
        self.geometries = []

    def create_window(self, width=None, height=None, visible=True):
        self.calls.append(("create_window", width, height, visible))

    def add_geometry(self, g):
        self.geometries.append(g)
        self.calls.append(("add_geometry",))

    def poll_events(self):
        self.calls.append(("poll_events",))

    def update_renderer(self):
        self.calls.append(("update_renderer",))

    def capture_screen_image(self, path):
        self.calls.append(("capture", path))
        with open(path, "wb") as f:
            f.write(b"png")

    def destroy_window(self):
        self.calls.append(("destroy_window",))


def _install_fake_open3d(monkeypatch):
    fake = types.ModuleType("open3d")
    fake.geometry = types.SimpleNamespace(PointCloud=_FakePointCloud)
    fake.utility = types.SimpleNamespace(Vector3dVector=_FakeVector3d)
    vis_holder = {}

    def make_vis():
        vis_holder["vis"] = _FakeVisualizer()
        return vis_holder["vis"]

    fake.visualization = types.SimpleNamespace(Visualizer=make_vis)
    monkeypatch.setitem(sys.modules, "open3d", fake)
    return vis_holder


def test_have_open3d_reflects_importability(monkeypatch):
    _install_fake_open3d(monkeypatch)
    assert o3u.have_open3d()


def test_cloud_to_geometry_transpose_and_palette(monkeypatch):
    _install_fake_open3d(monkeypatch)
    pts_3n = np.arange(12, dtype=np.float64).reshape(3, 4)  # (3, N)
    labels = np.array([0, 1, 2, 7])  # 7 wraps modulo the palette
    pcd = o3u.cloud_to_geometry(pts_3n, labels)
    assert pcd.points.arr.shape == (4, 3)  # transposed to (N, 3)
    np.testing.assert_array_equal(pcd.points.arr, pts_3n.T)
    np.testing.assert_array_equal(pcd.colors.arr[0], o3u._PALETTE[0])
    np.testing.assert_array_equal(pcd.colors.arr[3],
                                  o3u._PALETTE[7 % len(o3u._PALETTE)])
    # (N, 3) input passes through untransposed, no labels -> no colors
    pcd2 = o3u.cloud_to_geometry(pts_3n.T)
    np.testing.assert_array_equal(pcd2.points.arr, pts_3n.T)
    assert pcd2.colors is None


def test_capture_cloud_image_call_sequence(monkeypatch, tmp_path):
    holder = _install_fake_open3d(monkeypatch)
    out = str(tmp_path / "cloud.png")
    got = o3u.capture_cloud_image(
        np.random.RandomState(0).randn(16, 3), out, width=320, height=240
    )
    assert got == out
    vis = holder["vis"]
    names = [c[0] for c in vis.calls]
    assert names == ["create_window", "add_geometry", "poll_events",
                     "update_renderer", "capture", "destroy_window"]
    assert vis.calls[0] == ("create_window", 320, 240, False)  # off-screen
    with open(out, "rb") as f:
        assert f.read() == b"png"
