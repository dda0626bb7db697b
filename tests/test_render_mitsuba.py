"""Host-side tests for the Mitsuba scene generation (render_mitsuba.py).

The mitsuba binary itself is not available in CI; these cover everything
up to the subprocess boundary — bbox standardization, the colormap, the
scene XML (well-formed, one sphere per point, colors wired through), and
the EXR->PNG tonemap — mirroring reference render_mitsuba.py:96-134.
"""

import importlib.util
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

# load the repo-root script by path: the reference-parity tests put the
# reference checkout on sys.path, whose own render_mitsuba.py would
# shadow a plain `import render_mitsuba` in full-suite runs
_spec = importlib.util.spec_from_file_location(
    "gwtf_render_mitsuba",
    os.path.join(os.path.dirname(__file__), "..", "render_mitsuba.py"),
)
rm = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rm)


def test_standardize_bbox_fits_unit_cube():
    rng = np.random.RandomState(0)
    pcl = rng.randn(256, 3) * 7.0 + np.array([5.0, -3.0, 11.0])
    out = rm.standardize_bbox(pcl)
    assert out.min() >= -0.5 - 1e-6 and out.max() <= 0.5 + 1e-6
    # the longest axis must span the full unit interval
    spans = out.max(axis=0) - out.min(axis=0)
    assert np.isclose(spans.max(), 1.0)
    # centered per axis
    centers = (out.max(axis=0) + out.min(axis=0)) / 2.0
    assert np.allclose(centers, 0.0, atol=1e-6)


def test_colormap_unit_norm_and_clip():
    c = rm.colormap(0.3, 0.4, 0.5)
    assert np.isclose(np.linalg.norm(c), 1.0)
    # negative inputs clip to the 0.001 floor, never produce negatives
    c2 = rm.colormap(-1.0, 0.0, 2.0)
    assert min(c2) > 0.0 and max(c2) <= 1.0


def test_write_scene_xml_well_formed(tmp_path):
    rng = np.random.RandomState(1)
    n = 64
    pcl = rng.randn(n, 3).astype(np.float32)
    colors = np.tile([0.2, 0.4, 0.8], (n, 1))
    path = tmp_path / "scene.xml"
    rm.write_scene_xml(pcl, path, colors)

    root = ET.parse(path).getroot()
    assert root.tag == "scene"
    spheres = [s for s in root.iter("shape") if s.get("type") == "sphere"]
    assert len(spheres) == n
    # every sphere carries the supplied per-point color
    for s in spheres:
        rgb = s.find("bsdf").find("rgb")
        assert rgb.get("value") == "0.2,0.4,0.8"
    # scene floor + area emitter present (the two rectangles)
    rects = [s for s in root.iter("shape") if s.get("type") == "rectangle"]
    assert len(rects) == 2
    assert rects[1].find("emitter") is not None


def test_write_scene_xml_default_position_colormap(tmp_path):
    # colors=None derives per-point colors from standardized positions
    rng = np.random.RandomState(2)
    pcl = rng.randn(16, 3).astype(np.float32)
    path = tmp_path / "scene.xml"
    rm.write_scene_xml(pcl, path, colors=None)
    root = ET.parse(path).getroot()
    spheres = [s for s in root.iter("shape") if s.get("type") == "sphere"]
    vals = {s.find("bsdf").find("rgb").get("value") for s in spheres}
    assert len(vals) > 1  # position-dependent, not a constant color
    for v in vals:
        rgb = np.array([float(x) for x in v.split(",")])
        assert np.isclose(np.linalg.norm(rgb), 1.0, atol=1e-5)


def test_component_palette_matches_reference_arity():
    # 4-color mixture palette + GT color (reference render_mitsuba.py:133-134)
    assert len(rm.MAPS_COLOR) == 4
    assert len(rm.COLOR_GT) == 3
    lab = np.array([1, 2, 3, 4, 5]) - 1  # labels are 1-based
    cols = [rm.MAPS_COLOR[l % len(rm.MAPS_COLOR)] for l in lab]
    assert cols[0] == cols[4]  # wraps past K=4


def test_exr_to_png_tonemap():
    hdr = np.array([[0.0, 1.0, 4.0], [0.5, 0.25, -1.0]])
    ldr = rm.exr_to_png(hdr)
    assert ldr.min() >= 0.0 and ldr.max() <= 255.0
    assert np.isclose(ldr[0, 1], 255.0)  # 1.0 -> full scale
    assert np.isclose(ldr[0, 2], 255.0)  # clipped above 1
    assert np.isclose(ldr[1, 0], 255.0 * 0.5 ** (1 / 2.2))


@pytest.mark.parametrize("tall", [True, False])
def test_floor_shift_only_when_below_plane(tmp_path, tall):
    # clouds whose lowest (post-permute) z sits below -0.25 are lifted
    # onto the ground plane; others are left in place
    # (render_mitsuba.py:103-109). Input y becomes scene z after the
    # [2, 0, 1] permute; standardize_bbox scales by the WIDEST axis, so a
    # y-flat cloud with a wide x axis keeps its scene-z extent near 0 and
    # must NOT be shifted.
    pcl = np.zeros((4, 3), np.float32)
    pcl[:, 0] = np.linspace(0.0, 1.0, 4)  # wide axis (sets the scale)
    if tall:
        pcl[:, 1] = np.linspace(0.0, 1.0, 4)  # scene z spans [-0.5, 0.5]
    else:
        pcl[:, 1] = 0.5 + np.linspace(0.0, 0.1, 4)  # scene z ~ [-.05, .05]
    path = tmp_path / "s.xml"
    rm.write_scene_xml(pcl, path)
    root = ET.parse(path).getroot()
    zs = [
        float(s.find("transform").find("translate").get("z"))
        for s in root.iter("shape")
        if s.get("type") == "sphere"
    ]
    if tall:
        # h = -0.5 < -0.25: lifted so the lowest sphere sits at -0.6875
        assert np.isclose(min(zs), -0.6875)
    else:
        # h = -0.05 >= -0.25: left in place (no -0.6875 offset applied)
        assert np.isclose(min(zs), -0.05)
        assert min(zs) > -0.25
