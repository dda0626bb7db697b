#!/usr/bin/env python
"""Photo-real rendering of evaluation h5 dumps via Mitsuba 2
(counterpart of reference render_mitsuba.py): per-point sphere XML scene
generation colored by mixture-component label, shelling out to the
mitsuba binary, and EXR -> PNG tonemapping.

Input h5 layout: the eval driver's dump (gt_clouds, sampled_clouds,
sampled_labels) — see go_with_the_flows_tpu/eval/evaluating.py.
"""

import argparse
import subprocess
from pathlib import Path

import numpy as np

XML_HEAD = """
<scene version="0.6.0">
    <integrator type="path">
        <integer name="maxDepth" value="-1"/>
    </integrator>
    <sensor type="perspective">
        <float name="farClip" value="100"/>
        <float name="nearClip" value="0.1"/>
        <transform name="toWorld">
            <lookat origin="3,3,3" target="0,0,0" up="0,0,1"/>
        </transform>
        <float name="fov" value="25"/>
        <sampler type="ldsampler">
            <integer name="sampleCount" value="256"/>
        </sampler>
        <film type="hdrfilm">
            <integer name="width" value="1600"/>
            <integer name="height" value="1200"/>
            <rfilter type="gaussian"/>
            <boolean name="banner" value="false"/>
        </film>
    </sensor>
    <bsdf type="roughplastic" id="surfaceMaterial">
        <string name="distribution" value="ggx"/>
        <float name="alpha" value="0.05"/>
        <float name="intIOR" value="1.46"/>
        <rgb name="diffuseReflectance" value="1,1,1"/>
    </bsdf>
"""

XML_BALL = """
    <shape type="sphere">
        <float name="radius" value="0.025"/>
        <transform name="toWorld">
            <translate x="{}" y="{}" z="{}"/>
        </transform>
        <bsdf type="diffuse">
            <rgb name="reflectance" value="{},{},{}"/>
        </bsdf>
    </shape>
"""

XML_TAIL = """
    <shape type="rectangle">
        <ref name="bsdf" id="surfaceMaterial"/>
        <transform name="toWorld">
            <scale x="10" y="10" z="1"/>
            <translate x="0" y="0" z="-0.5"/>
        </transform>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld">
            <scale x="10" y="10" z="1"/>
            <lookat origin="-4,4,20" target="0,0,0" up="0,0,1"/>
        </transform>
        <emitter type="area">
            <rgb name="radiance" value="6,6,6"/>
        </emitter>
    </shape>
</scene>
"""

# Mixture-component palette + GT color (reference render_mitsuba.py:133-134)
MAPS_COLOR = [[1, 0.8, 0], [0, 0.6, 0.2], [0.2, 0.4, 0.8], [0.8, 0.2, 0.6]]
COLOR_GT = [0.8, 0.2, 0.6]


def standardize_bbox(pcl):
    mins, maxs = pcl.min(axis=0), pcl.max(axis=0)
    center = (mins + maxs) / 2.0
    scale = (maxs - mins).max()
    return (pcl - center) / scale  # fits in [-0.5, 0.5]^3


def colormap(x, y, z):
    vec = np.clip(np.array([x, y, z]), 0.001, 1.0)
    return list(vec / np.sqrt((vec ** 2).sum()))


def write_scene_xml(pcl, path, colors=None):
    """Point cloud (N, 3) -> mitsuba sphere-cloud scene XML
    (reference render_mitsuba.py:96-117)."""
    segments = [XML_HEAD]
    pcl = standardize_bbox(pcl)
    pcl = pcl[:, [2, 0, 1]]
    pcl[:, 0] *= -1
    h = pcl[:, 2].min()
    for i in range(pcl.shape[0]):
        color = (
            colormap(pcl[i, 0] + 0.5, pcl[i, 1] + 0.5, pcl[i, 2] + 0.5)
            if colors is None else colors[i]
        )
        z = pcl[i, 2] - h - 0.6875 if h < -0.25 else pcl[i, 2]
        segments.append(XML_BALL.format(pcl[i, 0], pcl[i, 1], z, *color))
    segments.append(XML_TAIL)
    with open(path, "w") as f:
        f.write("".join(segments))


def exr_to_png(hdr):
    ldr = np.clip(hdr, 0, 1) ** (1 / 2.2)
    return 255.0 * ldr


def main():
    import cv2
    import h5py

    p = argparse.ArgumentParser()
    p.add_argument("--path_h5", type=str, required=True)
    p.add_argument("--path_png", type=str, required=True)
    p.add_argument("--name_png", type=str, required=True)
    p.add_argument("--path_mitsuba", type=str, required=True)
    p.add_argument("--indices", type=int, nargs="+", required=True)
    args = p.parse_args()

    out = Path(args.path_png)
    out.mkdir(exist_ok=True)

    with h5py.File(args.path_h5, "r") as f:
        gts = f["gt_clouds"][:].transpose(0, 2, 1)
        preds = f["sampled_clouds"][:].transpose(0, 2, 1)
        labels = f["sampled_labels"][:]

    for index in args.indices:
        colors_gt = np.tile(COLOR_GT, (gts[index].shape[0], 1))
        lab = labels[index] - 1
        colors_pred = np.asarray(
            [MAPS_COLOR[l % len(MAPS_COLOR)] for l in lab]
        )
        jobs = {
            args.name_png: (preds[index], colors_pred),
            "gt": (gts[index], colors_gt),
        }
        for key, (pcd, colors) in jobs.items():
            name = f"{index}_{key}"
            path_xml = out / f"{name}.xml"
            write_scene_xml(pcd, path_xml, colors)
            path_exr = out / f"{name}.exr"
            subprocess.call(
                [f"{args.path_mitsuba}/mitsuba", str(path_xml),
                 "-o", str(path_exr)],
                stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
            )
            path_xml.unlink()
            hdr = cv2.imread(str(path_exr), flags=cv2.IMREAD_UNCHANGED)
            if hdr is not None:
                cv2.imwrite(str(out / f"{name}.png"), exr_to_png(hdr))
            path_exr.unlink(missing_ok=True)
            print(f"rendered {name}")


if __name__ == "__main__":
    main()
