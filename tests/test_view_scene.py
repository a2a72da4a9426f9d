"""tools/view_scene.py contract test (headless).

No browser exists in CI, so this validates the data contract between the
scene exporter (`viz/debug_scene.py`), the PLY writer (`viz/cloud.py`)
and the inline-WebGL viewer: file layout, the PLY binary header
assumptions the JS parser makes, and the knot-JSON fields the HUD reads.
"""
import json
import os
import subprocess
import sys

import numpy as np

from ptudes_tpu.viz.cloud import save_ply

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _fake_scene(d):
    knots = [0, 4]
    for i in knots:
        p = np.random.default_rng(i).uniform(-5, 5, (50, 3))
        for name in ("source", "target", "cov_pos", "cov_att"):
            save_ply(os.path.join(d, f"knot_{i:04d}_{name}.ply"), p)
        save_ply(os.path.join(d, f"knot_{i:04d}_map.ply"), p)
        with open(os.path.join(d, f"knot_{i:04d}.json"), "w") as f:
            json.dump({"knot": i, "pred_pose": np.eye(4).tolist(),
                       "icp_pose": np.eye(4).tolist(),
                       "ekf_pose": np.eye(4).tolist(),
                       "sigma": 0.3, "iterations": 5, "num_corr": 42,
                       "cov_diag": [0.0] * 18, "scan_valid": True}, f)
    with open(os.path.join(d, "scene.json"), "w") as f:
        json.dump({"knots": knots, "stride": 4, "map_stride": 4,
                   "n_pos_samples": 10, "n_att_samples": 5,
                   "files": {}}, f)


def test_viewer_written_and_ply_contract(tmp_path):
    d = str(tmp_path)
    _fake_scene(d)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "view_scene.py"), d,
         "--no-serve"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    html = open(os.path.join(d, "viewer.html")).read()
    # the JS parser's assumptions about our PLY writer
    with open(os.path.join(d, "knot_0000_source.ply"), "rb") as f:
        hdr = f.read(200).decode("latin1")
    assert "format binary_little_endian 1.0" in hdr
    assert hdr.count("property float") == 3  # xyz only -> 12 B stride
    # HUD fields the viewer reads from knot json
    meta = json.load(open(os.path.join(d, "knot_0000.json")))
    for k in ("knot", "ekf_pose", "sigma", "iterations", "num_corr",
              "scan_valid"):
        assert k in meta
    # viewer fetches these names
    for s in ("scene.json", "knot_${id}.json", "loadPly", "webgl2"):
        assert s in html


def test_viewer_requires_scene_json(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "view_scene.py"),
         str(tmp_path), "--no-serve"], capture_output=True, text=True)
    assert r.returncode != 0
