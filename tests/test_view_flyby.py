"""tools/view_flyby.py contract test (headless).

Validates the data contract between the flyby exporter (``cli flyby``:
map PLY + camera-program JSON), the PLY writer and the inline-WebGL
player: keyframe fields, fixed fetch names, and argument validation.
"""
import json
import os
import subprocess
import sys

import numpy as np

from ptudes_tpu.viz.cloud import save_ply

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _fake_flyby(d):
    pts = np.random.default_rng(0).uniform(-20, 20, (500, 3))
    save_ply(os.path.join(d, "m.ply"), pts)
    prog = []
    for i in range(30):
        prog.append({"t": i / 30 * 12.0, "target": np.eye(4).tolist(),
                     "pitch": -70.0, "yaw": 140.0 + i, "dolly": -60.0})
    with open(os.path.join(d, "cam.json"), "w") as f:
        json.dump(prog, f)


def test_player_written_and_contract(tmp_path):
    d = str(tmp_path)
    _fake_flyby(d)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "view_flyby.py"),
         os.path.join(d, "m.ply"), os.path.join(d, "cam.json"),
         "--no-serve"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    html = open(os.path.join(d, "viewer_flyby.html")).read()
    # the player fetches these fixed names, copied next to the HTML
    assert os.path.isfile(os.path.join(d, "map.ply"))
    assert os.path.isfile(os.path.join(d, "camera.json"))
    for s in ("camera.json", "map.ply", "loadPly", "webgl2", "dolly"):
        assert s in html
    # keyframe fields the player interpolates
    k = json.load(open(os.path.join(d, "camera.json")))[0]
    for field in ("t", "target", "pitch", "yaw", "dolly"):
        assert field in k


def test_player_rejects_non_program_json(tmp_path):
    d = str(tmp_path)
    _fake_flyby(d)
    with open(os.path.join(d, "cam.json"), "w") as f:
        json.dump([{"foo": 1}], f)
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "view_flyby.py"),
         os.path.join(d, "m.ply"), os.path.join(d, "cam.json"),
         "--no-serve"], capture_output=True, text=True)
    assert r.returncode != 0
