"""CLI smoke tests: every `ptudes-tpu` command end-to-end on a tiny
real-format fixture (LEGACY pcap + metadata JSON + NC ground-truth csv).

The CLI (ptudes_tpu/cli/main.py) mirrors the reference's command surface
(`ptudes stat|viz|flyby|ekf-bench {sim,nc,ouster,cmp}`, reference
src/ptudes/cli/run.py); these tests pin the user-facing contract — exit
codes, artifact files, and the right-sizing capacity flags — through
click's CliRunner with small capacities so CPU runtime stays bounded.
"""
import os
import sys

import numpy as np
import pytest
from click.testing import CliRunner

from ptudes_tpu.cli.main import ptudes_cli

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

N_SCANS, H, W = 8, 16, 128


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from make_fixture import generate
    d = tmp_path_factory.mktemp("clifix")
    pcap, meta, gt = generate(str(d), n_scans=N_SCANS, h=H, w=W, seed=7)
    return d, pcap, meta, gt


SMALL_CAPS = ["--map-capacity", str(1 << 14), "--max-source", "2048",
              "--max-frame", "4096", "--voxel-size", "0.4",
              "--kiss-max-range", "60"]


def _run(args):
    r = CliRunner().invoke(ptudes_cli, args, catch_exceptions=False)
    assert r.exit_code == 0, r.output
    return r.output


def test_stat(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    out = _run(["stat", pcap, "-m", meta])
    assert "scans: 8" in out and "grav vector est" in out.lower()


def test_stat_scan_window(fixture_dir):
    """--start-scan/--end-scan windowing (reference
    src/ptudes/cli/stat.py:29-30): stats run over the selected scans
    and their interleaved IMU samples only."""
    d, pcap, meta, gt = fixture_dir
    out = _run(["stat", pcap, "-m", meta,
                "--start-scan", "2", "--end-scan", "5"])
    assert "scans: 4" in out
    # out-of-range window fails loudly, not silently empty
    r = CliRunner().invoke(
        ptudes_cli, ["stat", pcap, "-m", meta, "--start-scan", "99"])
    assert r.exit_code != 0


@pytest.mark.slow
def test_ekf_bench_ouster_flagship(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    poses = str(d / "out_poses.txt")
    out = _run(["ekf-bench", "ouster", pcap, "-m", meta,
                "--use-imu-prediction", "-g", gt,
                "--save-kitti-poses", poses] + SMALL_CAPS)
    assert os.path.isfile(poses)
    k = np.loadtxt(poses)
    assert k.shape == (N_SCANS, 12) and np.isfinite(k).all()
    assert "ATE" in out


@pytest.mark.slow
def test_ekf_bench_ouster_online(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    out = _run(["ekf-bench", "ouster", pcap, "-m", meta,
                "--use-imu-prediction", "--online"] + SMALL_CAPS)
    assert "latency" in out and "p99" in out


def test_ekf_bench_cmp(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    nc_poses = str(d / "out_nc.csv")
    _run(["ekf-bench", "ouster", pcap, "-m", meta, "--use-imu-prediction",
          "--save-nc-gt-poses", nc_poses] + SMALL_CAPS)
    out = _run(["ekf-bench", "cmp", nc_poses, gt])
    assert "ATE" in out


def test_flyby_and_player(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    poses = str(d / "out_poses.txt")
    if not os.path.isfile(poses):
        _run(["ekf-bench", "ouster", pcap, "-m", meta,
              "--use-imu-prediction", "--save-kitti-poses", poses]
             + SMALL_CAPS)
    ply = str(d / "fly_map.ply")
    cam = str(d / "cam.json")
    out = _run(["flyby", pcap, "-m", meta, "--kitti-poses", poses,
                "-o", ply, "--camera-json", cam])
    assert os.path.isfile(ply) and os.path.isfile(cam)
    assert "flyby duration" in out


def test_viz_frames(fixture_dir):
    d, pcap, meta, gt = fixture_dir
    frames = d / "frames"
    _run(["viz", pcap, "-m", meta, "--out-dir", str(frames),
          "--stride", "4"])
    assert any(f.suffix == ".png" for f in frames.iterdir())


def test_ekf_bench_sim():
    out = _run(["ekf-bench", "sim", "--duration", "2.0", "--corr-t", "0.5"])
    assert "ATE" in out


def test_frozen_map_requires_resume_state(tmp_path):
    """--frozen-map without a prior map checkpoint is rejected upfront."""
    from click.testing import CliRunner

    from ptudes_tpu.cli.main import ptudes_cli

    r = CliRunner().invoke(
        ptudes_cli,
        ["ekf-bench", "ouster", __file__, "--frozen-map"])
    assert r.exit_code != 0
    assert "resume-state" in r.output
