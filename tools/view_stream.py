"""Interactive raw-stream player: live scan playback in WebGL.

Closes the reference's last viz gap: ``ptudes viz`` plays a pcap/bag
live at sensor rate through the OpenGL SimpleViz — channel image on top,
range-colored 3D point cloud below, pause/rate keys
(``/root/reference/src/ptudes/cli/viz.py:49-62``). This tool reproduces
that experience with the repo's own IO stack and a self-contained
WebGL2 player (inline JS, no dependencies, same pattern as
``tools/view_scene.py`` / ``tools/view_flyby.py``):

* the recording is decoded once (``ptudes_tpu.io.sources``) and exported
  as one u16 range volume + the projection LUT (direction/offset),
  everything pre-DESTAGGERED with the same per-row roll so the 2D image
  panel and the 3D projection stay aligned;
* the player re-projects every frame ON THE GPU: a vertex per pixel
  reads the scan's range texture and computes ``xyz = dir*r + off`` in
  the vertex shader — scrubbing/playback at any rate with one 256 KB
  texture upload per frame, no per-scan point buffers;
* extra channels (reflectivity/signal/nearir/second returns) ride along
  as u16 textures; 'f' cycles them like SimpleViz cycles LidarScan
  fields.

Controls:
    space ........ play / pause
    left/right ... step one scan (shift: 10)
    up/down ...... playback rate x2 / /2
    f ............ cycle channel (range -> extra fields)
    drag / wheel . orbit / zoom

Usage:
    python tools/view_stream.py RECORDING [-m META] [--out-dir DIR]
                                [--port 8126] [--no-serve]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ptudes_tpu.viz.stream_player import export_stream, serve_dir  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("recording")
    ap.add_argument("-m", "--meta", default=None)
    ap.add_argument("--out-dir", default=None,
                    help="export directory (default: <recording>_stream)")
    ap.add_argument("--port", type=int, default=8126)
    ap.add_argument("--no-serve", action="store_true")
    args = ap.parse_args()

    from ptudes_tpu.io.metadata import read_metadata_json, resolve_metadata
    from ptudes_tpu.io.sources import read_packet_source

    meta_path = resolve_metadata(args.recording, args.meta)
    if not meta_path:
        print("metadata not found; pass -m", file=sys.stderr)
        return 1
    info = read_metadata_json(meta_path)
    scans, _imu = read_packet_source(args.recording, info, keep_fields=True)
    if not len(scans):
        print("no scans decoded from the recording", file=sys.stderr)
        return 1

    d = args.out_dir or (os.path.splitext(args.recording)[0] + "_stream")
    out = export_stream(d, info, scans)
    print(f"player -> {out}")
    print(f"{len(scans)} scans, {info.h}x{info.w}, "
          f"fields: range{''.join(', ' + f for f in (scans.fields or {}))}")

    if args.no_serve:
        return 0
    serve_dir(d, args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
