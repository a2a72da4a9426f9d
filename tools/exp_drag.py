"""Experiment: per-scan ICP drag vs (voxel_size, points-per-voxel) on TPU.

Registers scan k against a GT-posed map of scans 0..k-1 (no self-match,
no smear) from a GT guess — isolates the intrinsic point-to-point bias.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from ptudes_tpu.config import Capacity
from ptudes_tpu.models import sim
from ptudes_tpu.ops import projection, hashmap, voxel, icp
from ptudes_tpu.geom import se3

CAP = Capacity(dedup_table=1 << 18)
N = 16

ts, poses = sim.circle_trajectory(N, radius=8.0, speed=2.0, scan_dt=0.1)
world = sim.make_sim_world(seed=0, extent=25.0, n_boxes=40,
                           keepout_points=poses[:, :3, 3])
sensor = sim.make_sim_sensor(h=64, w=512, fov_deg=45.0)
scans = np.stack([
    sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                           noise_std=0.01, seed=i) for i in range(N)
])
gt0inv = np.linalg.inv(poses[0])
rel = [gt0inv @ poses[i] for i in range(N)]

print("devices:", jax.devices())

for vs, ppv in [(0.3, 8), (0.3, 20), (0.5, 20), (1.0, 20), (1.0, 8)]:
    t0 = time.time()
    m = hashmap.create(1 << 17, ppv)
    drags = []
    for i in range(N):
        pts, mask, _ = projection.scan_to_points(sensor.lut, jnp.asarray(scans[i]))
        mask = voxel.range_clip_mask(pts, mask, 1.0, 30.0)
        keep = voxel.first_in_voxel_mask(pts, mask, vs * 0.5, CAP.dedup_table)
        if i >= 1:
            keeps = voxel.first_in_voxel_mask(pts, keep, vs * 1.5, CAP.dedup_table)
            src, sm = voxel.compact(pts, keeps, 16384)
            sig = 0.3
            res = icp.register_frame(
                src, sm, m, jnp.asarray(rel[i].astype(np.float32)),
                jnp.asarray(3.0 * sig), jnp.asarray(sig / 3.0),
                voxel_size=vs, max_iterations=100)
            err = np.asarray(res.pose)[:3, 3] - rel[i][:3, 3]
            drags.append(np.linalg.norm(err))
        fr, fm = voxel.compact(pts, keep, 32768)
        fw = se3.transform(jnp.asarray(rel[i].astype(np.float32)), fr)
        m = hashmap.insert(m, fw, fm, voxel_size=vs)
    print(f"vs={vs} ppv={ppv}: drag mean={np.mean(drags):.4f} "
          f"max={np.max(drags):.4f}  ({time.time()-t0:.1f}s)")
