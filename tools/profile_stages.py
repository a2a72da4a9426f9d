"""Per-stage timing of the fused LIO scan_step at bench shapes.

Answers "is the time in query gathers, insert scatters, the GN build, or
the EKF?" (VERDICT round 1, weak #8). The axon tunnel charges ~2.7 ms per
dispatched computation, so each stage is timed by running it K times inside
ONE jit (lax.fori_loop with data dependence threaded through) — one
dispatch, one sync — giving true on-device per-call time.

Usage: python tools/profile_stages.py [--h 128] [--w 1024] [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 20  # in-jit repetitions per stage


def timeit_looped(make_body, init_carry, k=K, n=3):
    """Time k in-jit iterations of body (carry -> carry); returns ms/iter."""
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, k, lambda i, c_: make_body(c_), c))

    def run():
        out = fn(init_carry)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))  # force full completion

    run()  # compile + first-transfer tax
    t0 = time.monotonic()
    for _ in range(n):
        run()
    return (time.monotonic() - t0) / n / k * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--source", type=int, default=8192)
    ap.add_argument("--frame", type=int, default=32768)
    ap.add_argument("--map-capacity", type=int, default=1 << 19)
    ap.add_argument("--ppv", type=int, default=20)
    args = ap.parse_args()

    from ptudes_tpu.config import (Capacity, EkfConfig, KissConfig,
                                   PipelineConfig)
    from ptudes_tpu.models import esekf, kiss, lio, sim
    from ptudes_tpu.ops import deskew as deskew_ops
    from ptudes_tpu.ops import hashmap, icp, voxel
    from ptudes_tpu.ops.projection import scan_to_points

    h, w = args.h, args.w
    cfg = PipelineConfig(
        kiss=KissConfig(max_range=70.0, min_range=1.0,
                        max_points_per_voxel=args.ppv,
                        max_iterations=args.iters, deskew=True, loss="plane"),
        cap=Capacity(max_points=h * w, max_frame=args.frame,
                     max_source=args.source,
                     map_capacity=args.map_capacity, dedup_table=1 << 20),
        ekf=EkfConfig(), max_imu_per_scan=16, guess="ekf",
    )
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size
    print(f"config: {h}x{w}, source={args.source}, frame={args.frame}, "
          f"map={args.map_capacity}, ppv={args.ppv}, voxel={vs}")

    # --- data: one real rendered scan + warm map from a few scans
    ts, poses = sim.circle_trajectory(6, radius=8.0, speed=2.0, scan_dt=0.1)
    world = sim.make_sim_world(seed=0, extent=30.0, n_boxes=40,
                               keepout_points=poses[:, :3, 3])
    sensor = sim.make_sim_sensor(h=h, w=w, fov_deg=90.0)
    scans = [sim.render_range_image(world, poses[i], sensor, max_range=70.0,
                                    noise_std=0.01, seed=i,
                                    end_pose=poses[min(i + 1, 5)])
             for i in range(5)]

    state = kiss.init_state(kcfg, cap)
    for i in range(4):
        pts, mask, ts01 = scan_to_points(sensor.lut, jnp.asarray(scans[i]))
        rel = np.linalg.inv(poses[0]) @ poses[i]
        state, _, _ = kiss.register_scan(
            state, pts, mask, ts01, cfg=kcfg, cap=cap,
            initial_guess=jnp.asarray(rel, jnp.float32), use_guess=True)
    print(f"map voxels: {int(hashmap.num_voxels(state.local_map))}, "
          f"points: {int(hashmap.num_points(state.local_map))}")

    scan = jnp.asarray(scans[4])
    guess = jnp.asarray(np.linalg.inv(poses[0]) @ poses[4], jnp.float32)

    pts, mask, ts01 = scan_to_points(sensor.lut, scan)

    # projection: thread carry through the range image
    t = timeit_looped(
        lambda c: scan_to_points(sensor.lut, c + 0.0)[0][0, 0] * 0 + c, scan)
    print(f"projection:        {t:8.3f} ms")

    # deskew
    t = timeit_looped(
        lambda p: deskew_ops.deskew_scan(p, ts01, state.pose_prev, state.pose,
                                         enabled=True), pts)
    print(f"deskew:            {t:8.3f} ms")

    # clip + double voxelize + compact
    def voxelize(p):
        m = voxel.range_clip_mask(p, mask, kcfg.min_range, kcfg.max_range)
        keep_f = voxel.first_in_voxel_mask(p, m, vs * 0.5, cap.dedup_table)
        frame_ds, frame_mask = voxel.compact(p, keep_f, cap.max_frame)
        keep_s = voxel.first_in_voxel_mask(p, keep_f, vs * 1.5,
                                           cap.dedup_table)
        source, source_mask = voxel.compact(p, keep_s, cap.max_source)
        return p + frame_ds[0, 0] * 1e-12 + source[0, 0] * 1e-12
    t = timeit_looped(voxelize, pts)
    print(f"voxelize(x2):      {t:8.3f} ms")

    def voxelize_out(p, m):
        m = voxel.range_clip_mask(p, m, kcfg.min_range, kcfg.max_range)
        keep_f = voxel.first_in_voxel_mask(p, m, vs * 0.5, cap.dedup_table)
        frame_ds, frame_mask = voxel.compact(p, keep_f, cap.max_frame)
        keep_s = voxel.first_in_voxel_mask(p, keep_f, vs * 1.5,
                                           cap.dedup_table)
        source, source_mask = voxel.compact(p, keep_s, cap.max_source)
        return frame_ds, frame_mask, source, source_mask
    frame_ds, frame_mask, source, source_mask = jax.jit(voxelize_out)(
        pts, mask)
    print(f"  frame pts: {int(frame_mask.sum())}, "
          f"source pts: {int(source_mask.sum())}")

    # one hash query (27-neighborhood, approx) — perturb query pts per iter
    def qbody(s_):
        r = hashmap.query(state.local_map, s_, voxel_size=vs,
                          max_probes=cap.max_probes, approx=True,
                          neighborhood=27)
        return s_ + r.nn[0, 0] * 1e-12
    t_query = timeit_looped(qbody, source)
    print(f"query (1 iter):    {t_query:8.3f} ms   "
          f"x{args.iters} = {t_query * args.iters:.1f} ms")

    # cached-candidate gather (once per scan) + one dense GN iteration
    def cbody(s_):
        c = icp.gather_candidates(
            state.local_map, s_, voxel_size=vs, max_probes=cap.max_probes,
            neighborhood=27, n_voxels=kcfg.nn_voxels,
            fit_planes=True, plane_radius=kcfg.plane_fit_radius)
        return s_ + c.pts[0, 0] * 1e-12
    t = timeit_looped(cbody, source)
    print(f"gather_candidates: {t:8.3f} ms   (once per scan)")

    cand0 = jax.jit(lambda: icp.gather_candidates(
        state.local_map, source, voxel_size=vs, max_probes=cap.max_probes,
        neighborhood=27, n_voxels=kcfg.nn_voxels, fit_planes=True,
        plane_radius=kcfg.plane_fit_radius))()
    def dbody(g_):
        jtj, jtr, nc, tw = icp.gn_from_candidates(
            g_, source, source_mask, cand0, jnp.asarray(0.1667),
            jnp.asarray(2.25), loss=kcfg.loss,
            plane_min_quality=kcfg.plane_min_quality)
        dx = jnp.linalg.solve(jtj + jnp.eye(6) * 1e-8, -jtr)
        from ptudes_tpu.geom import se3 as _se3
        return _se3.exp_twist(dx * 1e-12) @ g_
    t = timeit_looped(dbody, guess)
    print(f"dense GN iter:     {t:8.3f} ms   (per ICP iteration)")

    # GN build alone (correspondences fixed)
    q0 = jax.jit(lambda s_: hashmap.query(
        state.local_map, s_, voxel_size=vs, max_probes=cap.max_probes,
        approx=True, neighborhood=27))(source)

    from ptudes_tpu.geom import so3
    def gn_body(p_w):
        corr = source_mask & q0.found & (q0.d2 <= 4.0)
        r_vec = p_w - q0.nn
        w_pt = jnp.where(corr, 1.0 / (1.0 + q0.d2), 0.0)
        hat_p = so3.hat(p_w)
        j = jnp.concatenate(
            [-hat_p, jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                      (p_w.shape[0], 3, 3))], -1)
        jw = j * w_pt[:, None, None]
        jtj = jnp.einsum("nij,nik->jk", jw, j)
        jtr = jnp.einsum("nij,ni->j", jw, r_vec)
        dx = jnp.linalg.solve(jtj + jnp.eye(6) * 1e-8, -jtr)
        return p_w + dx[None, :3] * 1e-12
    t = timeit_looped(gn_body, source)
    print(f"GN build+solve:    {t:8.3f} ms")

    # full ICP (while_loop, early exit)
    def icp_body(g_):
        r = icp.register_frame(
            source, source_mask, state.local_map, g_,
            jnp.asarray(1.5, jnp.float32), jnp.asarray(0.1667),
            voxel_size=vs, max_probes=cap.max_probes,
            max_iterations=args.iters, approx=True, loss=kcfg.loss,
            plane_min_quality=kcfg.plane_min_quality, neighborhood=27)
        return g_ + r.pose * 1e-12
    t = timeit_looped(icp_body, guess, k=5)
    rr = jax.jit(lambda: icp.register_frame(
        source, source_mask, state.local_map, guess,
        jnp.asarray(1.5, jnp.float32), jnp.asarray(0.1667),
        voxel_size=vs, max_probes=cap.max_probes,
        max_iterations=args.iters, approx=True, loss=kcfg.loss,
        plane_min_quality=kcfg.plane_min_quality, neighborhood=27))()
    print(f"ICP total:         {t:8.3f} ms   "
          f"(converged in {int(rr.iterations)} iters, "
          f"{int(rr.num_corr)} corr)")

    # insert + remove_far
    def ins_body(m):
        m2 = hashmap.insert(m, frame_ds, frame_mask, voxel_size=vs,
                            max_probes=cap.max_probes)
        return hashmap.remove_far(m2, jnp.zeros(3), jnp.asarray(70.0**2))
    t = timeit_looped(ins_body, state.local_map, k=5)
    print(f"insert+evict:      {t:8.3f} ms")

    # EKF predict (16 IMU) + update
    ekf_state = esekf.init_state(cfg.ekf)
    imu = esekf.Imu(lacc=jnp.zeros((16, 3)), avel=jnp.zeros((16, 3)),
                    ts=jnp.arange(16, dtype=jnp.float32) * 0.01)
    iv = jnp.ones(16, bool)
    def ekf_body(st):
        return esekf.process_pose(
            esekf.process_imu_batch(st, imu, iv, cfg=cfg.ekf), guess,
            cfg=cfg.ekf)
    t = timeit_looped(ekf_body, ekf_state)
    print(f"EKF (16 imu+upd):  {t:8.3f} ms")

    # whole fused scan_step
    step = lio.make_scan_step(sensor.lut, cfg)
    lstate = lio.LioState(kiss=state, ekf=ekf_state)
    batch = lio.ScanBatch(
        range_m=scan, scan_ts=jnp.asarray(0.5), imu=imu, imu_valid=iv,
        guess_pose=guess)
    t0 = time.monotonic()
    t = timeit_looped(lambda s: step(s, batch)[0], lstate, k=5)
    print(f"scan_step total:   {t:8.3f} ms  ({1e3 / t:.1f} scans/s)  "
          f"[compile+measure {time.monotonic() - t0:.0f} s]")


if __name__ == "__main__":
    main()
