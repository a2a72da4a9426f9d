"""Point-sharded LIO step over a device mesh (shard_map + psum).

The BASELINE north-star mapping: within one sequence, the ICP source
points are sharded across the ``pt`` mesh axis. Each device searches its
replicated local-map copy for its point shard and accumulates partial
Gauss-Newton normal equations; one ``psum`` of (JTJ [6,6], JTr [6], counts)
per iteration rides the ICI — bytes per collective ~200, so scaling is
compute-bound. The map update all-gathers the (already downsampled) frame
so every replica inserts identical points and stays bitwise in sync.

Combined with the ``bag`` axis (pure DP over sequences), this is the
framework's tp x dp analog: ``mesh = (bag, pt)``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import PipelineConfig
from ..geom import linalg, se3, so3
from ..ops import hashmap, icp, voxel
from ..ops import deskew as deskew_ops
from ..ops.projection import XyzLut, scan_to_points
from . import mesh as mesh_lib
from ..models import esekf, kiss, lio


def make_sharded_scan_step(lut: XyzLut, cfg: PipelineConfig, mesh: Mesh):
    """Build a scan_step where ICP points are sharded over mesh axis 'pt'.

    State is replicated over 'pt' (identical on all devices of a bag row);
    the ScanBatch's flattened point arrays are sharded on their leading
    axis. Use with shard_map(in_specs=..., out_specs=...) — see
    ``sharded_scan_step_fn``.
    """
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size

    def step(state: lio.LioState, batch: lio.ScanBatch):
        # --- replicated: EKF predict over the IMU block
        ekf0_pose = esekf.pose_mat(state.ekf)
        ekf1 = esekf.process_imu_batch(
            state.ekf, batch.imu, batch.imu_valid, cfg=cfg.ekf)

        # --- replicated projection (cheap) then shard points
        pts, mask, ts01 = scan_to_points(lut, batch.range_m)
        npt = pts.shape[0]
        ndev = jax.lax.axis_size("pt")
        idx = jax.lax.axis_index("pt")
        shard = npt // ndev
        pts = jax.lax.dynamic_slice_in_dim(pts, idx * shard, shard)
        mask = jax.lax.dynamic_slice_in_dim(mask, idx * shard, shard)
        ts01 = jax.lax.dynamic_slice_in_dim(ts01, idx * shard, shard)

        kstate = state.kiss
        if kcfg.deskew:
            if cfg.deskew_mode == "ekf":
                twist = se3.log_pose(
                    se3.inv(ekf0_pose) @ esekf.pose_mat(ekf1))
                pts = deskew_ops.deskew_by_twist(pts, ts01 - 0.5, twist)
            else:
                pts = deskew_ops.deskew_scan(
                    pts, ts01, kstate.pose_prev, kstate.pose,
                    enabled=kstate.num_scans >= 2)
        mask = voxel.range_clip_mask(pts, mask, kcfg.min_range, kcfg.max_range)

        # local voxel dedup per shard (slight over-sampling across shard
        # boundaries only changes the downsample marginally)
        keep_frame = voxel.first_in_voxel_mask(
            pts, mask, vs * 0.5, cap.dedup_table)
        frame_ds, frame_mask = voxel.compact(
            pts, keep_frame, cap.max_frame // ndev)
        keep_src = voxel.first_in_voxel_mask(
            pts, keep_frame, vs * 1.5, cap.dedup_table)
        source, source_mask = voxel.compact(
            pts, keep_src, cap.max_source // ndev)

        sigma = kiss.get_adaptive_threshold(kstate, kcfg)
        if cfg.guess == "ekf":
            guess = esekf.pose_mat(ekf1)
        elif cfg.guess == "gt":
            guess = batch.guess_pose
        else:
            guess = kstate.pose @ kiss.prediction_model(kstate)
        guess = guess.astype(jnp.float32)
        guess_inv = se3.inv(guess)
        kernel = sigma / 3.0
        max_d2 = jnp.square(3.0 * sigma)
        refresh_th = 0.5 * vs

        # gather-once candidates per shard (map replicated, points sharded);
        # per iteration only dense math + ONE psum of the 6x6 system remain
        def fetch(t_at):
            return icp.gather_candidates(
                kstate.local_map, se3.transform(t_at, source),
                voxel_size=vs, max_probes=cap.max_probes,
                neighborhood=kcfg.nn_neighborhood, n_voxels=kcfg.nn_voxels,
                fit_planes=(kcfg.loss == "plane"),
                plane_radius=kcfg.plane_fit_radius)

        def body(_, carry):
            t_cur, t_gather, cand, converged = carry
            # pose is replicated over 'pt', so the staleness branch is
            # uniform across the shard group — cond is collective-safe
            stale = icp.drift_metric(t_gather, t_cur) > refresh_th
            cand = jax.lax.cond(stale, lambda: fetch(t_cur), lambda: cand)
            t_gather = jnp.where(stale, t_cur, t_gather)

            jtj, jtr, _, total_w = icp.gn_from_candidates(
                t_cur, source, source_mask, cand, kernel, max_d2,
                loss=kcfg.loss, plane_min_quality=kcfg.plane_min_quality)
            # the one hot-loop collective: reduce the 6x6 system over ICI
            jtj = jax.lax.psum(jtj, "pt")
            jtr = jax.lax.psum(jtr, "pt")
            total_w = jax.lax.psum(total_w, "pt")
            # motion prior — same objective as the single-device path
            if kcfg.prior_rot_weight > 0.0 or kcfg.prior_trans_weight > 0.0:
                xi = se3.log_pose(t_cur @ guess_inv)
                wp = total_w * jnp.asarray(
                    [kcfg.prior_rot_weight] * 3
                    + [kcfg.prior_trans_weight] * 3, jnp.float32)
                jtj = jtj + jnp.diag(wp)
                jtr = jtr + wp * xi
            jtj = jtj + 1e-8 * jnp.eye(6, dtype=jnp.float32)
            dx = linalg.solve_spd6(jtj, -jtr)
            dx = jnp.where(converged, 0.0, dx)
            t_new = se3.exp_twist(dx) @ t_cur
            return t_new, t_gather, cand, converged | (
                jnp.linalg.norm(dx) < kcfg.convergence_criterion)

        new_pose, _, _, _ = jax.lax.fori_loop(
            0, kcfg.max_iterations, body,
            (guess, guess, fetch(guess), jnp.asarray(False)))

        # adaptive threshold bookkeeping (replicated math)
        dev = se3.inv(guess) @ new_pose
        err = kiss._model_error(dev, kcfg.max_range)
        accum = err > kcfg.min_motion_th

        # map update: all-gather the frame so replicas insert identically;
        # re-dedup at 0.5*vs — per-shard dedup can leave cross-shard octant
        # duplicates, which insert_deduped's uniqueness precondition forbids
        # no-IMU skip gate rides into the map-update inputs (empty insert
        # mask, infinite eviction radius) — a post-hoc jnp.where over the
        # carried map would stream the whole points table through a select
        # every scan (same rationale as models/lio.py scan_step)
        has_imu = jnp.any(batch.imu_valid)
        frame_w = se3.transform(new_pose, frame_ds)
        frame_all = jax.lax.all_gather(
            frame_w, "pt", axis=0, tiled=True)
        fmask_all = jax.lax.all_gather(
            frame_mask, "pt", axis=0, tiled=True)
        fmask_all = voxel.first_in_voxel_mask(
            frame_all, fmask_all, vs * 0.5, cap.dedup_table)
        local_map = hashmap.insert_deduped(
            kstate.local_map, frame_all, fmask_all & has_imu,
            voxel_size=vs, max_probes=cap.max_probes,
            new_capacity=cap.max_new_per_scan)
        local_map = hashmap.remove_far(
            local_map, se3.trans(new_pose),
            jnp.where(has_imu,
                      jnp.asarray(kcfg.max_range**2, jnp.float32), jnp.inf))

        def gate(new, old):
            return jnp.where(has_imu, new, old)

        kiss1 = kiss.KissState(
            local_map=local_map,
            pose=gate(new_pose, kstate.pose),
            pose_prev=gate(kstate.pose, kstate.pose_prev),
            model_sse=gate(
                kstate.model_sse + jnp.where(accum, err * err, 0.0),
                kstate.model_sse),
            num_samples=gate(kstate.num_samples + accum.astype(jnp.int32),
                             kstate.num_samples),
            num_scans=gate(kstate.num_scans + 1, kstate.num_scans))

        ekf2 = esekf.process_pose(ekf1, new_pose, cfg=cfg.ekf)
        ekf_out = esekf.masked_update(ekf1, ekf2, has_imu)
        out_state = lio.LioState(kiss=kiss1, ekf=ekf_out)
        return out_state, (new_pose, esekf.pose_mat(out_state.ekf))

    return step


def sharded_run_sequence(
    state: lio.LioState,
    batches: lio.ScanBatch,
    lut: XyzLut,
    cfg: PipelineConfig,
    mesh: Mesh,
):
    """lax.scan of the point-sharded step, wrapped in shard_map.

    State and batches are replicated over both mesh axes here (single-bag
    form); the point sharding happens inside the step via axis_index
    slicing, and outputs are identical on all devices.
    """
    step = make_sharded_scan_step(lut, cfg, mesh)

    def run(state, batches):
        return jax.lax.scan(step, state, batches)

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), (P(), P())),
        check_vma=False,
    )
    return jax.jit(fn)(state, batches)
