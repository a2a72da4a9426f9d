"""Component-level timing of the fused candidate gather (pallas_gather)
vs the XLA chain, to locate where the round-5 A/B delta comes from.

In-jit fori repetition (one dispatch), bodies serialized through a data
dependence on the carry so XLA cannot batch or CSE the iterations.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import H, W, RADIUS, RAMP, SPEED, bench_config, make_data  # noqa: E402
from bench import _device_watchdog  # noqa: E402
from ptudes_tpu.geom import se3  # noqa: E402
from ptudes_tpu.models import lio, sim  # noqa: E402
from ptudes_tpu.ops import hashmap, icp, voxel  # noqa: E402
from ptudes_tpu.ops.hashmap import _fingerprint_and_slot  # noqa: E402
from ptudes_tpu.ops.projection import scan_to_points  # noqa: E402
from ptudes_tpu.ops.voxel import voxel_coords  # noqa: E402

K = 100


def timed(name, make_body, init):
    fn = jax.jit(lambda c: jax.lax.fori_loop(
        0, K, lambda i, c_: make_body(c_), init))

    def run():
        out = fn(init)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jnp.sum(leaf.astype(jnp.float32)))

    run()
    best = np.inf
    for _ in range(3):
        t0 = time.monotonic()
        run()
        best = min(best, time.monotonic() - t0)
    print(f"{name:40s} {best / K * 1e6:9.1f} us", flush=True)


def main():
    _device_watchdog()
    scans, scan_ts, gt_mid, imu_ts = make_data()
    cfg = bench_config()
    kcfg, cap = cfg.kiss, cfg.cap
    vs = kcfg.resolved_voxel_size
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    batches = lio.build_batches(cfg, scans, scan_ts, np.asarray(imu.lacc),
                                np.asarray(imu.avel), imu_ts)
    state = lio.init_state(cfg)
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    m = fin.kiss.local_map
    pose = fin.kiss.pose

    pts, mask, _ = scan_to_points(sensor.lut, batches.range_m[-1])
    mask = voxel.range_clip_mask(pts, mask, kcfg.min_range, kcfg.max_range)
    keep_f = voxel.first_in_voxel_mask(pts, mask, vs * 0.5, cap.dedup_table)
    frame_ds, frame_mask = voxel.compact(pts, keep_f, cap.max_frame)
    keep_s = voxel.first_in_voxel_mask(frame_ds, frame_mask, vs * 1.5,
                                       cap.dedup_table)
    source, source_mask = voxel.compact(frame_ds, keep_s, cap.max_source,
                                        decimate_overflow=True)
    n = source.shape[0]
    j_n, v_n = kcfg.nn_neighborhood, kcfg.nn_voxels
    capn = m.meta.shape[0]
    ppv = m.points.shape[1]
    r = 1.5 * vs if kcfg.plane_fit_radius is None else kcfg.plane_fit_radius
    print(f"N={n} J={j_n} V={v_n} cap={capn} ppv={ppv} "
          f"src_valid={int(source_mask.sum())}")

    def jitter(c):
        # tiny pose perturbation serializes iterations via data dependence
        return pose.at[0, 3].add(c * 1e-12)

    # 1. whole old chain
    from ptudes_tpu.ops.pallas_gn import prep_with_plane_pallas

    def old_chain(c):
        t = jitter(c)
        cand = icp.gather_candidates(
            m, se3.transform(t, source), voxel_size=vs, max_probes=1,
            neighborhood=j_n, n_voxels=v_n, fit_planes=False)
        p = prep_with_plane_pallas(
            cand, source_mask, se3.transform(t, source),
            jnp.asarray(r, jnp.float32), loss="plane")
        return c + p.feat[0, 0]

    timed("old: gather_candidates+prep", old_chain, jnp.float32(0))

    # 2. whole new chain
    from ptudes_tpu.ops.pallas_gather import gather_prep_fused

    def new_chain(c):
        p = gather_prep_fused(
            m, source, source_mask, jitter(c), voxel_size=vs,
            max_probes=1, neighborhood=j_n, n_voxels=v_n,
            plane_radius=r, loss="plane")
        return c + p.feat[0, 0]

    timed("new: gather_prep_fused", new_chain, jnp.float32(0))

    # components
    pts_w = se3.transform(pose, source)
    qc = voxel_coords(pts_w, vs)
    offs = jnp.asarray(hashmap._NEIGHBOR_OFFSETS[:j_n])
    keys = qc[:, None, :] + offs[None, :, :]
    fp, h0 = _fingerprint_and_slot(keys, capn)
    s_full = h0 & (capn - 1)

    def meta_gather(c):
        s = s_full + c.astype(jnp.int32) * 0
        rows = m.meta.at[s].get(mode="fill", fill_value=0)
        return c + rows[0, 0, 0].astype(jnp.float32)

    timed("meta row gather [N,7]", meta_gather, jnp.float32(0))

    rows = m.meta.at[s_full].get(mode="fill", fill_value=0)
    rows_flat = rows.reshape(n, j_n * 8)

    def transp(c):
        rr = rows_flat + c.astype(jnp.int32) * 0
        t = rr.T
        return c + t[0, 0].astype(jnp.float32)

    timed("transpose [N,56]->[56,N] i32", transp, jnp.float32(0))

    slot_v = jnp.argsort(jnp.sum((rows[..., 2:5] * 1), -1), axis=1)[:, :v_n]
    slot_v = jnp.take_along_axis(s_full, slot_v, axis=1)

    def pts_gather(c):
        s = slot_v + c.astype(jnp.int32) * 0
        packed = m.points.at[s].get(mode="fill", fill_value=0)
        return c + packed[0, 0, 0].astype(jnp.float32)

    timed("points row gather [N,4]", pts_gather, jnp.float32(0))

    # select kernel alone (fixed inputs, serialized via carry add)
    from ptudes_tpu.ops import pallas_gather as pg
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ns = n // 128
    rows_t = rows_flat.T.reshape(-1, ns, 128)
    fp_t = fp.T.reshape(j_n, ns, 128)
    slot_t = s_full.T.reshape(j_n, ns, 128)
    qc_t = qc.T.reshape(3, ns, 128)
    ptq = jnp.concatenate(
        [pts_w, source_mask.astype(jnp.float32)[:, None]],
        axis=1).T.reshape(4, ns, 128)

    def sel_kernel(c):
        p = ptq.at[0, 0, 0].add(c * 1e-12)
        aux = pl.pallas_call(
            pg._make_select_kernel(j_n, 1, v_n,
                                   hashmap._NEIGHBOR_OFFSETS[:j_n]),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((5 * v_n, ns, 128), jnp.int32),
            )(p, qc_t, fp_t, slot_t, rows_t)
        return c + aux[0, 0, 0].astype(jnp.float32)

    timed("select kernel", sel_kernel, jnp.float32(0))

    packed = m.points.at[slot_v].get(mode="fill", fill_value=0)
    pts_rows = packed.reshape(n, v_n * ppv).T.reshape(-1, ns, 128)
    aux0 = jnp.zeros((5 * v_n, ns, 128), jnp.int32)
    scal = jnp.stack([jnp.float32(vs), jnp.float32(r * r)]).reshape(1, 2)

    def prep_kernel(c):
        p = ptq.at[0, 0, 0].add(c * 1e-12)
        outs = pl.pallas_call(
            pg._make_prep_kernel(v_n, ppv, "plane"),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(5)),
            out_shape=(
                jax.ShapeDtypeStruct((8, ns, 128), jnp.float32),
                jax.ShapeDtypeStruct((v_n * ppv, ns, 128), jnp.float32),
                jax.ShapeDtypeStruct((v_n * ppv, ns, 128), jnp.float32),
                jax.ShapeDtypeStruct((v_n * ppv, ns, 128), jnp.float32),
                jax.ShapeDtypeStruct((v_n * ppv, ns, 128), jnp.float32),
            ))(p, aux0, pts_rows, scal)
        return c + outs[0][0, 0, 0]

    timed("prep kernel", prep_kernel, jnp.float32(0))


if __name__ == "__main__":
    main()
