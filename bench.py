"""Benchmark: fused LIO (ICP + EKF) scan throughput on one TPU chip.

BASELINE config 1 equivalent: OS-0-128-scale scans (128 x 1024), 50 scans,
default KISS-style odometry + ES-EKF fusion — the reference's
``ptudes ekf-bench ouster --use-imu-prediction`` hot loop
(``src/ptudes/cli/ekf_bench.py:493-563``). Real sensor recordings are not
available in this environment, so scans come from the analytic raycast
simulator at the same scale (exact ranges + 1 cm noise, true rotosweep,
platform starting at rest with a 1 s speed ramp — the physical profile of
a real recording). Scan timestamps follow the reference's
last_valid_column_ts convention (end of sweep); the quality gate is ATE
RMSE against the simulator's exact mid-sweep poses (the deskew anchor).

``vs_baseline``: ratio against the POLICY-IDENTICAL f64 numpy LIO oracle
(tools/oracle_kiss.py OracleLio: same EKF-twist deskew, EKF guesses and
EKF fusion as the TPU pipeline; per-registration KD-tree exact NN)
measured on this host's CPU — the stand-in for a kiss-icp-C++-based LIO
stack, which is not installed here. A JSON line with the full context is
printed at the end.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SCANS = 50
H, W = 128, 1024
SCAN_DT = 0.1
RADIUS, SPEED, RAMP = 8.0, 2.0, 1.0
CACHE = f"/tmp/ptudes_bench_{N_SCANS}_{H}x{W}_v4.npz"


def make_data():
    from ptudes_tpu.models import sim

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return z["scans"], z["scan_ts"], z["gt_mid"], z["imu_ts"]

    ts = np.arange(N_SCANS + 1) * SCAN_DT
    sweep = sim.circle_poses_at(ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    world = sim.make_sim_world(seed=0, extent=30.0, n_boxes=40,
                               keepout_points=sweep[:, :3, 3])
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    scans = np.stack([
        sim.render_range_image(
            world, sweep[i], sensor, max_range=70.0, noise_std=0.01,
            seed=i, end_pose=sweep[i + 1])
        for i in range(N_SCANS)
    ])
    scan_ts = ts[:N_SCANS] + SCAN_DT          # end-of-sweep timestamps
    gt_mid = sim.circle_poses_at(ts[:N_SCANS] + SCAN_DT / 2,
                                 radius=RADIUS, speed=SPEED, ramp=RAMP)
    imu_ts = np.arange(1, N_SCANS * 10 + 2) * 0.01
    np.savez_compressed(CACHE, scans=scans, scan_ts=scan_ts, gt_mid=gt_mid,
                        imu_ts=imu_ts)
    return scans, scan_ts, gt_mid, imu_ts


def bench_config():
    from ptudes_tpu.config import (Capacity, EkfConfig, KissConfig,
                                   PipelineConfig)
    return PipelineConfig(
        # ppv=8: the octant-deduped insert stores at most 8 points/voxel,
        # so 16 wasted half of every candidate gather row and doubled the
        # per-iteration GN candidate width (measured +13%, ATE better)
        kiss=KissConfig(max_range=70.0, min_range=1.0,
                        max_points_per_voxel=8, max_iterations=20,
                        deskew=True, loss="plane",
                        voxel_size=0.3, plane_fit_radius=0.6,
                        nn_mode="cached", nn_voxels=4,
                        nn_neighborhood=7, nn_refresh_drift=0.0),
        # max_probes=1: every hash-gather site (ICP candidates, insert
        # occupancy check) probes ONE slot — at the 6% operating load
        # factor the ~6% home-slot misses only re-route points through the
        # insert retry path (ATE measured unchanged, +5% throughput).
        # dedup_table 2^18: first-in-voxel scatter tables sized to ~2x the
        # raw point count; collisions just strengthen the downsample.
        # max_source=2048 (round 4): the deduped source decimates evenly
        # (scan-order-unbiased), so halving again from 4096 halves every
        # ICP gather row count and GN width at MEASURED ATE parity
        # (327.7 -> 342.4 scans/s, 0.0134 -> 0.0137; tools/exp_r4b.py).
        # max_new_per_scan=2048: insert scatter/claim cost is per ROW of
        # the op, paid even when few points are new; 2048 keeps the map
        # converging (1024 starves: ATE 0.0169) at +4% throughput.
        cap=Capacity(max_points=H * W, max_frame=32768, max_source=2048,
                     map_capacity=1 << 19, dedup_table=1 << 18,
                     max_new_per_scan=2048, max_probes=1),
        # predict_batch="pallas": the whole K-step EKF predict block as
        # ONE kernel launch (ops.pallas_ekf) — the r4 discovery that
        # per-op scheduling bubbles dominate at this operating point
        # made op-count the lever: 367.9 -> 451.2 scans/s measured, at
        # BETTER ATE (0.0133 -> 0.0129), and cold compile 57 -> 36 s.
        # update_form="pallas" (r5): the pose update as one kernel too
        # (residual, SPD solve, gain, Joseph, injection, projection) —
        # +0.7% interleaved A/B at identical ATE and cold compile
        # 45 -> 33 s (tools/exp_r5_update.py)
        ekf=EkfConfig(predict_batch="pallas", update_form="pallas"),
        # K=12: the sim emits exactly 10 IMU samples per scan interval,
        # so 12 leaves headroom with zero drops; +1% (r5 loop-knob sweep)
        max_imu_per_scan=12,
        guess="ekf",
        # bootstrap 3 + decimated steady insert (round-4 matrix,
        # tools/exp_r4.py): the r4 trace showed the exact "cond" steady
        # insert paying ~115 us/scan of UNTAKEN cond boundary plus the
        # overflow fori on early map-fill scans; running scans 0-2 with
        # the full-overflow body (map essentially complete by then on
        # this 30 m scene) and the loop-free budget-decimated insert
        # after measures 315.3 scans/s at ATE 0.0131 — faster AND more
        # accurate than cond steady (298.5 @ 0.0142), and cold compile
        # drops 104 s -> 58 s (no cond/fori bodies in the steady scan).
        # config.py keeps "cond" as the library default (exact map
        # semantics on arbitrary scenes); this is the bench shape.
        bootstrap_scans=3,
        steady_insert_mode=False,
        # unroll: pays the lax.scan boundary's carry copies once per N
        # scans. The sweet spot tracks the body weight: 2 on the r3/r4
        # bodies (4 regressed under scheduling pressure), but the r5
        # body — three mega-kernels + epilogue folds lighter — flips it:
        # unroll4 445.4 -> 452.5 scans/s at identical ATE
        # (tools/exp_r5_loopknobs.py)
        scan_unroll=4,
    )


def bench_tpu(scans, scan_ts, gt_mid, imu_ts):
    import jax
    from ptudes_tpu.models import lio, sim
    from ptudes_tpu.utils.metrics import calc_ate_rmse

    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    cfg = bench_config()
    batches = lio.build_batches(
        cfg, scans, scan_ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    state = lio.init_state(cfg)

    t0 = time.monotonic()
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    compile_and_run = time.monotonic() - t0

    # steady-state timing (cached executable)
    t0 = time.monotonic()
    fin, out = lio.run_sequence(state, batches, sensor.lut, cfg=cfg)
    jax.block_until_ready(out.kiss_pose)
    dt = time.monotonic() - t0

    # quality gate: first-pose-aligned ATE RMSE vs exact mid-sweep poses
    kp = np.asarray(out.kiss_pose, np.float64)
    _, ate_rmse = calc_ate_rmse(kp, gt_mid)

    return {
        "scans_per_sec": N_SCANS / dt,
        "sec_per_scan": dt / N_SCANS,
        "compile_s": compile_and_run - dt,
        "ate_rmse_m": float(ate_rmse),
        "device": str(jax.devices()[0]),
    }


def bench_cpu_oracle(scans, scan_ts, gt_mid, imu_ts):
    """POLICY-IDENTICAL f64 numpy LIO oracle on host CPU: the same
    loosely-coupled pipeline the TPU runs (per-scan ES-EKF predict over
    the scan's IMU block, EKF-twist deskew, EKF pose as the ICP initial
    guess, EKF fusion of the ICP pose; exact NN via a per-registration
    KD-tree). Runs the FULL bench sequence and returns (scans/s, ATE
    RMSE m), so the relative quality gate compares the same algorithm —
    the earlier const-velocity oracle measured a different policy during
    the speed ramp and its 0.15 m ATE made the gate vacuous."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from oracle_kiss import OracleLio
    from ptudes_tpu.models import sim
    from ptudes_tpu.ops import projection
    from ptudes_tpu.utils.metrics import calc_ate_rmse
    import jax.numpy as jnp

    n = len(scans)
    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    lacc, avel = np.asarray(imu.lacc), np.asarray(imu.avel)
    ok = OracleLio(voxel_size=0.3, max_range=70.0, min_range=1.0,
                   max_iters=30,
                   # the TPU registration objective (bench_config):
                   # patch-plane loss + guess-anchored motion prior
                   loss="plane", plane_min_quality=0.2, plane_radius=0.6,
                   prior_rot_weight=0.01, prior_trans_weight=0.01)
    pts_list = []
    prev = -np.inf
    for i in range(n):
        pts, mask, ts01 = projection.scan_to_points(
            sensor.lut, jnp.asarray(scans[i]))
        m = np.asarray(mask)
        sel = np.where((imu_ts > prev) & (imu_ts <= scan_ts[i]))[0]
        prev = scan_ts[i]
        pts_list.append((np.asarray(pts, np.float64)[m],
                         np.asarray(ts01, np.float64)[m],
                         lacc[sel], avel[sel], imu_ts[sel]))
    t0 = time.monotonic()
    for p, t01, la, av, it in pts_list:
        ok.process(p, t01, la, av, it)
    dt = time.monotonic() - t0
    _, ate_rmse = calc_ate_rmse(np.asarray(ok.poses), gt_mid)
    return n / dt, float(ate_rmse)


def bench_replicas(scans, scan_ts, imu_ts, counts=(2, 4)):
    """Single-chip aggregate throughput with N replicas through the
    REPLICA-FUSED batched driver (parallel/batched.py).

    History: plain ``vmap``ped replicas COLLAPSE (r2 measured x2 ~ 11
    scans/s aggregate vs ~290 single) because the hash-map insert's
    batched scatters serialize ~5x worse than unbatched on TPU, while
    every dense stage scales ~2x at B=2. The batched driver fixes this by
    holding all replica maps in ONE flat hash table (disjoint slot ranges,
    replica id folded into the slot base) so the insert runs as plain
    unbatched scatters over the union of the replicas' new points — the
    rows below measure how much of the dense stages' ~2x headroom that
    recovers. Cross-chip, sequences still scale linearly via the 'bag'
    mesh axis (parallel/replay.py)."""
    import jax
    from ptudes_tpu.models import lio, sim
    from ptudes_tpu.parallel import batched, replay

    sensor = sim.make_sim_sensor(h=H, w=W, fov_deg=90.0)
    imu = sim.imu_for_circle(imu_ts, radius=RADIUS, speed=SPEED, ramp=RAMP)
    cfg = bench_config()
    base = lio.build_batches(
        cfg, scans, scan_ts, np.asarray(imu.lacc), np.asarray(imu.avel),
        imu_ts)
    out_rows = {}
    for r in counts:
        states = replay.stack_bags([lio.init_state(cfg) for _ in range(r)])
        batches = replay.stack_bags([base] * r)
        fin, out = batched.run_sequence_batched(
            states, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)
        t0 = time.monotonic()
        fin, out = batched.run_sequence_batched(
            states, batches, sensor.lut, cfg=cfg)
        jax.block_until_ready(out.kiss_pose)
        dt = time.monotonic() - t0
        out_rows[f"x{r}"] = round(r * N_SCANS / dt, 1)
    return out_rows


def _device_watchdog(
        timeout_s: float = float(
            os.environ.get("PTUDES_BENCH_DEVICE_TIMEOUT", 450.0)),
        max_retries: int = 2):
    """Fail loudly (instead of hanging forever) when the TPU tunnel is
    down: jax.devices() through the axon relay blocks indefinitely
    during pool outages — AND, ~1 in 3 fresh processes, on a
    per-connection wedge a concurrently started process would not hit.
    A daemon thread probes device acquisition; if nothing answers within
    the timeout the process RE-EXECS itself (fresh tunnel connection,
    the recovery that reliably works for the per-connection wedge) up to
    ``max_retries`` times before hard-exiting with a diagnostic."""
    import threading

    state = {"ok": False}

    def probe():
        import jax
        jax.devices()
        state["ok"] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()

    def reaper():
        t.join(timeout_s)
        if not state["ok"]:
            n = int(os.environ.get("PTUDES_BENCH_DEVICE_RETRY", "0"))
            # re-exec only works for real script invocations (python
            # foo.py ...); `python -c` loses its command string
            reexecable = bool(sys.argv and sys.argv[0] not in ("-c", ""))
            if n < max_retries and reexecable:
                print(
                    f"bench: no device within {timeout_s:.0f}s — "
                    f"re-exec retry {n + 1}/{max_retries} "
                    "(per-connection tunnel wedge)",
                    file=sys.stderr, flush=True)
                env = dict(os.environ)
                env["PTUDES_BENCH_DEVICE_RETRY"] = str(n + 1)
                os.execve(sys.executable,
                          [sys.executable] + sys.argv, env)
            print(f"bench: no device answered within {timeout_s:.0f}s "
                  f"after {max_retries} reconnect attempts (TPU tunnel "
                  "outage?) — aborting instead of hanging",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=reaper, daemon=True).start()


def main():
    verbose = os.environ.get("PTUDES_BENCH_VERBOSE")
    t00 = time.monotonic()
    _device_watchdog()

    def note(msg):
        if verbose:
            print(f"[bench +{time.monotonic() - t00:.0f}s] {msg}",
                  flush=True)

    scans, scan_ts, gt_mid, imu_ts = make_data()
    note("data ready")
    tpu = bench_tpu(scans, scan_ts, gt_mid, imu_ts)
    note(f"tpu done: {tpu['scans_per_sec']:.1f} scans/s")
    cpu_scans_per_sec, cpu_ate = bench_cpu_oracle(
        scans, scan_ts, gt_mid, imu_ts)
    note(f"oracle done: {cpu_scans_per_sec:.2f} scans/s ate {cpu_ate:.4f}")
    replicas = bench_replicas(scans, scan_ts, imu_ts)
    note("replicas done")
    result = {
        "metric": "lio_scans_per_sec_per_chip",
        "value": round(tpu["scans_per_sec"], 3),
        "unit": "scans/s (128x1024, ICP+EKF fused step)",
        "vs_baseline": round(tpu["scans_per_sec"] / cpu_scans_per_sec, 3),
        "baseline": {
            "what": "policy-identical f64 numpy LIO oracle on host CPU "
                    "(ES-EKF predict per IMU block, EKF-twist deskew, EKF "
                    "guess, EKF fusion of the ICP pose; per-registration "
                    "KD-tree exact NN), full 50-scan sequence (kiss-icp "
                    "C++ not available)",
            "cpu_scans_per_sec": round(cpu_scans_per_sec, 3),
            "cpu_ate_rmse_m": round(cpu_ate, 4),
        },
        # two quality gates, recorded separately (VERDICT r3 weak #3: the
        # oracle's 0.15 m ATE makes the relative gate too loose to catch a
        # TPU-side regression, so an ABSOLUTE ceiling is the binding one)
        "quality": {
            "ate_rmse_m": round(tpu["ate_rmse_m"], 4),
            "vs_oracle_ate": round(tpu["ate_rmse_m"] / max(cpu_ate, 1e-9),
                                   3),
            "gate_rel": "tpu ATE <= 1.05x oracle ATE",
            "gate_rel_pass": bool(tpu["ate_rmse_m"] <= 1.05 * cpu_ate),
            "gate_abs": "tpu ATE RMSE <= 0.02 m",
            "gate_abs_pass": bool(tpu["ate_rmse_m"] <= 0.02),
            "gate_pass": bool(tpu["ate_rmse_m"] <= 1.05 * cpu_ate
                              and tpu["ate_rmse_m"] <= 0.02),
        },
        "replica_aggregate_scans_per_sec": replicas,
        "replica_note": "replica-fused batched driver (parallel/batched.py"
                        "): replica maps in ONE flat table (insert "
                        "scatters unbatched) and r4's indices-only-vmap "
                        "candidate gathers (map in_axes=None). Plain vmap "
                        "collapses (r2: x2=10.8); the fused driver "
                        "recovers to x2~182/x4~298 aggregate but still "
                        "LOSES to serial per-chip (~452): per-row "
                        "gather/scatter cost scales with total rows, so "
                        "batching only amortizes the small fixed per-scan "
                        "cost. One sequence per chip is optimal for "
                        "throughput; the batched driver is a memory-"
                        "packing / sweep tool, and cross-chip scaling "
                        "uses the bag mesh axis (parallel/replay.py)",
        "compile_s": round(tpu["compile_s"], 1),
        "device": tpu["device"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
