"""Synthetic data generators: IMU streams, lidar worlds, range-image scans.

Formalizes the reference's simulation-as-oracle test strategy (SURVEY.md
section 4): ``sim_imu`` mirrors the reference generator
(``src/ptudes/cli/ekf_bench.py:44-79``) but is seeded, vectorized and
array-valued; the lidar simulator adds what the reference never had — a
ray-consistent range-image renderer so the full LIO loop can be tested
end-to-end against analytic ground truth without real sensor data.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import GRAV
from ..geom import se3, so3
from ..ops.projection import XyzLut, make_xyz_lut
from .esekf import DOWN, Imu


def sim_imu_arrays(
    seed: int,
    n: int,
    *,
    freq: float = 100.0,
    acc_mean: np.ndarray | None = None,
    acc_std: float = 1.5,
    acc_noise_std: float = 0.4,
    acc_bias: np.ndarray | None = None,
    gyr_mean: np.ndarray | None = None,
    gyr_std: float = 1.0,
    gyr_noise_std: float = 0.2,
    gyr_bias: np.ndarray | None = None,
    gravity: np.ndarray | None = None,
) -> tuple[Imu, Imu]:
    """Piecewise-constant motion resampled every 10 ticks + white noise +
    fixed biases; returns stacked (ideal, noisy) IMU arrays of length n.

    Parameter defaults match the reference generator exactly
    (``src/ptudes/cli/ekf_bench.py:44-53``); unlike the reference, seeded.
    """
    rng = np.random.default_rng(seed)
    acc_mean = np.zeros(3) if acc_mean is None else acc_mean
    gyr_mean = np.zeros(3) if gyr_mean is None else gyr_mean
    acc_bias = np.array([0.9, -0.2, -0.4]) if acc_bias is None else acc_bias
    gyr_bias = np.array([0.01, 0.03, -0.012]) if gyr_bias is None else gyr_bias
    gravity = GRAV * np.array([0.0, 0.0, -1.0]) if gravity is None else gravity

    dt = 1.0 / freq
    nseg = (n + 9) // 10
    acc_seg = rng.normal(0.0, acc_std, (nseg, 3)) + acc_mean - gravity
    gyr_seg = rng.normal(0.0, gyr_std, (nseg, 3)) + gyr_mean
    acc = np.repeat(acc_seg, 10, axis=0)[:n]
    gyr = np.repeat(gyr_seg, 10, axis=0)[:n]

    acc_noise = rng.normal(0.0, acc_noise_std, (n, 3))
    gyr_noise = rng.normal(0.0, gyr_noise_std, (n, 3))
    ts = np.arange(n) * dt

    ideal = Imu(
        lacc=jnp.asarray(acc, jnp.float32),
        avel=jnp.asarray(gyr, jnp.float32),
        ts=jnp.asarray(ts, jnp.float32),
    )
    noisy = Imu(
        lacc=jnp.asarray(acc + acc_noise + acc_bias, jnp.float32),
        avel=jnp.asarray(gyr + gyr_noise + gyr_bias, jnp.float32),
        ts=jnp.asarray(ts, jnp.float32),
    )
    return ideal, noisy


def make_world(seed: int = 0, n: int = 60000, extent: float = 40.0) -> np.ndarray:
    """Structured static world point cloud: ground + perimeter walls +
    random boxes. Non-degenerate for point-to-point ICP."""
    rng = np.random.default_rng(seed)
    e = extent
    n_ground = n // 3
    ground = np.stack(
        [rng.uniform(-e, e, n_ground), rng.uniform(-e, e, n_ground),
         rng.normal(0, 0.02, n_ground)], -1)

    n_wall = n // 6
    walls = []
    for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1)]:
        w = np.zeros((n_wall, 3))
        w[:, axis] = sign * e + rng.normal(0, 0.02, n_wall)
        w[:, 1 - axis] = rng.uniform(-e, e, n_wall)
        w[:, 2] = rng.uniform(0, 8, n_wall)
        walls.append(w)

    n_box = n - n_ground - 4 * n_wall
    centers = rng.uniform(-e * 0.7, e * 0.7, (12, 3))
    centers[:, 2] = rng.uniform(0.5, 3, 12)
    sizes = rng.uniform(0.5, 3.0, (12, 3))
    which = rng.integers(0, 12, n_box)
    face = rng.integers(0, 3, n_box)
    u = rng.uniform(-1, 1, (n_box, 3))
    pts = centers[which] + u * sizes[which]
    # snap one coordinate to a face
    snap = np.sign(rng.uniform(-1, 1, n_box))
    pts[np.arange(n_box), face] = (
        centers[which, face] + snap * sizes[which, face])

    return np.vstack([ground, *walls, pts]).astype(np.float32)


class SimWorld(NamedTuple):
    """Analytic world: ground plane + 4 perimeter walls + axis-aligned boxes.

    Exact ray intersections -> range images with zero sampling noise, so the
    odometry noise floor in tests is set by the injected noise, not by the
    renderer (a point-sampled z-buffer has decimeter quantization artifacts
    that point-to-point ICP turns into systematic drag)."""
    extent: float
    wall_height: float
    box_lo: np.ndarray  # [K, 3]
    box_hi: np.ndarray  # [K, 3]


def make_sim_world(
    seed: int = 0,
    extent: float = 40.0,
    n_boxes: int = 14,
    wall_height: float = 8.0,
    keepout_points: np.ndarray | None = None,
    keepout_margin: float = 2.0,
) -> SimWorld:
    """``keepout_points`` (e.g. trajectory positions) reject boxes that the
    sensor would otherwise pass through (which blanks most of a scan)."""
    rng = np.random.default_rng(seed)
    lo_list, hi_list = [], []
    tries = 0
    while len(lo_list) < n_boxes and tries < n_boxes * 20:
        tries += 1
        center = rng.uniform(-extent * 0.75, extent * 0.75, 3)
        size = rng.uniform(0.6, 3.5, 3)
        center[2] = size[2]
        lo, hi = center - size, center + size
        if keepout_points is not None:
            closest = np.maximum(
                lo[None, :2] - keepout_points[:, :2],
                np.maximum(0.0, keepout_points[:, :2] - hi[None, :2]),
            )
            if np.min(np.linalg.norm(closest, axis=1)) < keepout_margin:
                continue
        lo_list.append(lo)
        hi_list.append(hi)
    return SimWorld(
        extent=extent,
        wall_height=wall_height,
        box_lo=np.asarray(lo_list, np.float64),
        box_hi=np.asarray(hi_list, np.float64),
    )


class SimSensor(NamedTuple):
    h: int
    w: int
    alt_deg: np.ndarray
    lut: XyzLut


def make_sim_sensor(h: int = 64, w: int = 1024, fov_deg: float = 45.0) -> SimSensor:
    """Uniform-altitude spinning lidar, zero azimuth offsets / beam origin —
    so the simulator's inverse projection is exact for our LUT model."""
    alt = np.linspace(fov_deg / 2, -fov_deg / 2, h)
    lut = make_xyz_lut(w, h, alt, np.zeros(h))
    return SimSensor(h=h, w=w, alt_deg=alt, lut=lut)


def render_range_image(
    world: SimWorld, pose: np.ndarray, sensor: SimSensor,
    max_range: float = 60.0, noise_std: float = 0.0, seed: int = 0,
    end_pose: np.ndarray | None = None,
) -> np.ndarray:
    """Analytic raycast renderer: world -> [H, W] range image (meters,
    0 = no return), staggered (measurement-id) column order to match the
    projection LUT.

    With ``end_pose`` given, each column m is rendered from the pose
    interpolated at fraction m/W between ``pose`` and ``end_pose`` — a true
    rotosweep, which is what the constant-velocity deskew undoes.
    """
    h, w = sensor.h, sensor.w
    dirs = np.asarray(sensor.lut.direction, np.float64)       # [H, W, 3]

    if end_pose is None:
        r_w = pose[:3, :3]
        origins = np.broadcast_to(pose[:3, 3], (h, w, 3))
        d = dirs @ r_w.T
    else:
        # per-column linear pose interpolation (adequate for small motion)
        frac = (np.arange(w) / w)[None, :, None]
        t0, t1 = pose[:3, 3], end_pose[:3, 3]
        origins = np.broadcast_to(
            (1 - frac) * t0 + frac * t1, (h, w, 3)).copy()
        # rotation slerp via rotvec (small-angle): R0 @ exp(f * log(R0^T R1))
        from scipy.spatial.transform import Rotation as _R
        dr = _R.from_matrix(pose[:3, :3].T @ end_pose[:3, :3]).as_rotvec()
        cols = _R.from_rotvec((np.arange(w) / w)[:, None] * dr).as_matrix()
        r_cols = pose[:3, :3] @ cols                          # [W, 3, 3]
        d = np.einsum("wij,hwj->hwi", r_cols, dirs)

    o = origins.reshape(-1, 3)
    d = d.reshape(-1, 3)
    tbest = np.full(len(d), np.inf)

    eps = 1e-12
    e, wh = world.extent, world.wall_height

    def consider(t, hit_ok):
        nonlocal tbest
        good = hit_ok & (t > 0.3) & (t < tbest)
        tbest = np.where(good, t, tbest)

    # ground plane z = 0 within |x|,|y| <= e
    t = -o[:, 2] / np.where(np.abs(d[:, 2]) < eps, eps, d[:, 2])
    px, py = o[:, 0] + t * d[:, 0], o[:, 1] + t * d[:, 1]
    consider(t, (t > 0) & (np.abs(px) <= e) & (np.abs(py) <= e))

    # 4 perimeter walls
    for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1)]:
        da = np.where(np.abs(d[:, axis]) < eps, eps, d[:, axis])
        t = (sign * e - o[:, axis]) / da
        pu = o[:, 1 - axis] + t * d[:, 1 - axis]
        pz = o[:, 2] + t * d[:, 2]
        consider(t, (t > 0) & (np.abs(pu) <= e) & (pz >= 0) & (pz <= wh))

    # boxes: AABB slab test
    for lo, hi in zip(world.box_lo, world.box_hi):
        dd = np.where(np.abs(d) < eps, eps, d)
        t1 = (lo[None] - o) / dd
        t2 = (hi[None] - o) / dd
        tmin = np.minimum(t1, t2).max(axis=1)
        tmax = np.maximum(t1, t2).min(axis=1)
        consider(tmin, (tmin <= tmax) & (tmin > 0))

    img = tbest.reshape(h, w)
    img = np.where(np.isfinite(img) & (img < max_range), img, 0.0)
    if noise_std > 0:
        rng = np.random.default_rng(seed)
        img = np.where(img > 0, img + rng.normal(0, noise_std, img.shape), 0.0)
    return img.astype(np.float32)


def _circle_kinematics(
    t: np.ndarray, radius: float, speed: float, ramp: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arc angle, angular rate and tangential acceleration at times ``t``
    for a circle driven at speed ``v(t) = speed * min(1, t/ramp)``.

    ``ramp > 0`` makes the platform start AT REST and accelerate — the
    physically realistic profile (every real recording starts stationary;
    an instantaneous 2 m/s start defeats both the const-velocity and the
    EKF initial guess, which no odometry bootstraps through).
    """
    t = np.asarray(t, np.float64)
    if ramp <= 0.0:
        arc = speed * t
        v = np.full_like(t, speed)
        at = np.zeros_like(t)
    else:
        tr = np.minimum(t, ramp)
        # distance: 0.5*speed/ramp*t^2 while ramping, linear after
        arc = 0.5 * speed / ramp * tr**2 + speed * np.maximum(t - ramp, 0.0)
        v = speed * np.minimum(t / ramp, 1.0)
        at = np.where(t < ramp, speed / ramp, 0.0)
    return arc / radius, v / radius, at


def circle_poses_at(
    t: np.ndarray,
    *,
    radius: float = 8.0,
    speed: float = 2.0,
    ramp: float = 0.0,
    z: float = 1.2,
) -> np.ndarray:
    """Exact poses [len(t), 4, 4] of the (optionally speed-ramped) circle
    at arbitrary times — use for mid-sweep ground truth."""
    a, _, _ = _circle_kinematics(t, radius, speed, ramp)
    pos = np.stack(
        [radius * np.sin(a), radius * (1 - np.cos(a)),
         np.full_like(a, z)], -1)
    poses = np.tile(np.eye(4), (len(a), 1, 1))
    ca, sa = np.cos(a), np.sin(a)
    poses[:, 0, 0], poses[:, 0, 1] = ca, -sa
    poses[:, 1, 0], poses[:, 1, 1] = sa, ca
    poses[:, :3, 3] = pos
    return poses.astype(np.float64)


def circle_trajectory(
    n_scans: int,
    *,
    radius: float = 8.0,
    speed: float = 2.0,
    scan_dt: float = 0.1,
    z: float = 1.2,
    ramp: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Circular trajectory with tangent heading (``ramp`` > 0: start at
    rest, reach ``speed`` after ``ramp`` seconds).

    Returns (ts [n], poses [n, 4, 4]). Analytic, so IMU ground truth is
    exact (see :func:`imu_for_circle`).
    """
    ts = np.arange(n_scans) * scan_dt
    return ts, circle_poses_at(ts, radius=radius, speed=speed, ramp=ramp,
                               z=z)


def imu_for_circle(
    imu_ts: np.ndarray, *, radius: float = 8.0, speed: float = 2.0,
    ramp: float = 0.0,
) -> Imu:
    """Exact IMU (specific force + body rates) for :func:`circle_trajectory`.

    Accelerometer measures f_b = R^T (a_world - g) with g = GRAV * DOWN;
    gyro measures omega_b = [0, 0, omega(t)].
    """
    a, omega, at = _circle_kinematics(imu_ts, radius, speed, ramp)
    v = omega * radius
    # world accel = tangential + centripetal
    ca, sa = np.cos(a), np.sin(a)
    tangent = np.stack([ca, sa], -1)
    normal = np.stack([-sa, ca], -1)
    acc2d = at[:, None] * tangent + (v**2 / radius)[:, None] * normal
    acc_world = np.concatenate([acc2d, np.zeros_like(a)[:, None]], -1)
    g = GRAV * np.array([0.0, 0.0, -1.0])
    # R = yaw(a); f_b = R^T (a_world - g)
    fx = ca * (acc_world[:, 0] - g[0]) + sa * (acc_world[:, 1] - g[1])
    fy = -sa * (acc_world[:, 0] - g[0]) + ca * (acc_world[:, 1] - g[1])
    fz = np.full_like(a, -g[2])
    lacc = np.stack([fx, fy, fz], -1)
    avel = np.stack(
        [np.zeros_like(a), np.zeros_like(a), omega], -1)
    return Imu(
        lacc=jnp.asarray(lacc, jnp.float32),
        avel=jnp.asarray(avel, jnp.float32),
        ts=jnp.asarray(imu_ts, jnp.float32),
    )
