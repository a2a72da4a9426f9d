"""f64 numpy/scipy oracle of the kiss-icp odometry algorithm (no JAX).

Used to A/B the TPU pipeline: same voxelization semantics (first point per
voxel), same adaptive threshold, same robust GN with per-iteration NN, but
exact KD-tree NN over a dynamic dict-based voxel map. Not part of the
shipped framework — a debugging/validation tool.
"""
import numpy as np
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation as R


def voxel_down(points, vs):
    keys = np.floor(points / vs).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(idx)]


def hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def exp_twist(dx):  # [rot, trans]
    T = np.eye(4)
    T[:3, :3] = R.from_rotvec(dx[:3]).as_matrix()
    theta = np.linalg.norm(dx[:3])
    w = dx[:3]
    K = hat(w)
    if theta < 1e-9:
        V = np.eye(3)
    else:
        V = (np.eye(3) + (1 - np.cos(theta)) / theta**2 * K
             + (theta - np.sin(theta)) / theta**3 * K @ K)
    T[:3, 3] = V @ dx[3:]
    return T


def log_pose(T):
    """se(3) log: [rotvec, V^-1 t]."""
    w = R.from_matrix(T[:3, :3]).as_rotvec()
    theta = np.linalg.norm(w)
    K = hat(w)
    if theta < 1e-9:
        Vinv = np.eye(3) - 0.5 * K
    else:
        Vinv = (np.eye(3) - 0.5 * K
                + (1.0 / theta**2)
                * (1.0 - theta * np.sin(theta) / (2.0 * (1.0 - np.cos(theta))))
                * (K @ K))
    return np.concatenate([w, Vinv @ T[:3, 3]])


def deskew_by_twist(pts, scales, twist):
    """Apply exp(scale_i * twist) per point (vectorized Rodrigues) — the
    same const-velocity mid-scan-anchor model as kiss-icp's compensator
    and the repo's ops/deskew.py."""
    w, v = twist[:3], twist[3:]
    theta2 = float(w @ w)
    theta = np.sqrt(theta2)
    if theta < 1e-8:
        return pts + scales[:, None] * v
    st = scales * theta
    sin_st, cos_st = np.sin(st), np.cos(st)
    a = sin_st / theta
    b = (1.0 - cos_st) / theta2
    wxp = np.cross(np.broadcast_to(w, pts.shape), pts)
    wwxp = np.cross(np.broadcast_to(w, pts.shape), wxp)
    rotated = pts + a[:, None] * wxp + b[:, None] * wwxp
    cc = (st - sin_st) / (theta2 * theta)
    wxv = np.cross(w, v)
    wwxv = np.cross(w, wxv)
    t = scales[:, None] * v + b[:, None] * wxv + cc[:, None] * wwxv
    return rotated + t


class OracleKiss:
    def __init__(self, voxel_size=0.3, max_range=30.0, min_range=1.0,
                 ppv=20, initial_threshold=2.0, min_motion=0.1,
                 max_iters=100):
        self.vs = voxel_size
        self.max_range = max_range
        self.min_range = min_range
        self.ppv = ppv
        self.sse = 0.0
        self.nsm = 0
        self.init_th = initial_threshold
        self.min_motion = min_motion
        self.max_iters = max_iters
        self.map = {}  # voxel key -> list of points
        self.poses = []

    def sigma(self):
        if self.nsm < 1:
            return self.init_th
        return np.sqrt(self.sse / self.nsm)

    def map_points(self):
        if not self.map:
            return np.zeros((0, 3))
        return np.concatenate([np.asarray(v) for v in self.map.values()])

    def insert(self, pts):
        keys = np.floor(pts / self.vs).astype(np.int64)
        for k, p in zip(map(tuple, keys), pts):
            lst = self.map.setdefault(k, [])
            if len(lst) < self.ppv:
                lst.append(p)

    def evict(self, origin):
        drop = [k for k, v in self.map.items()
                if np.linalg.norm(v[0] - origin) > self.max_range]
        for k in drop:
            del self.map[k]

    def register(self, pts, guess=None, ts01=None):
        if ts01 is not None and len(self.poses) >= 2:
            delta = np.linalg.inv(self.poses[-2]) @ self.poses[-1]
            pts = deskew_by_twist(pts, np.asarray(ts01) - 0.5,
                                  log_pose(delta))
        d = np.linalg.norm(pts, axis=1)
        pts = pts[(d > self.min_range) & (d < self.max_range)]
        frame_ds = voxel_down(pts, self.vs * 0.5)
        source = voxel_down(frame_ds, self.vs * 1.5)
        sig = self.sigma()
        if guess is None:
            if len(self.poses) >= 2:
                pred = np.linalg.inv(self.poses[-2]) @ self.poses[-1]
            else:
                pred = np.eye(4)
            guess = (self.poses[-1] if self.poses else np.eye(4)) @ pred

        T = guess.copy()
        mp = self.map_points()
        iters = 0
        if len(mp):
            tree = cKDTree(mp)
            kernel = sig / 3.0
            max_d = 3.0 * sig
            for it in range(self.max_iters):
                iters = it + 1
                src_w = pts_w = source @ T[:3, :3].T + T[:3, 3]
                dist, j = tree.query(src_w, distance_upper_bound=max_d)
                ok = np.isfinite(dist)
                r = src_w[ok] - mp[j[ok]]
                p = src_w[ok]
                w = kernel**2 / (kernel + np.sum(r * r, axis=1))**2
                # J = [-hat(p) | I], built vectorized (no per-point loop)
                J = np.zeros((len(p), 3, 6))
                J[:, 0, 1] = p[:, 2]
                J[:, 0, 2] = -p[:, 1]
                J[:, 1, 0] = -p[:, 2]
                J[:, 1, 2] = p[:, 0]
                J[:, 2, 0] = p[:, 1]
                J[:, 2, 1] = -p[:, 0]
                J[:, 0, 3] = J[:, 1, 4] = J[:, 2, 5] = 1.0
                Jw = J * w[:, None, None]
                JTJ = np.einsum("nij,nik->jk", Jw, J) + 1e-12 * np.eye(6)
                JTr = np.einsum("nij,ni->j", Jw, r)
                dx = np.linalg.solve(JTJ, -JTr)
                T = exp_twist(dx) @ T
                if np.linalg.norm(dx) < 1e-4:
                    break
        dev = np.linalg.inv(guess) @ T
        err = (np.linalg.norm(dev[:3, 3])
               + 2 * self.max_range * np.sin(
                   0.5 * np.linalg.norm(R.from_matrix(dev[:3, :3]).as_rotvec())))
        if err > self.min_motion:
            self.sse += err**2
            self.nsm += 1
        self.insert(frame_ds @ T[:3, :3].T + T[:3, 3])
        self.evict(T[:3, 3])
        self.poses.append(T)
        return T, iters, sig


if __name__ == "__main__":
    import sys
    sys.path.insert(0, ".")
    from ptudes_tpu.models import sim
    from ptudes_tpu.ops import projection
    import jax.numpy as jnp

    N = 30
    ts, poses = sim.circle_trajectory(N, radius=8.0, speed=2.0, scan_dt=0.1)
    world = sim.make_sim_world(seed=0, extent=25.0, n_boxes=40,
                               keepout_points=poses[:, :3, 3])
    sensor = sim.make_sim_sensor(h=64, w=512, fov_deg=45.0)
    gt0inv = np.linalg.inv(poses[0])
    ok = OracleKiss()
    errs = []
    for i in range(N):
        img = sim.render_range_image(world, poses[i], sensor, max_range=60.0,
                                     noise_std=0.01, seed=i)
        pts, mask, _ = projection.scan_to_points(sensor.lut, jnp.asarray(img))
        pts = np.asarray(pts, np.float64)[np.asarray(mask)]
        T, iters, sig = ok.register(pts)
        rel = gt0inv @ poses[i]
        err = np.linalg.norm(T[:3, 3] - rel[:3, 3])
        errs.append(err)
        print(f"scan {i}: err={err:.4f} it={iters} sig={sig:.3f} "
              f"map={sum(len(v) for v in ok.map.values())}", flush=True)
    print("ATE(mean-sq):", np.mean(np.square(errs)))
