"""Trajectory file formats: KITTI and Newer College GT, with NC frame
transforms.

Numerically identical to the reference's writers/readers
(``src/ptudes/utils.py:191-252``), including the NC 2021 base<->IMU frame
conversion constants (``src/ptudes/utils.py:22-26``) and the save/restore
round-trip invariant the reference documents (``:207-211``).
"""
from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

# NC 2021 transforms (newer_college_2021/os_imu_lidar_transforms.yaml),
# reference src/ptudes/utils.py:22-26
NC_OS_IMU_TO_OS_SENSOR = np.eye(4)
NC_OS_IMU_TO_OS_SENSOR[:3, 3] = [-0.014, 0.012, 0.015]
NC_OS_SENSOR_TO_BASE = np.eye(4)
NC_OS_SENSOR_TO_BASE[:3, 3] = [0.001, 0.000, 0.091]
NC_OS_IMU_TO_BASE = NC_OS_SENSOR_TO_BASE @ NC_OS_IMU_TO_OS_SENSOR


def save_poses_kitti_format(
    filename: str, poses: np.ndarray, header: str = ""
) -> None:
    """[N, 4, 4] -> KITTI rows (first 3 pose rows flattened),
    reference ``src/ptudes/utils.py:191-196``."""
    poses = np.asarray(poses)
    rows = poses[:, :3, :].reshape(len(poses), 12)
    np.savetxt(fname=filename, X=rows, header=header)


def load_poses_kitti_format(filename: str) -> np.ndarray:
    rows = np.loadtxt(filename).reshape(-1, 12)
    poses = np.tile(np.eye(4), (len(rows), 1, 1))
    poses[:, :3, :] = rows.reshape(-1, 3, 4)
    return poses


def save_poses_nc_gt_format(
    filename: str, t: np.ndarray, poses: np.ndarray, header: str = ""
) -> None:
    """Save in NC GT CSV (sec, nsec, x, y, z, qx, qy, qz, qw), converting
    incoming IMU/nav-frame poses to the base frame
    (reference ``src/ptudes/utils.py:199-228``)."""
    t_arr = np.asarray(t, np.float64)
    poses_arr = np.einsum(
        "nij,jk->nik", np.asarray(poses, np.float64),
        np.linalg.inv(NC_OS_IMU_TO_BASE))
    res = np.zeros((len(t_arr), 9))
    res[:, 0] = np.floor(t_arr)
    res[:, 1] = np.floor((t_arr - res[:, 0]) * 1e9)
    res[:, 2:5] = poses_arr[:, :3, 3]
    res[:, 5:9] = Rotation.from_matrix(poses_arr[:, :3, :3]).as_quat()
    data_spec = "sec,nsec,x,y,z,qx,qy,qz,qw"
    if header:
        header += "\n\n" + data_spec
    np.savetxt(fname=filename, X=res, delimiter=", ", header=header)


def read_newer_college_gt(
    data_path: str, to_os_imu: bool = True
) -> list[tuple[float, np.ndarray]]:
    """Read NC GT poses, converted base -> Ouster IMU nav frame
    (reference ``src/ptudes/utils.py:231-252``)."""
    gt = np.loadtxt(data_path, delimiter=",")
    gt = gt.reshape(-1, gt.shape[-1])
    ts = gt[:, 0] + gt[:, 1] * 1e-9
    poses = np.tile(np.eye(4), (len(gt), 1, 1))
    poses[:, :3, 3] = gt[:, 2:5]
    poses[:, :3, :3] = Rotation.from_quat(gt[:, 5:9]).as_matrix()
    if to_os_imu:
        poses = np.einsum("nij,jk->nik", poses, NC_OS_IMU_TO_BASE)
    return [(t, p) for t, p in zip(ts, poses)]


def _nearest_idx(sorted_t: np.ndarray, query_t: np.ndarray) -> np.ndarray:
    """Index of the nearest element of ``sorted_t`` for each query."""
    if len(sorted_t) == 1:
        return np.zeros(len(query_t), np.int64)
    j = np.clip(np.searchsorted(sorted_t, query_t), 1, len(sorted_t) - 1)
    left_closer = (np.abs(sorted_t[j - 1] - query_t)
                   <= np.abs(sorted_t[j] - query_t))
    return j - left_closer.astype(np.int64)


def filter_nc_gt_by_close_ts(nc_gt, gt_t):
    """Nearest-timestamp matching of two non-decreasing streams — same
    pairs as the reference's greedy iterator walk
    (``src/ptudes/utils.py:255-302``), computed vectorized: a pair matches
    iff the timestamps are MUTUAL nearest neighbors within ``min_dt`` (the
    smaller of the two streams' minimum sample spacings), which is exactly
    the fixed point the greedy two-pointer algorithm advances to."""
    if not len(nc_gt):
        return nc_gt, []
    if not len(gt_t):
        return [], []
    nc_t = np.asarray([g[0] for g in nc_gt], np.float64)
    gt_arr = np.asarray(gt_t, np.float64)
    min_nc_t = np.min(np.diff(nc_t)) if len(nc_t) > 1 else np.inf
    min_gt_t = np.min(np.diff(gt_arr)) if len(gt_arr) > 1 else np.inf
    min_dt = min(min_nc_t, min_gt_t)

    j_of_i = _nearest_idx(gt_arr, nc_t)      # nearest gt for each nc
    i_of_j = _nearest_idx(nc_t, gt_arr)      # nearest nc for each gt
    ii = np.arange(len(nc_t))
    mutual = (i_of_j[j_of_i] == ii) & (
        np.abs(gt_arr[j_of_i] - nc_t) <= min_dt)
    idx = ii[mutual]
    return [nc_gt[i] for i in idx], [gt_t[j] for j in j_of_i[idx]]


def filter_nc_gt_by_cmp(nc_gt, nc_gt_cmp):
    """Closest subset matching of two pose lists
    (reference ``src/ptudes/utils.py:305-325``)."""
    gt_cmp_t = [g[0] for g in nc_gt_cmp]
    gt_matched, gt_cmp_t_matched = filter_nc_gt_by_close_ts(nc_gt, gt_cmp_t)
    gt_cmp_poses = []
    idx = 0
    for t_m in gt_cmp_t_matched:
        while gt_cmp_t[idx] != t_m:
            idx += 1
        gt_cmp_poses.append(nc_gt_cmp[idx][1])
        idx += 1
    assert len(gt_cmp_poses) == len(gt_cmp_t_matched)
    return gt_matched, list(zip(gt_cmp_t_matched, gt_cmp_poses))
