"""SO(3)/SE(3) geometry in JAX — foundation layer of ptudes-tpu."""
from . import so3, se3
from .so3 import (hat, vee, exp_rotvec, log_rotmat, quat_mul, quat_conj,
                  quat_rotate, quat_to_mat, mat_to_quat, quat_to_rotvec,
                  rotvec_to_quat, normalize_quat, quat_from_euler_xyz)
from .se3 import (make_pose, inv, transform, exp_twist, log_pose, interp,
                  frac_pose)

__all__ = [
    "so3", "se3", "hat", "vee", "exp_rotvec", "log_rotmat", "quat_mul",
    "quat_conj", "quat_rotate", "quat_to_mat", "mat_to_quat",
    "quat_to_rotvec", "rotvec_to_quat", "normalize_quat",
    "quat_from_euler_xyz", "make_pose", "inv", "transform", "exp_twist",
    "log_pose", "interp", "frac_pose",
]
