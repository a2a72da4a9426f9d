"""Robust ICP (Gauss-Newton) against the voxel hash map.

TPU-native equivalent of ``kiss_icp.registration.register_frame`` (reference
call site ``src/ptudes/kiss.py:108-114``): the hottest code of the whole
reference pipeline (SURVEY.md section 3.1).

Two loss modes:

``loss="point"`` — kiss-icp parity: point-to-point with the robust weight
    w(r^2) = kernel^2 / (kernel + r^2)^2, kernel = sigma/3, correspondences
    re-searched each iteration within 3*sigma, J_i = [-hat(p_i) | I3] at
    the transformed point, update T <- exp(dx) @ T, early stop at
    ||dx|| < 1e-4 realised as a convergence mask inside a fixed-trip-count
    ``lax.fori_loop``.

``loss="plane"`` (default in the LIO pipeline) — point-to-plane using
    normals fitted on the fly from each matched voxel's stored points
    (``ops.plane``): residual s = n . (p - centroid), row = [(p x n), n].
    Correspondences whose voxel is non-planar (planarity below threshold
    or too few points) fall back to the point-to-point residual, so sparse
    structure still constrains the solve. Point-to-plane removes the
    sampling-pattern tangential forces ("ring-lock") that make pure
    point-to-point odometry wobble and smear the map on flat ground —
    a deliberate improvement over the reference (LOAM/FAST-LIO lineage).

TPU mapping: the NN search is gather-bound (hash map probes); the GN build
is one einsum over stacked row Jacobians on the MXU. A Tikhonov floor keeps
the 6x6 solve nonsingular, which also yields dx = 0 on an empty map — the
first frame then returns the initial guess exactly like kiss does.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3, so3
from . import hashmap
from .plane import voxel_plane


class IcpResult(NamedTuple):
    pose: jax.Array        # [4, 4] refined pose (world_T_scan)
    num_corr: jax.Array    # correspondences used in the last iteration
    iterations: jax.Array  # iterations until convergence (== max if never)


@partial(
    jax.jit,
    static_argnames=(
        "voxel_size", "max_probes", "max_iterations", "approx", "loss",
        "plane_min_quality", "prior_rot_weight", "prior_trans_weight",
        "neighborhood",
    ),
)
def register_frame(
    source: jax.Array,        # [N, 3] deskewed, voxelized source points
    source_mask: jax.Array,   # [N] bool
    vmap_: hashmap.VoxelHashMap,
    initial_guess: jax.Array,  # [4, 4]
    max_distance: jax.Array,   # scalar: 3 * sigma
    kernel: jax.Array,         # scalar: sigma / 3
    *,
    voxel_size: float,
    max_probes: int = 4,
    max_iterations: int = 50,
    convergence: float = 1e-4,
    approx: bool = True,
    loss: str = "point",
    plane_min_quality: float = 0.2,
    prior_rot_weight: float = 0.0,
    prior_trans_weight: float = 0.0,
    neighborhood: int = 27,
) -> IcpResult:
    """Run fixed-iteration robust GN ICP; returns the refined world pose.

    ``prior_*_weight`` > 0 adds a motion-prior penalty pulling the solution
    toward ``initial_guess`` (the constant-velocity or EKF prediction):
    cost += w * Sum(corr_weights) * ||log(T @ guess^-1)||^2 per component
    group. This bounds how far sampling-noise forces can random-walk the
    pose when the point cost is locally flat — the failure mode of pure
    ICP odometry on self-similar geometry. Weights are relative to the
    total correspondence weight, so the prior scales with scene support.
    Zero (kiss parity) disables it.
    """
    assert loss in ("point", "plane")
    max_d2 = max_distance * max_distance
    n = source.shape[0]
    eye3 = jnp.eye(3, dtype=jnp.float32)
    guess_inv = se3.inv(initial_guess.astype(jnp.float32))

    def body(carry):
        t_cur, converged, n_corr, iters = carry

        pts_w = se3.transform(t_cur, source)
        res = hashmap.query(
            vmap_, pts_w, voxel_size=voxel_size, max_probes=max_probes,
            approx=approx, neighborhood=neighborhood,
        )
        corr = source_mask & res.found & (res.d2 <= max_d2)
        r_vec = pts_w - res.nn                               # [N, 3]

        if loss == "plane":
            vox_pts = vmap_.points.at[res.slot].get(
                mode="fill", fill_value=0.0)                 # [N, P, 3]
            cnt = vmap_.meta.at[res.slot, 1].get(mode="fill", fill_value=0)
            normal, centroid, quality = voxel_plane(vox_pts, cnt)
            use_plane = corr & (quality >= plane_min_quality)
            s = jnp.sum(normal * (pts_w - centroid), axis=-1)  # [N]
            w_pl = jnp.where(
                use_plane,
                (kernel * kernel) / jnp.square(kernel + s * s), 0.0)
            row = jnp.concatenate(
                [jnp.cross(pts_w, normal), normal], axis=-1)  # [N, 6]
            jtj_pl = jnp.einsum("ni,nj->ij", row * w_pl[:, None], row)
            jtr_pl = jnp.einsum("ni,n->i", row * w_pl[:, None], s)

            use_point = corr & ~use_plane
        else:
            use_point = corr
            jtj_pl = jnp.zeros((6, 6), jnp.float32)
            jtr_pl = jnp.zeros((6,), jnp.float32)

        w_pt = jnp.where(
            use_point,
            (kernel * kernel) / jnp.square(kernel + res.d2), 0.0)
        hat_p = so3.hat(pts_w)                               # [N, 3, 3]
        j = jnp.concatenate(
            [-hat_p, jnp.broadcast_to(eye3, (n, 3, 3))], axis=-1)
        jw = j * w_pt[:, None, None]
        jtj = jnp.einsum("nij,nik->jk", jw, j) + jtj_pl
        jtr = jnp.einsum("nij,ni->j", jw, r_vec) + jtr_pl

        if prior_rot_weight > 0.0 or prior_trans_weight > 0.0:
            # motion prior: penalize xi = log(T @ guess^-1) (left twist);
            # d xi / d dx = I to first order, so it adds a diagonal block
            # and a restoring force
            total_w = jnp.sum(w_pt) + (
                jnp.sum(w_pl) if loss == "plane" else 0.0)
            xi = se3.log_pose(t_cur @ guess_inv)             # [6] rot,trans
            wp = total_w * jnp.asarray(
                [prior_rot_weight] * 3 + [prior_trans_weight] * 3,
                jnp.float32)
            jtj = jtj + jnp.diag(wp)
            jtr = jtr + wp * xi

        # Tikhonov floor: invertible with zero correspondences -> dx = 0
        jtj = jtj + 1e-8 * jnp.eye(6, dtype=jtj.dtype)
        dx = jnp.linalg.solve(jtj, -jtr)
        dx = jnp.where(converged, 0.0, dx)

        t_new = se3.exp_twist(dx) @ t_cur
        now_conv = jnp.linalg.norm(dx) < convergence
        iters = jnp.where(converged, iters, iters + 1)
        return (
            t_new,
            converged | now_conv,
            jnp.where(converged, n_corr, jnp.sum(corr)),
            iters,
        )

    def cond(carry):
        _, converged, _, iters = carry
        return jnp.logical_and(~converged, iters < max_iterations)

    init = (
        initial_guess.astype(jnp.float32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    # while_loop exits as soon as the convergence mask latches — on
    # typical scans that is 5-15 iterations instead of the worst case
    t_final, _, n_corr, iters = jax.lax.while_loop(cond, body, init)
    return IcpResult(pose=t_final, num_corr=n_corr, iterations=iters)
