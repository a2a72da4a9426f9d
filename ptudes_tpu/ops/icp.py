"""Robust point-to-point ICP (Gauss-Newton) against the voxel hash map.

TPU-native equivalent of ``kiss_icp.registration.register_frame`` (reference
call site ``src/ptudes/kiss.py:108-114``): the hottest code of the whole
reference pipeline (SURVEY.md section 3.1).

Faithful to kiss-icp's algorithm:
  * correspondences re-searched every iteration within
    ``max_correspondance_distance`` (= 3 * adaptive sigma),
  * robust weight  w(r^2) = kernel^2 / (kernel + r^2)^2  with
    kernel = sigma / 3 (kiss Registration.cpp ``Weight``),
  * Jacobian  J_i = [ -hat(p_i) | I3 ]  at the transformed point (world
    frame, left perturbation),
  * update  T <- exp(dx) @ T,  early stop ||dx|| < 1e-4 — realised here as
    a convergence mask inside a fixed-iteration ``lax.fori_loop`` so shapes
    and trip counts stay static for XLA.

TPU mapping: the NN search is gather-bound (hash map probes); the GN build
is one (6 x 3N) @ (3N x 6) matmul on the MXU via einsum over [N, 3, 6]
stacked Jacobians. A Tikhonov floor keeps the 6x6 solve nonsingular, which
also yields dx = 0 on an empty map — the first frame then returns the
initial guess exactly like kiss does.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom import se3, so3
from . import hashmap


class IcpResult(NamedTuple):
    pose: jax.Array        # [4, 4] refined pose (world_T_scan)
    num_corr: jax.Array    # correspondences used in the last iteration
    iterations: jax.Array  # iterations until convergence (== max if never)


def _build_system(
    pts_w: jax.Array,     # [N, 3] source transformed to world
    nn: jax.Array,        # [N, 3] matched map points
    w: jax.Array,         # [N] robust weight (0 for unmatched)
) -> tuple[jax.Array, jax.Array]:
    """Weighted GN normal equations. Twist layout [rot, trans]."""
    r = pts_w - nn                                           # [N, 3]
    # J_i (3x6) = [ -hat(p) | I3 ] ; build stacked [N, 3, 6]
    n = pts_w.shape[0]
    hat_p = so3.hat(pts_w)                                   # [N, 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pts_w.dtype), (n, 3, 3))
    j = jnp.concatenate([-hat_p, eye], axis=-1)              # [N, 3, 6]
    jw = j * w[:, None, None]
    jtj = jnp.einsum("nij,nik->jk", jw, j)                   # [6, 6] (MXU)
    jtr = jnp.einsum("nij,ni->j", jw, r)                     # [6]
    return jtj, jtr


@partial(
    jax.jit,
    static_argnames=("voxel_size", "max_probes", "max_iterations", "approx"),
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
) -> IcpResult:
    """Run fixed-iteration robust GN ICP; returns the refined world pose."""
    max_d2 = max_distance * max_distance

    def body(_, carry):
        t_cur, converged, n_corr, iters = carry

        pts_w = se3.transform(t_cur, source)
        nn, d2, found = hashmap.query(
            vmap_, pts_w, voxel_size=voxel_size, max_probes=max_probes,
            approx=approx,
        )
        corr = source_mask & found & (d2 <= max_d2)
        w = jnp.where(
            corr, (kernel * kernel) / jnp.square(kernel + d2), 0.0
        )
        jtj, jtr = _build_system(pts_w, nn, w)
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

    init = (
        initial_guess.astype(jnp.float32),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    t_final, _, n_corr, iters = jax.lax.fori_loop(
        0, max_iterations, body, init
    )
    return IcpResult(pose=t_final, num_corr=n_corr, iterations=iters)
