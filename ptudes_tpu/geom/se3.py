"""SE(3) primitives in JAX.

Replaces ``ouster.sdk.pose_util`` pose helpers used across the reference
(``log_pose`` in ``src/ptudes/utils.py:143``, ``exp_pose6`` /
``TrajectoryEvaluator`` interpolation in ``src/ptudes/fly.py:173-174`` and
``src/ptudes/utils.py:368``).

Poses are 4x4 homogeneous matrices (..., 4, 4). Twists are 6-vectors
``[rot(3), trans(3)]`` — rotation first, matching ouster's ``log_pose``
layout that the reference relies on (``prune_trajectory`` reads ``pd[:3]``
as angle and ``pd[3:]`` as distance, reference ``src/ptudes/utils.py:143-146``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import so3

_EPS = 1e-8


def make_pose(r: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4) pose."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def rot(p: jax.Array) -> jax.Array:
    return p[..., :3, :3]


def trans(p: jax.Array) -> jax.Array:
    return p[..., :3, 3]


def inv(p: jax.Array) -> jax.Array:
    """Inverse of a rigid pose (exact, no linear solve)."""
    rt = jnp.swapaxes(rot(p), -1, -2)
    return make_pose(rt, -jnp.einsum("...ij,...j->...i", rt, trans(p)))


def transform(p: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply pose(s) to points: (..., 4, 4) x (..., N, 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", rot(p), pts) + trans(p)[..., None, :]


def exp_twist(tw: jax.Array) -> jax.Array:
    """se(3) exp: twist (..., 6) [rot, trans] -> pose (..., 4, 4)."""
    w = tw[..., :3]
    v = tw[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    r = so3.exp_rotvec(w)
    # V = I + (1-cos)/t^2 K + (t - sin t)/t^3 K^2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (safe_t2 * jnp.sqrt(safe_t2)),
    )
    k = so3.hat(w)
    kk = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tw.dtype), k.shape)
    vmat = eye + b[..., None, None] * k + c[..., None, None] * kk
    t = jnp.einsum("...ij,...j->...i", vmat, v)
    return make_pose(r, t)


def log_pose(p: jax.Array) -> jax.Array:
    """SE(3) log: pose (..., 4, 4) -> twist (..., 6) [rot, trans]."""
    w = so3.log_rotmat(rot(p))
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _EPS
    safe_t2 = jnp.where(small, 1.0, theta2)
    k = so3.hat(w)
    kk = k @ k
    # V^{-1} = I - K/2 + (1/t^2)(1 - t sin t / (2 (1-cos t))) K^2
    half_t = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_t * jnp.cos(half_t) / jnp.maximum(jnp.sin(half_t), _EPS))
        / safe_t2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), k.shape)
    vinv = eye - 0.5 * k + cot_term[..., None, None] * kk
    v = jnp.einsum("...ij,...j->...i", vinv, trans(p))
    return jnp.concatenate([w, v], axis=-1)


def interp(p0: jax.Array, p1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Geodesic pose interpolation: p(alpha) = p0 @ exp(alpha * log(p0^-1 p1)).

    The TrajectoryEvaluator equivalent (reference ``src/ptudes/utils.py:368``)
    builds on this; the per-point deskew uses the fractional form directly.
    """
    d = log_pose(inv(p0) @ p1)
    return p0 @ exp_twist(alpha[..., None] * d)


def frac_pose(p: jax.Array, alpha: jax.Array) -> jax.Array:
    """Fractional pose: exp(alpha * log(p)). alpha may be batched (...,)."""
    return exp_twist(alpha[..., None] * log_pose(p))
