"""Pallas TPU kernel: the ENTIRE robust GN ICP loop in one launch.

``ops.icp.register_frame_cached`` with frozen candidates runs the GN
iteration as an XLA ``while_loop`` whose body is one fused Pallas kernel
(~9 us) plus a scalar 6x6 solve / SE(3) update chain. Measured on the
bench shapes the loop costs ~550 us/scan of which the kernels are ~45 us
— the rest is the while-loop carry boundary (~100 us per trip through
the fused scan program) and the small-op scalar chain between kernels.

This module moves the *whole loop* inside one ``pallas_call``: the
``lax.while_loop`` becomes a Mosaic scalar loop around the vector body,
the 6x6 Cholesky solve, the motion-prior ``log``, and the SE(3) update
all run on the TPU scalar unit between vector passes, and the program
pays ONE kernel launch per registration instead of one launch + one
XLA loop boundary per GN step.

Semantics match ``register_frame_cached(gn_backend="pallas",
nn_refresh_drift=0.0)`` — frozen candidates, convergence-masked early
exit, robust point/plane dual loss, optional motion prior — with one
documented deviation: the in-kernel ``log`` of the prior's relative pose
uses the direct axis-angle formula (stable for |rot| well below pi)
instead of the quaternion path. ICP refinement poses stay within a few
degrees of the guess, far inside the stable range.

Reference behavior being replaced: the per-iteration C++ hot call
``kiss_icp::registration::register_frame`` (reference
``src/ptudes/kiss.py:108-114``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8  # small-angle switch, matches geom.so3._EPS

# scal SMEM layout (1, 32)
_S_KERN, _S_MAXD2, _S_PLQ, _S_CONV2 = 0, 1, 2, 3
_S_PRW, _S_PTW = 4, 5
_S_POSE = 8       # rows 8..19: guess, row-major [r00 r01 r02 t0; ...]
_S_POSE_INV = 20  # rows 20..31: inverse guess, same layout

# out SMEM layout (1, 16): 0..11 pose, 12 n_corr, 13 iters,
# 14 |trans(guess^-1 pose)|, 15 |log rot(guess^-1 pose)| (the model
# deviation the adaptive threshold consumes — computed in the kernel
# epilogue since guess_inv is already in SMEM)
_O_POSE, _O_NCORR, _O_ITERS, _O_DEVT, _O_DEVR = 0, 12, 13, 14, 15


def _solve_spd6_scalars(a, b):
    """Unrolled scalar Cholesky solve on 6x6 python lists of traced
    scalars (same algorithm as geom.linalg.solve_spd6)."""
    n = 6
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                l[i][j] = s / l[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s / l[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[k][i] * x[k]
        x[i] = s / l[i][i]
    return x


def _rodrigues_scalars(wx, wy, wz):
    """exp(rotvec) as 9 scalars (row-major), Rodrigues with the same
    small-angle series as geom.so3.exp_rotvec."""
    t2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(t2)
    small = theta < _EPS
    safe_t2 = jnp.where(small, 1.0, t2)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.sqrt(safe_t2))
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / safe_t2)
    # R = I + a K + b K^2, K = hat(w)
    xx, yy, zz = wx * wx, wy * wy, wz * wz
    xy, xz, yz = wx * wy, wx * wz, wy * wz
    r00 = 1.0 + b * (-yy - zz)
    r11 = 1.0 + b * (-xx - zz)
    r22 = 1.0 + b * (-xx - yy)
    r01 = -a * wz + b * xy
    r10 = a * wz + b * xy
    r02 = a * wy + b * xz
    r20 = -a * wy + b * xz
    r12 = -a * wx + b * yz
    r21 = a * wx + b * yz
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22), (theta, t2, a, b)


def _exp_twist_scalars(dx):
    """se(3) exp of a 6-twist [rot, trans] -> 3x4 scalars (R, t), same
    series as geom.se3.exp_twist."""
    wx, wy, wz = dx[0], dx[1], dx[2]
    vx, vy, vz = dx[3], dx[4], dx[5]
    rr, (theta, t2, _a, b) = _rodrigues_scalars(wx, wy, wz)
    small = theta < _EPS
    safe_t2 = jnp.where(small, 1.0, t2)
    c = jnp.where(
        small,
        1.0 / 6.0 - t2 / 120.0,
        (theta - jnp.sin(theta)) / (safe_t2 * jnp.sqrt(safe_t2)),
    )
    # V = I + b K + c K^2
    xx, yy, zz = wx * wx, wy * wy, wz * wz
    xy, xz, yz = wx * wy, wx * wz, wy * wz
    v00 = 1.0 + c * (-yy - zz)
    v11 = 1.0 + c * (-xx - zz)
    v22 = 1.0 + c * (-xx - yy)
    v01 = -b * wz + c * xy
    v10 = b * wz + c * xy
    v02 = b * wy + c * xz
    v20 = -b * wy + c * xz
    v12 = -b * wx + c * yz
    v21 = b * wx + c * yz
    tx = v00 * vx + v01 * vy + v02 * vz
    ty = v10 * vx + v11 * vy + v12 * vz
    tz = v20 * vx + v21 * vy + v22 * vz
    return rr, (tx, ty, tz)


def _compose_scalars(ra, ta, rb, tb):
    """(Ra, ta) o (Rb, tb): R = Ra Rb, t = Ra tb + ta (12-scalar pose)."""
    a00, a01, a02, a10, a11, a12, a20, a21, a22 = ra
    b00, b01, b02, b10, b11, b12, b20, b21, b22 = rb
    r = (
        a00 * b00 + a01 * b10 + a02 * b20,
        a00 * b01 + a01 * b11 + a02 * b21,
        a00 * b02 + a01 * b12 + a02 * b22,
        a10 * b00 + a11 * b10 + a12 * b20,
        a10 * b01 + a11 * b11 + a12 * b21,
        a10 * b02 + a11 * b12 + a12 * b22,
        a20 * b00 + a21 * b10 + a22 * b20,
        a20 * b01 + a21 * b11 + a22 * b21,
        a20 * b02 + a21 * b12 + a22 * b22,
    )
    t = (
        a00 * tb[0] + a01 * tb[1] + a02 * tb[2] + ta[0],
        a10 * tb[0] + a11 * tb[1] + a12 * tb[2] + ta[1],
        a20 * tb[0] + a21 * tb[1] + a22 * tb[2] + ta[2],
    )
    return r, t


def _acos_scalar(c):
    """arccos for Mosaic (no acos/atan lowering on TPU Pallas): Newton
    inversion of cos seeded with the half-angle identity
    ``theta0 = sqrt(2 (1 - c))`` (exact to O(theta^3)/24). Two steps reach
    f32 machine precision for theta < ~2 rad; degrades near pi where
    sin -> 0, which ICP refinement poses never approach."""
    x = jnp.sqrt(jnp.maximum(2.0 * (1.0 - c), 0.0))
    for _ in range(2):
        x = x + (jnp.cos(x) - c) / jnp.maximum(jnp.sin(x), _EPS)
    return x


def _log_pose_scalars(r, t):
    """SE(3) log as 6 scalars. Direct axis-angle formula (NOT the
    quaternion path geom.so3.log_rotmat uses): stable for |rot| << pi,
    which holds for any sane ICP refinement relative pose."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = r
    tr = r00 + r11 + r22
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = _acos_scalar(cos_t)
    t2 = theta * theta
    small = theta < 1e-4
    sin_t = jnp.sin(theta)
    # w = theta / (2 sin theta) * vee(R - R^T)
    fac = jnp.where(small, 0.5 + t2 / 12.0,
                    theta / jnp.maximum(2.0 * sin_t, _EPS))
    wx = fac * (r21 - r12)
    wy = fac * (r02 - r20)
    wz = fac * (r10 - r01)
    # V^{-1} = I - K/2 + cot_term K^2 (same series as geom.se3.log_pose)
    safe_t2 = jnp.where(small, 1.0, t2)
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS))
        / safe_t2,
    )
    xx, yy, zz = wx * wx, wy * wy, wz * wz
    xy, xz, yz = wx * wy, wx * wz, wy * wz
    i00 = 1.0 + cot_term * (-yy - zz)
    i11 = 1.0 + cot_term * (-xx - zz)
    i22 = 1.0 + cot_term * (-xx - yy)
    i01 = 0.5 * wz + cot_term * xy
    i10 = -0.5 * wz + cot_term * xy
    i02 = -0.5 * wy + cot_term * xz
    i20 = 0.5 * wy + cot_term * xz
    i12 = 0.5 * wx + cot_term * yz
    i21 = -0.5 * wx + cot_term * yz
    vx = i00 * t[0] + i01 * t[1] + i02 * t[2]
    vy = i10 * t[0] + i11 * t[1] + i12 * t[2]
    vz = i20 * t[0] + i21 * t[1] + i22 * t[2]
    return (wx, wy, wz, vx, vy, vz)


def _make_loop_kernel(max_iterations: int, use_prior: bool,
                      loop_mode: str = "while"):
    """Build the whole-loop kernel.

    LAYOUT: points are folded into full (NS, 128) vector-register tiles
    (NS = N/128) instead of [1, N] rows. A [1, N] value occupies one of
    the 8 sublanes of each vreg, so every elementwise op on it runs at
    1/8 VPU width — measured ~140 us per GN iteration for a dense pass
    whose full-width cost is ~10 us. Per-point quantities are (NS, 128),
    candidate tensors (C, NS, 128); all ~40 elementwise ops of the
    iteration then run on fully-packed vregs."""
    def kernel(src_ref, f_ref, cx_ref, cy_ref, cz_ref, inf_ref, scal_ref,
               out_ref):
        kern = scal_ref[0, _S_KERN]
        max_d2 = scal_ref[0, _S_MAXD2]
        plane_q = scal_ref[0, _S_PLQ]
        conv2 = scal_ref[0, _S_CONV2]
        prw = scal_ref[0, _S_PRW]
        ptw = scal_ref[0, _S_PTW]
        gi_r = tuple(scal_ref[0, _S_POSE_INV + k]
                     for k in (0, 1, 2, 4, 5, 6, 8, 9, 10))
        gi_t = tuple(scal_ref[0, _S_POSE_INV + k] for k in (3, 7, 11))

        src = src_ref[:]                               # [8, NS, 128]
        sx, sy, sz = src[0], src[1], src[2]            # [NS, 128]
        f = f_ref[:]
        nx, ny, nz = f[0], f[1], f[2]
        ccx, ccy, ccz = f[3], f[4], f[5]
        quality = f[6]
        mask = f[7]
        cx = cx_ref[:]                                 # [C, NS, 128]
        cy = cy_ref[:]
        cz = cz_ref[:]
        inf = inf_ref[:]
        row_id = jax.lax.broadcasted_iota(jnp.int32, cx.shape, 0)

        def body(carry):
            pose, _conv, _n_corr, iters = carry
            r = pose[:9]
            t = pose[9:]
            px = r[0] * sx + r[1] * sy + r[2] * sz + t[0]   # [NS, 128]
            py = r[3] * sx + r[4] * sy + r[5] * sz + t[1]
            pz = r[6] * sx + r[7] * sy + r[8] * sz + t[2]

            d2 = ((cx - px[None]) ** 2 + (cy - py[None]) ** 2
                  + (cz - pz[None]) ** 2 + inf)             # [C, NS, 128]
            d2min = jnp.min(d2, axis=0)                     # [NS, 128]
            hit_row = jnp.where(d2 == d2min[None], row_id,
                                jnp.int32(1 << 30))
            kmin = jnp.min(hit_row, axis=0)
            oneh = (row_id == kmin[None]).astype(jnp.float32)
            qx = jnp.sum(oneh * cx, axis=0)
            qy = jnp.sum(oneh * cy, axis=0)
            qz = jnp.sum(oneh * cz, axis=0)

            found = d2min < jnp.float32(1e30)
            corr = (mask > 0) & found & (d2min <= max_d2)

            s = nx * (px - ccx) + ny * (py - ccy) + nz * (pz - ccz)
            use_pl = corr & (quality >= plane_q)
            w_pl = jnp.where(use_pl, (kern * kern) / (kern + s * s) ** 2,
                             0.0)
            ax = py * nz - pz * ny
            ay = pz * nx - px * nz
            az = px * ny - py * nx

            use_pt = corr & jnp.logical_not(use_pl)
            w_pt = jnp.where(use_pt,
                             (kern * kern) / (kern + d2min) ** 2, 0.0)
            rx, ry, rz = px - qx, py - qy, pz - qz

            # ALL moment sums as ONE stacked lane reduction (the
            # pallas_gn._kernel formulation): ~50 separate jnp.sum calls
            # here serialized into ~50 cross-lane reduce ops and dominated
            # the iteration (~100 us measured); one [48, N] sum is a
            # single vector pass.
            mrows = [
                w_pt,
                w_pt * px, w_pt * py, w_pt * pz,
                w_pt * px * px, w_pt * py * py, w_pt * pz * pz,
                w_pt * px * py, w_pt * px * pz, w_pt * py * pz,
                w_pt * (py * rz - pz * ry),
                w_pt * (pz * rx - px * rz),
                w_pt * (px * ry - py * rx),
                w_pt * rx, w_pt * ry, w_pt * rz,
            ]
            rvec = (ax, ay, az, nx, ny, nz)
            for u in range(6):
                for v in range(u, 6):
                    mrows.append(w_pl * rvec[u] * rvec[v])
            for u in range(6):
                mrows.append(w_pl * rvec[u] * s)
            mrows.append(corr.astype(jnp.float32))
            mrows.append(w_pl)
            mrows += [jnp.zeros_like(w_pt)] * (48 - len(mrows))
            st = jnp.stack(mrows)                            # [48, NS, 128]
            sums = jnp.sum(jnp.sum(st, axis=2), axis=1,
                           keepdims=True)                    # [48, 1]

            sw = sums[0, 0]
            spx, spy, spz = sums[1, 0], sums[2, 0], sums[3, 0]
            pxx, pyy, pzz = sums[4, 0], sums[5, 0], sums[6, 0]
            pxy, pxz, pyz = sums[7, 0], sums[8, 0], sums[9, 0]
            cxr, cyr, czr = sums[10, 0], sums[11, 0], sums[12, 0]
            srx, sry, srz = sums[13, 0], sums[14, 0], sums[15, 0]

            # JtJ_pt = [trace*I - Spp, hat(Sp); -hat(Sp), Sw*I]
            trc = pxx + pyy + pzz
            zero = jnp.float32(0.0)
            a = [[None] * 6 for _ in range(6)]
            a[0][0] = trc - pxx
            a[1][1] = trc - pyy
            a[2][2] = trc - pzz
            a[0][1] = -pxy
            a[0][2] = -pxz
            a[1][2] = -pyz
            a[0][3] = zero
            a[0][4] = -spz
            a[0][5] = spy
            a[1][3] = spz
            a[1][4] = zero
            a[1][5] = -spx
            a[2][3] = -spy
            a[2][4] = spx
            a[2][5] = zero
            a[3][3] = sw
            a[4][4] = sw
            a[5][5] = sw
            a[3][4] = zero
            a[3][5] = zero
            a[4][5] = zero
            b = [cxr, cyr, czr, srx, sry, srz]

            # plane-branch row sums: row = [a | n], residual s
            k = 16
            for u in range(6):
                for v in range(u, 6):
                    a[u][v] = a[u][v] + sums[k, 0]
                    k += 1
            for u in range(6):
                b[u] = b[u] + sums[k, 0]
                k += 1
            for u in range(6):
                for v in range(u):
                    a[u][v] = a[v][u]

            n_corr = sums[43, 0]
            tot_w = sw + sums[44, 0]

            if use_prior:
                rel_r, rel_t = _compose_scalars(
                    (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8]),
                    (t[0], t[1], t[2]), gi_r, gi_t)
                xi = _log_pose_scalars(rel_r, rel_t)
                for u in range(6):
                    wp = tot_w * (prw if u < 3 else ptw)
                    a[u][u] = a[u][u] + wp
                    b[u] = b[u] + wp * xi[u]

            for u in range(6):
                a[u][u] = a[u][u] + jnp.float32(1e-8)
            dx = _solve_spd6_scalars(a, [-bb for bb in b])

            dr, dt = _exp_twist_scalars(dx)
            new_r, new_t = _compose_scalars(
                dr, dt,
                (r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7], r[8]),
                (t[0], t[1], t[2]))
            dx2 = (dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
                   + dx[3] * dx[3] + dx[4] * dx[4] + dx[5] * dx[5])
            return (new_r + new_t, dx2 < conv2, n_corr,
                    iters + jnp.int32(1))

        def cond(carry):
            return jnp.logical_and(jnp.logical_not(carry[1]),
                                   carry[3] < max_iterations)

        pose0 = tuple(scal_ref[0, _S_POSE + k]
                      for k in (0, 1, 2, 4, 5, 6, 8, 9, 10, 3, 7, 11))
        init = (pose0, jnp.asarray(False), jnp.float32(0.0),
                jnp.int32(0))
        if loop_mode == "while":
            pose, _, n_corr, iters = jax.lax.while_loop(cond, body, init)
        else:
            # fori + per-step cond skip: same early-exit economics (the
            # untaken branch skips the vector body) using only the
            # control-flow primitives the Pallas guide lists explicitly
            def fbody(_, carry):
                return jax.lax.cond(carry[1], lambda c: c, body, carry)

            pose, _, n_corr, iters = jax.lax.fori_loop(
                0, max_iterations, fbody, init)
        for k, sk in enumerate((0, 1, 2, 4, 5, 6, 8, 9, 10, 3, 7, 11)):
            out_ref[0, sk] = pose[k]
        out_ref[0, _O_NCORR] = n_corr
        out_ref[0, _O_ITERS] = iters.astype(jnp.float32)

        # model deviation dev = guess^-1 @ pose for the adaptive
        # threshold (kiss AdaptiveThreshold inputs,
        # reference src/ptudes/kiss.py:116-128)
        gi_r2 = tuple(scal_ref[0, _S_POSE_INV + k]
                      for k in (0, 1, 2, 4, 5, 6, 8, 9, 10))
        gi_t2 = tuple(scal_ref[0, _S_POSE_INV + k] for k in (3, 7, 11))
        dev_r, dev_t = _compose_scalars(
            gi_r2, gi_t2, tuple(pose[:9]), tuple(pose[9:]))
        out_ref[0, _O_DEVT] = jnp.sqrt(
            dev_t[0] ** 2 + dev_t[1] ** 2 + dev_t[2] ** 2)
        wlog = _log_pose_scalars(dev_r, (0.0, 0.0, 0.0))
        out_ref[0, _O_DEVR] = jnp.sqrt(
            wlog[0] ** 2 + wlog[1] ** 2 + wlog[2] ** 2)

    return kernel


@partial(jax.jit, inline=True, static_argnames=(
    "plane_min_quality", "max_iterations",
    "prior_rot_weight", "prior_trans_weight", "loop_mode", "interpret"))
def icp_loop_pallas(
    source: jax.Array,        # [N, 3] source points (body frame)
    prepped,                  # pallas_gn.PreppedCandidates
    initial_guess: jax.Array,  # [4, 4]
    kernel: jax.Array,
    max_d2: jax.Array,
    convergence: jax.Array | float = 1e-4,
    *,
    plane_min_quality: float = 0.2,
    max_iterations: int = 50,
    prior_rot_weight: float = 0.0,
    prior_trans_weight: float = 0.0,
    loop_mode: str = "while",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run the whole frozen-candidate GN ICP in one kernel launch.

    Returns (pose [4,4], n_corr, iters, dev_t, dev_r) — the pose triple
    identical (to f32 roundoff) to the XLA while_loop around
    ``pallas_gn.gn_prepped_pallas``, plus the model-deviation norms of
    ``guess^-1 @ pose`` computed in the kernel epilogue.
    """
    from ..geom import se3

    n = source.shape[0]
    c = prepped.cx.shape[0]
    assert n % 128 == 0, f"source capacity {n} must be lane-aligned"
    ns = n // 128

    src = jnp.concatenate(
        [source.astype(jnp.float32),
         jnp.zeros((n, 5), jnp.float32)], axis=1).T            # [8, N]
    guess = initial_guess.astype(jnp.float32)
    ginv = se3.inv(guess)
    scal = jnp.zeros((1, 32), jnp.float32)
    scal = scal.at[0, _S_KERN].set(kernel.astype(jnp.float32))
    scal = scal.at[0, _S_MAXD2].set(max_d2.astype(jnp.float32))
    scal = scal.at[0, _S_PLQ].set(plane_min_quality)
    conv = jnp.asarray(convergence, jnp.float32)
    scal = scal.at[0, _S_CONV2].set(conv * conv)
    scal = scal.at[0, _S_PRW].set(prior_rot_weight)
    scal = scal.at[0, _S_PTW].set(prior_trans_weight)
    scal = scal.at[0, _S_POSE:_S_POSE + 12].set(guess[:3].reshape(12))
    scal = scal.at[0, _S_POSE_INV:_S_POSE_INV + 12].set(
        ginv[:3].reshape(12))

    assert loop_mode in ("while", "fori_cond")
    kern_fn = _make_loop_kernel(
        max_iterations,
        use_prior=(prior_rot_weight > 0.0 or prior_trans_weight > 0.0),
        loop_mode=loop_mode)
    # fold points into full (NS, 128) vreg tiles (see _make_loop_kernel);
    # (*, N) -> (*, NS, 128) is layout-compatible (row-major)
    out = pl.pallas_call(
        kern_fn,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # src [8, NS, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # feat [8, NS, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cx [C, NS, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # inf
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal (1, 32)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        interpret=interpret,
    )(src.reshape(8, ns, 128), prepped.feat.reshape(8, ns, 128),
      prepped.cx.reshape(c, ns, 128), prepped.cy.reshape(c, ns, 128),
      prepped.cz.reshape(c, ns, 128), prepped.inf.reshape(c, ns, 128),
      scal)[0]

    pose = jnp.concatenate(
        [out[:12].reshape(3, 4),
         jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    return (pose, out[_O_NCORR].astype(jnp.int32),
            out[_O_ITERS].astype(jnp.int32),
            out[_O_DEVT], out[_O_DEVR])
