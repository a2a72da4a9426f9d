"""Pallas TPU kernel: one fused ICP Gauss-Newton iteration.

The dense per-iteration pass of the cached-candidate ICP
(``ops.icp.gn_from_candidates``) is ~50 small XLA ops over [N, C] and
[N, 3, 6] intermediates — per-op launch overhead dominates at ~0.3 ms per
iteration. This kernel fuses the whole pass into ONE pallas_call:

    candidate distances -> masked NN select -> robust weights
    -> point-to-plane rows / point-to-point moments -> 6x6 normal equations

Layout: POINTS LIVE ON LANES. Per-point scalars are [1, N] rows, candidate
matrices are [C, N] — every elementwise op runs at full 8x128 VPU width
and the final moment sums are lane reductions of one stacked [K, N] matrix.

The normal equations are accumulated as closed-form moment sums (no
[N, 3, 6] Jacobian materialization):

point-to-point, J = [-hat(p) | I], residual r = p - q:
    JtJ = [ sum w (|p|^2 I - p p^T),  sum w hat(p) ;
            -sum w hat(p),            sum w I       ]
    Jtr = [ sum w (p x r) ; sum w r ]

point-to-plane, row = [p x n | n], residual s = n . (p - c):
    JtJ += sum w row row^T   (21 unique entries)
    Jtr += sum w row s

Grid: blocks of points along lanes; the accumulator output is revisited by
every grid step (TPU grids execute sequentially), initialized at step 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048   # points per grid step (lanes)

# accumulator row layout (out shape [_N_ACC, 128], col 0 used)
_PT_W, _PT_P, _PT_PP, _PT_PXR, _PT_R = 0, 1, 4, 10, 13   # point moments
_PL_RR, _PL_RS = 16, 37                                  # plane row sums
_N_CORR, _TOT_W = 43, 44
_N_ACC = 48  # padded to a whole sublane tile


def _kernel(pt_ref, f_ref, cx_ref, cy_ref, cz_ref, inf_ref, scal_ref,
            acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    kern = scal_ref[0, 0]
    max_d2 = scal_ref[0, 1]
    plane_q = scal_ref[0, 2]

    pt = pt_ref[:]                                 # [8, BLK] (pose-varying)
    px, py, pz = pt[0:1, :], pt[1:2, :], pt[2:3, :]
    f = f_ref[:]                                   # [8, BLK] (gather-static)
    nx, ny, nz = f[0:1, :], f[1:2, :], f[2:3, :]
    ccx, ccy, ccz = f[3:4, :], f[4:5, :], f[5:6, :]
    quality = f[6:7, :]
    mask = f[7:8, :]

    cx = cx_ref[:]                                 # [C, BLK]
    cy = cy_ref[:]
    cz = cz_ref[:]
    d2 = ((cx - px) ** 2 + (cy - py) ** 2 + (cz - pz) ** 2
          + inf_ref[:])                            # [C, BLK]
    d2min = jnp.min(d2, axis=0, keepdims=True)     # [1, BLK]
    # first-occurrence one-hot: min candidate row index among the minima
    row_id = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    hit_row = jnp.where(d2 == d2min, row_id, jnp.int32(1 << 30))
    kmin = jnp.min(hit_row, axis=0, keepdims=True)
    oneh = (row_id == kmin).astype(jnp.float32)
    qx = jnp.sum(oneh * cx, axis=0, keepdims=True)  # NN coords [1, BLK]
    qy = jnp.sum(oneh * cy, axis=0, keepdims=True)
    qz = jnp.sum(oneh * cz, axis=0, keepdims=True)

    found = d2min < jnp.float32(1e30)
    corr = (mask > 0) & found & (d2min <= max_d2)

    # plane branch
    s = nx * (px - ccx) + ny * (py - ccy) + nz * (pz - ccz)
    use_pl = corr & (quality >= plane_q)
    w_pl = jnp.where(use_pl, (kern * kern) / (kern + s * s) ** 2, 0.0)
    ax = py * nz - pz * ny                          # a = p x n
    ay = pz * nx - px * nz
    az = px * ny - py * nx

    # point branch
    use_pt = corr & jnp.logical_not(use_pl)
    w_pt = jnp.where(use_pt, (kern * kern) / (kern + d2min) ** 2, 0.0)
    rx, ry, rz = px - qx, py - qy, pz - qz

    # stacked [K, BLK] product matrix -> ONE lane reduction
    rows = [
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
            rows.append(w_pl * rvec[u] * rvec[v])
    for u in range(6):
        rows.append(w_pl * rvec[u] * s)
    rows.append(corr.astype(jnp.float32))
    rows.append(w_pt + w_pl)
    rows += [jnp.zeros_like(w_pt)] * (_N_ACC - len(rows))

    stacked = jnp.concatenate(rows, axis=0)        # [_N_ACC, BLK]
    sums = jnp.sum(stacked, axis=1, keepdims=True)  # [_N_ACC, 1]
    acc_ref[:, 0:1] = acc_ref[:, 0:1] + sums


from typing import NamedTuple


_N_MOM = 16  # output rows of the plane-moments kernel (10 used, padded)


def _moments_kernel(pt_ref, cx_ref, cy_ref, cz_ref, inf_ref, scal_ref,
                    out_ref):
    """Per-point weighted moments of candidate offsets d = c - q within
    radius: [n, Sd (3), Sdd (6)] — the inputs of a patch plane fit."""
    px, py, pz = pt_ref[0:1, :], pt_ref[1:2, :], pt_ref[2:3, :]
    r2 = scal_ref[0, 0]
    dx = cx_ref[:] - px                             # [C, BLK]
    dy = cy_ref[:] - py
    dz = cz_ref[:] - pz
    d2 = dx * dx + dy * dy + dz * dz + inf_ref[:]
    w = (d2 <= r2).astype(jnp.float32)
    rows = [
        w, w * dx, w * dy, w * dz,
        w * dx * dx, w * dy * dy, w * dz * dz,
        w * dx * dy, w * dx * dz, w * dy * dz,
    ]
    pad = jnp.zeros((1, w.shape[1]), jnp.float32)
    sums = [jnp.sum(r, axis=0, keepdims=True) for r in rows]
    sums += [pad] * (_N_MOM - len(sums))
    out_ref[:] = jnp.concatenate(sums, axis=0)


def _prep_feat_kernel(pt_ref, cx_ref, cy_ref, cz_ref, inf_ref, scal_ref,
                      feat_ref):
    """Moments + covariance + closed-form smallest eigenpair + feat
    assembly, all in one kernel — the lane-major finish of the patch
    plane fit with NO [N, 3, 3]-space XLA chain and NO feat transpose.
    pt rows 0-2: query points (gather pose), row 3: source mask."""
    from .pallas_gather import _smallest_eig_rows

    px, py, pz = pt_ref[0:1, :], pt_ref[1:2, :], pt_ref[2:3, :]
    mask = pt_ref[3:4, :]
    r2 = scal_ref[0, 0]
    dx = cx_ref[:] - px                             # [C, BLK]
    dy = cy_ref[:] - py
    dz = cz_ref[:] - pz
    d2 = dx * dx + dy * dy + dz * dz + inf_ref[:]
    w = (d2 <= r2).astype(jnp.float32)
    rows = [
        w, w * dx, w * dy, w * dz,
        w * dx * dx, w * dy * dy, w * dz * dz,
        w * dx * dy, w * dx * dz, w * dy * dz,
    ]
    # one stacked candidate-axis reduction (the GN-kernel trick)
    st = jnp.concatenate(rows, axis=0)              # [10 C, BLK]
    c = w.shape[0]
    sums = jnp.sum(st.reshape(10, c, -1), axis=1)   # [10, BLK]
    n_in = sums[0:1, :]
    denom = jnp.maximum(n_in, 1.0)
    mx, my, mz = (sums[1:2] / denom, sums[2:3] / denom, sums[3:4] / denom)
    axx = sums[4:5] / denom - mx * mx
    ayy = sums[5:6] / denom - my * my
    azz = sums[6:7] / denom - mz * mz
    axy = sums[7:8] / denom - mx * my
    axz = sums[8:9] / denom - mx * mz
    ayz = sums[9:10] / denom - my * mz
    nx, ny, nz, quality = _smallest_eig_rows(axx, ayy, azz, axy, axz, ayz)
    quality = jnp.where(n_in >= 4.0, quality, 0.0)
    feat_ref[0:1, :] = nx
    feat_ref[1:2, :] = ny
    feat_ref[2:3, :] = nz
    feat_ref[3:4, :] = px + mx
    feat_ref[4:5, :] = py + my
    feat_ref[5:6, :] = pz + mz
    feat_ref[6:7, :] = quality
    feat_ref[7:8, :] = mask


@partial(jax.jit, inline=True, static_argnames=("interpret",))
def plane_moments_pallas(
    ptq: jax.Array,     # [8, N] rows 0-2: query points (gather pose)
    cx: jax.Array,      # [C, N] lane-major candidate coords
    cy: jax.Array,
    cz: jax.Array,
    inf: jax.Array,     # [C, N] 0 valid / 1e30 invalid
    radius2: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused per-point plane-fit moments over the candidate patch.

    Replaces the [M, C]-space XLA chain (distance mask, masked centroid
    sum, covariance einsum — ~0.7 ms/scan of kLoop fusions at bench
    shapes) with one kernel. Moments are taken of OFFSETS from the query
    point, so f32 never sees world-magnitude squares (one-pass raw
    moments of world coords would cancel catastrophically); the caller
    finishes with cov = Sdd/n - m m^T, centroid = q + m.
    Returns [16, N]: row 0 n, rows 1-3 Sd, rows 4-9 Sdd (xx yy zz xy xz
    yz), rest zero padding.
    """
    n = ptq.shape[1]
    c = cx.shape[0]
    assert n % BLK == 0, f"N {n} must be a multiple of {BLK}"
    scal = radius2.astype(jnp.float32).reshape(1, 1)
    grid = n // BLK
    return pl.pallas_call(
        _moments_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_N_MOM, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_N_MOM, n), jnp.float32),
        interpret=interpret,
    )(ptq, cx, cy, cz, inf, scal)


class PreppedCandidates(NamedTuple):
    """Lane-major candidate tensors, transposed ONCE per gather (not per
    GN iteration): points on lanes, candidates/features on sublanes."""
    feat: jax.Array   # [8, N]  rows: nx ny nz cx cy cz quality mask
    cx: jax.Array     # [C, N]
    cy: jax.Array
    cz: jax.Array
    inf: jax.Array    # [C, N]  0 valid / 1e30 invalid


def prep_with_plane_pallas(
    cand,                 # CandidateSet gathered with fit_planes=False
    source_mask,          # [N] bool
    q_w,                  # [N, 3] source at the gather pose
    radius: jax.Array,    # patch radius (meters)
    *,
    loss: str = "plane",
    interpret: bool = False,
) -> PreppedCandidates:
    """Lane-major prep computing the patch plane fit via ONE fused
    kernel instead of gather_candidates' [M, C]-space XLA chain.

    Transposes the candidate tensors ONCE (they are reused verbatim by
    every GN iteration) and runs :func:`_prep_feat_kernel` on them:
    moments, covariance, the closed-form smallest eigenpair (in-kernel
    Newton acos — Mosaic lowers no arccos) and the feat-row assembly all
    happen lane-major inside the kernel, so no [N, 3, 3] XLA chain and
    no [N, 8] -> [8, N] feat transpose remain (r5: ~35 ops + 1 transpose
    removed per registration vs the r4 moments-kernel + XLA-finish
    form). The eigensolve matches ops.plane.smallest_eigvec_sym3 to
    f32/Newton-acos roundoff.
    """
    n = cand.pts.shape[0]
    cx = cand.pts[:, :, 0].T                       # [C, N]
    cy = cand.pts[:, :, 1].T
    cz = cand.pts[:, :, 2].T
    inf = jnp.where(cand.valid, 0.0, jnp.float32(1e30)).T

    if loss != "plane":
        feat = jnp.concatenate([
            jnp.zeros((n, 6), jnp.float32),
            jnp.full((n, 1), -1.0, jnp.float32),
            source_mask.astype(jnp.float32)[:, None],
        ], axis=1).T
        return PreppedCandidates(feat=feat, cx=cx, cy=cy, cz=cz, inf=inf)

    c = cx.shape[0]
    assert n % BLK == 0, f"N {n} must be a multiple of {BLK}"
    ptq = jnp.concatenate(
        [q_w, source_mask.astype(jnp.float32)[:, None],
         jnp.zeros((n, 4), jnp.float32)], axis=1).T          # [8, N]
    scal = (radius * radius).astype(jnp.float32).reshape(1, 1)
    feat = pl.pallas_call(
        _prep_feat_kernel,
        grid=(n // BLK,),
        in_specs=[
            pl.BlockSpec((8, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )(ptq, cx, cy, cz, inf, scal)
    return PreppedCandidates(feat=feat, cx=cx, cy=cy, cz=cz, inf=inf)


def prep_candidates(cand, source_mask, *, loss: str = "plane"
                    ) -> PreppedCandidates:
    n = cand.pts.shape[0]
    if loss == "plane":
        normal, centroid, quality = cand.normal, cand.centroid, cand.quality
    else:
        normal = jnp.zeros((n, 3), jnp.float32)
        centroid = jnp.zeros((n, 3), jnp.float32)
        quality = jnp.full((n,), -1.0, jnp.float32)  # never >= threshold
    feat = jnp.concatenate([
        normal, centroid, quality[:, None],
        source_mask.astype(jnp.float32)[:, None],
    ], axis=1).T                                   # [8, N]
    return PreppedCandidates(
        feat=feat,
        cx=cand.pts[:, :, 0].T,
        cy=cand.pts[:, :, 1].T,
        cz=cand.pts[:, :, 2].T,
        inf=jnp.where(cand.valid, 0.0, jnp.float32(1e30)).T,
    )


@partial(jax.jit, inline=True,
         static_argnames=("plane_min_quality", "interpret"))
def gn_prepped_pallas(
    t_cur: jax.Array,         # [4, 4]
    source: jax.Array,        # [N, 3]
    prepped: PreppedCandidates,
    kernel: jax.Array,
    max_d2: jax.Array,
    *,
    plane_min_quality: float = 0.2,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused GN iteration on lane-major candidates.

    Same returns as :func:`ops.icp.gn_from_candidates`:
    (jtj [6,6], jtr [6], n_corr, total_weight) — additive across shards.
    ``interpret=True`` runs in the Pallas interpreter (CPU tests).
    """
    from ..geom import se3

    n = source.shape[0]
    c = prepped.cx.shape[0]
    assert n % BLK == 0, f"source capacity {n} must be a multiple of {BLK}"

    pts_w = se3.transform(t_cur, source)           # [N, 3]
    pt = jnp.concatenate(
        [pts_w, jnp.zeros((n, 5), jnp.float32)], axis=1).T   # [8, N]
    scal = jnp.stack(
        [kernel.astype(jnp.float32), max_d2.astype(jnp.float32),
         jnp.asarray(plane_min_quality, jnp.float32)]).reshape(1, 3)

    grid = n // BLK
    acc = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_N_ACC, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_N_ACC, 128), jnp.float32),
        interpret=interpret,
    )(pt, prepped.feat, prepped.cx, prepped.cy, prepped.cz, prepped.inf,
      scal)[:, 0]

    acc = acc.reshape(_N_ACC)

    # --- assemble the 6x6 system from the moment sums
    sw = acc[_PT_W]
    swp = acc[_PT_P:_PT_P + 3]
    pp = acc[_PT_PP:_PT_PP + 6]   # xx, yy, zz, xy, xz, yz
    swpp = jnp.asarray([
        [pp[0], pp[3], pp[4]],
        [pp[3], pp[1], pp[5]],
        [pp[4], pp[5], pp[2]],
    ])
    eye3 = jnp.eye(3, dtype=jnp.float32)
    trace = pp[0] + pp[1] + pp[2]
    hat_swp = jnp.asarray([
        [0.0, -swp[2], swp[1]],
        [swp[2], 0.0, -swp[0]],
        [-swp[1], swp[0], 0.0],
    ])
    jtj_pt = jnp.block([
        [trace * eye3 - swpp, hat_swp],
        [-hat_swp, sw * eye3],
    ])
    jtr_pt = jnp.concatenate([acc[_PT_PXR:_PT_PXR + 3],
                              acc[_PT_R:_PT_R + 3]])

    rr = jnp.zeros((6, 6), jnp.float32)
    k = _PL_RR
    for u in range(6):
        for v in range(u, 6):
            rr = rr.at[u, v].set(acc[k])
            if v != u:
                rr = rr.at[v, u].set(acc[k])
            k += 1
    jtr_pl = acc[_PL_RS:_PL_RS + 6]

    return (jtj_pt + rr, jtr_pt + jtr_pl,
            acc[_N_CORR].astype(jnp.int32), acc[_TOT_W])


@partial(jax.jit, inline=True,
         static_argnames=("loss", "plane_min_quality", "interpret"))
def gn_from_candidates_pallas(
    t_cur, source, source_mask, cand, kernel, max_d2, *,
    loss: str = "plane", plane_min_quality: float = 0.2,
    interpret: bool = False,
):
    """Convenience wrapper: prep + fused iteration (parity tests; the ICP
    loop preps once per gather and calls :func:`gn_prepped_pallas`)."""
    prepped = prep_candidates(cand, source_mask, loss=loss)
    return gn_prepped_pallas(
        t_cur, source, prepped, kernel, max_d2,
        plane_min_quality=plane_min_quality, interpret=interpret)
