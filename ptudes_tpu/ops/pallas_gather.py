"""Pallas TPU kernels: fused ICP candidate select + prep (the "gather
mega-kernel", VERDICT r4 next-round #1).

The cached-candidate ICP's one-time setup — hash-probe match, top-V voxel
selection by representative distance, packed-point unpack, lane-major
transposition and the per-point patch plane fit — was ~150 small XLA ops
around two serialized row gathers, measured at ~400-550 us/scan at bench
shapes (docs/PERF.md round 4: per-op scheduling BUBBLES dominate this
regime; the gathers' hardware row-serialized floor is only ~100-150 us of
it). This module collapses everything around the gathers into TWO
kernel launches:

    XLA:      hash + meta row-gather             [N, J*R, 8] i32
    KERNEL 1  (_select): probe match + top-V  -> slots/corners/counts
    XLA:      points row-gather                  [N, V, P] i32
    KERNEL 2  (_prep): unpack + validity + patch plane fit (offset
              moments + closed-form smallest eigenpair with an in-kernel
              Newton acos) -> ops.pallas_gn.PreppedCandidates

The row gathers stay in XLA on purpose: they already run at the
hardware's serialized row-gather throughput (~5 ns/row measured round 1),
and an in-kernel DMA-per-row loop cannot beat that — DMA issue overhead
per scattered 32 B row exceeds the gather's per-row cost. What the two
kernels remove is the op soup BETWEEN the gathers (one-hot select chains,
unpack bit-ops, 4+ transposes, the [N,3,3] eigen chain) and its per-op
scheduling bubbles.

Points live on lanes, folded into full (NS, 128) vreg tiles (the
``ops.pallas_icp`` layout): every elementwise op runs at full 8x128 VPU
width.

Replaces, for the frozen-candidate TPU path, the XLA implementation in
``ops.icp.gather_candidates`` + ``ops.pallas_gn.prep_with_plane_pallas``
(both kept: refresh mode, the batched-replica driver and the octant
neighborhood still use them). Reference behavior ultimately mirrored: the
NN candidate search of ``kiss_icp::registration`` (reference
``src/ptudes/kiss.py:108-114``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hashmap
from .hashmap import QBITS, _QMASK

_BIG = 1e30  # plain float: a jnp scalar here would be a captured constant


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


# --------------------------------------------------------------- kernel 1

def _make_select_kernel(j_n: int, probes: int, v_n: int, offsets):
    """Probe-chain match + top-V voxel selection.

    Inputs (all [rows, NS, 128]):
      ptq  f32  rows 0-2: query points (world, gather pose)
      qc   i32  rows 0-2: query voxel coords
      fp   i32  rows 0..J-1: per-neighbor fingerprints
      slot i32  rows r*J+j: probe-r slot index of neighbor j
      rows i32  rows (r*J+j)*8 + c: gathered meta row c of (j, probe r)
    Output aux i32 [5*V(+pad), NS, 128]:
      rows [0:V) slot_v, [V:2V) cnt_v, [2V:3V) corner x, [3V:4V) y,
      [4V:5V) z.  Selection = iterative first-occurrence argmin over
      representative-point distance, identical to
      ``icp.gather_candidates``'s one-hot loop.
    """
    def kernel(ptq_ref, qc_ref, fp_ref, slot_ref, rows_ref, aux_ref):
        px, py, pz = ptq_ref[0], ptq_ref[1], ptq_ref[2]
        qcx, qcy, qcz = qc_ref[0], qc_ref[1], qc_ref[2]

        found, slot, cnt, d2 = [], [], [], []
        for j in range(j_n):
            fp_j = fp_ref[j]
            f = fp_j != fp_j  # all-False bool of the right shape
            sl = jnp.zeros_like(fp_j)
            ct = jnp.zeros_like(fp_j)
            rx = jnp.zeros_like(px)
            ry = jnp.zeros_like(py)
            rz = jnp.zeros_like(pz)
            for r in range(probes):
                base = (r * j_n + j) * 8
                match = (rows_ref[base] == fp_j) & jnp.logical_not(f)
                sl = jnp.where(match, slot_ref[r * j_n + j], sl)
                ct = jnp.where(match, rows_ref[base + 1], ct)
                rx = jnp.where(match, _bitcast_f32(rows_ref[base + 2]), rx)
                ry = jnp.where(match, _bitcast_f32(rows_ref[base + 3]), ry)
                rz = jnp.where(match, _bitcast_f32(rows_ref[base + 4]), rz)
                f = f | match
            dd = (rx - px) ** 2 + (ry - py) ** 2 + (rz - pz) ** 2
            found.append(f)
            slot.append(sl)
            cnt.append(ct)
            d2.append(jnp.where(f, dd, _BIG))

        d = list(d2)
        for v in range(v_n):
            dmin = d[0]
            for j in range(1, j_n):
                dmin = jnp.minimum(dmin, d[j])
            ok = dmin < _BIG
            taken = dmin != dmin  # all-False
            slot_v = jnp.zeros_like(slot[0])
            cnt_v = jnp.zeros_like(cnt[0])
            cox = jnp.zeros_like(qcx)
            coy = jnp.zeros_like(qcy)
            coz = jnp.zeros_like(qcz)
            for j in range(j_n):
                pick = (d[j] == dmin) & jnp.logical_not(taken)
                taken = taken | pick
                slot_v = jnp.where(pick, slot[j], slot_v)
                cnt_v = jnp.where(pick, cnt[j], cnt_v)
                cox = jnp.where(pick, qcx + jnp.int32(offsets[j][0]), cox)
                coy = jnp.where(pick, qcy + jnp.int32(offsets[j][1]), coy)
                coz = jnp.where(pick, qcz + jnp.int32(offsets[j][2]), coz)
                d[j] = jnp.where(pick, _BIG, d[j])
            aux_ref[0 * v_n + v] = slot_v
            aux_ref[1 * v_n + v] = jnp.where(ok, cnt_v, 0)
            aux_ref[2 * v_n + v] = cox
            aux_ref[3 * v_n + v] = coy
            aux_ref[4 * v_n + v] = coz

    return kernel


# --------------------------------------------------------------- kernel 2

def _acos_newton(c):
    """Elementwise arccos for Mosaic (no acos lowering on TPU Pallas):
    Newton inversion of cos, seeded from the NEAREST end with the
    half-angle identity — ``sqrt(2 (1 - c))`` for c >= 0 and
    ``pi - sqrt(2 (1 + c))`` for c < 0 (both exact to O(theta^3)/24 from
    their endpoint). Newton steps are skipped where |sin| is tiny (the
    seed is already accurate there and the division is ill-conditioned).
    Max error measured ~1e-6 across [-1, 1] after 3 steps."""
    guard = jnp.float32(1e-3)
    lo = jnp.sqrt(jnp.maximum(2.0 * (1.0 + c), 0.0))
    hi = jnp.sqrt(jnp.maximum(2.0 * (1.0 - c), 0.0))
    x = jnp.where(c < 0.0, jnp.float32(3.14159265) - lo, hi)
    for _ in range(3):
        s = jnp.sin(x)
        step = (jnp.cos(x) - c) / jnp.maximum(s, guard)
        x = x + jnp.where(s > guard, step, 0.0)
    return x


def _smallest_eig_rows(axx, ayy, azz, axy, axz, ayz):
    """Elementwise port of ops.plane.smallest_eigvec_sym3 on component
    arrays: returns (nx, ny, nz, quality)."""
    eps = jnp.float32(1e-12)
    m = (axx + ayy + azz) * jnp.float32(1.0 / 3.0)
    bxx, byy, bzz = axx - m, ayy - m, azz - m
    q = (bxx * bxx + byy * byy + bzz * bzz
         + 2.0 * (axy * axy + axz * axz + ayz * ayz)) * jnp.float32(1 / 6.)
    det = (bxx * (byy * bzz - ayz * ayz)
           - axy * (axy * bzz - ayz * axz)
           + axz * (axy * ayz - byy * axz)) * 0.5
    sq = jnp.sqrt(jnp.maximum(q, eps))
    r = jnp.clip(det / jnp.maximum(sq * sq * sq, eps), -1.0, 1.0)
    phi = _acos_newton(r) * jnp.float32(1.0 / 3.0)
    l1 = m + 2.0 * sq * jnp.cos(phi)
    l3 = m + 2.0 * sq * jnp.cos(phi + jnp.float32(2.0943951))  # 2pi/3
    l2 = 3.0 * m - l1 - l3

    # null space of (A - l3 I) via the largest row-pair cross product
    c00, c11, c22 = axx - l3, ayy - l3, azz - l3
    # rows: r0 = (c00, axy, axz), r1 = (axy, c11, ayz), r2 = (axz, ayz, c22)
    v01x = axy * ayz - axz * c11
    v01y = axz * axy - c00 * ayz
    v01z = c00 * c11 - axy * axy
    v02x = axy * c22 - axz * ayz
    v02y = axz * axz - c00 * c22
    v02z = c00 * ayz - axy * axz
    v12x = c11 * c22 - ayz * ayz
    v12y = ayz * axz - axy * c22
    v12z = axy * ayz - c11 * axz
    n01 = v01x * v01x + v01y * v01y + v01z * v01z
    n02 = v02x * v02x + v02y * v02y + v02z * v02z
    n12 = v12x * v12x + v12y * v12y + v12z * v12z
    # argmax over the three candidates (same tie-breaking as jnp.argmax
    # over stacked [n01, n02, n12]: first max wins)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = jnp.logical_not(use01) & (n02 >= n12)
    vx = jnp.where(use01, v01x, jnp.where(use02, v02x, v12x))
    vy = jnp.where(use01, v01y, jnp.where(use02, v02y, v12y))
    vz = jnp.where(use01, v01z, jnp.where(use02, v02z, v12z))
    vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, eps))
    quality = jnp.clip((l2 - l3) / jnp.maximum(l1, eps), 0.0, 1.0)
    return vx / vn, vy / vn, vz / vn, quality


def _make_prep_kernel(v_n: int, ppv: int, loss: str):
    """Unpack + validity + patch plane fit -> PreppedCandidates tensors.

    Inputs: ptq f32 [4, NS, 128] (rows 0-2 query points, row 3 source
    mask), aux i32 (kernel-1 output), pts i32 [V*P, NS, 128] (gathered
    packed point rows), scal SMEM [1, 2] = (voxel_size, radius^2).
    Outputs: feat [8, ...], cx/cy/cz/inf [V*P, ...] — exactly what
    ``pallas_gn.gn_prepped_pallas`` / ``pallas_icp.icp_loop_pallas``
    consume.
    """
    def kernel(ptq_ref, aux_ref, pts_ref, scal_ref,
               feat_ref, cx_ref, cy_ref, cz_ref, inf_ref):
        px, py, pz = ptq_ref[0], ptq_ref[1], ptq_ref[2]
        mask = ptq_ref[3]
        vs = scal_ref[0, 0]
        r2 = scal_ref[0, 1]
        inv_q = jnp.float32(1.0 / (1 << QBITS))

        zero = jnp.zeros_like(px)
        n_in = zero
        sdx = sdy = sdz = zero
        sxx = syy = szz = sxy = sxz = syz = zero
        for v in range(v_n):
            cox = aux_ref[2 * v_n + v].astype(jnp.float32)
            coy = aux_ref[3 * v_n + v].astype(jnp.float32)
            coz = aux_ref[4 * v_n + v].astype(jnp.float32)
            cnt = aux_ref[1 * v_n + v]
            for p in range(ppv):
                q = pts_ref[v * ppv + p]
                ux = (q & _QMASK).astype(jnp.float32)
                uy = ((q >> QBITS) & _QMASK).astype(jnp.float32)
                uz = ((q >> (2 * QBITS)) & _QMASK).astype(jnp.float32)
                cxv = (cox + (ux + 0.5) * inv_q) * vs
                cyv = (coy + (uy + 0.5) * inv_q) * vs
                czv = (coz + (uz + 0.5) * inv_q) * vs
                valid = jnp.int32(p) < cnt
                cx_ref[v * ppv + p] = cxv
                cy_ref[v * ppv + p] = cyv
                cz_ref[v * ppv + p] = czv
                inf_ref[v * ppv + p] = jnp.where(valid, 0.0, _BIG)
                if loss == "plane":
                    dx, dy, dz = cxv - px, cyv - py, czv - pz
                    w = (valid
                         & (dx * dx + dy * dy + dz * dz <= r2)
                         ).astype(jnp.float32)
                    n_in = n_in + w
                    sdx = sdx + w * dx
                    sdy = sdy + w * dy
                    sdz = sdz + w * dz
                    sxx = sxx + w * dx * dx
                    syy = syy + w * dy * dy
                    szz = szz + w * dz * dz
                    sxy = sxy + w * dx * dy
                    sxz = sxz + w * dx * dz
                    syz = syz + w * dy * dz

        if loss == "plane":
            # cov of offsets from the query point: Sdd/n - m m^T (the
            # prep_with_plane_pallas formulation — offsets keep f32 away
            # from world-magnitude squares)
            denom = jnp.maximum(n_in, 1.0)
            mx, my, mz = sdx / denom, sdy / denom, sdz / denom
            axx = sxx / denom - mx * mx
            ayy = syy / denom - my * my
            azz = szz / denom - mz * mz
            axy = sxy / denom - mx * my
            axz = sxz / denom - mx * mz
            ayz = syz / denom - my * mz
            nx, ny, nz, quality = _smallest_eig_rows(
                axx, ayy, azz, axy, axz, ayz)
            quality = jnp.where(n_in >= 4.0, quality, 0.0)
            feat_ref[0] = nx
            feat_ref[1] = ny
            feat_ref[2] = nz
            feat_ref[3] = px + mx  # centroid
            feat_ref[4] = py + my
            feat_ref[5] = pz + mz
            feat_ref[6] = quality
        else:
            for k in range(6):
                feat_ref[k] = zero
            feat_ref[6] = zero - 1.0  # quality -1: never >= threshold
        feat_ref[7] = mask

    return kernel


# ---------------------------------------------------------------- wrapper

@partial(jax.jit, inline=True,
         static_argnames=("voxel_size", "max_probes", "neighborhood",
                          "n_voxels", "plane_radius", "loss", "interpret"))
def gather_prep_fused(
    vmap_: hashmap.VoxelHashMap,
    source: jax.Array,        # [N, 3] source points (body frame)
    source_mask: jax.Array,   # [N] bool
    t_gather: jax.Array,      # [4, 4] gather pose
    *,
    voxel_size: float,
    max_probes: int = 1,
    neighborhood: int = 7,
    n_voxels: int = 4,
    plane_radius: float,
    loss: str = "plane",
    interpret: bool = False,
):
    """Candidate gather + lane-major prep in 2 kernel launches + 2 XLA
    row gathers (+3 transposes). Returns ``pallas_gn.PreppedCandidates``
    numerically matching ``prep_with_plane_pallas(gather_candidates(...))``
    up to the in-kernel Newton-acos eigensolve (~f32 roundoff).
    """
    from ..geom import se3
    from .pallas_gn import PreppedCandidates
    from .voxel import voxel_coords

    assert neighborhood in (7, 27), (
        "fused gather supports static neighborhoods (7/27); octant mode "
        "uses the XLA path")
    cap = vmap_.meta.shape[0]
    ppv = vmap_.points.shape[1]
    n = source.shape[0]
    assert n % 128 == 0, f"source capacity {n} must be lane-aligned"
    ns = n // 128
    j_n, r_n, v_n = neighborhood, max_probes, n_voxels

    pts_w = se3.transform(t_gather, source)                   # [N, 3]
    qc = voxel_coords(pts_w, voxel_size)                      # [N, 3] i32
    offsets = hashmap._NEIGHBOR_OFFSETS[:j_n]
    keys = qc[:, None, :] + jnp.asarray(offsets)[None, :, :]  # [N, J, 3]
    fp, h0 = hashmap._fingerprint_and_slot(keys, cap)         # [N, J]
    s_full = jnp.concatenate(
        [(h0 + r) & (cap - 1) for r in range(r_n)], axis=1)   # [N, R*J]

    rows = hashmap.gather_rows(vmap_.meta, s_full)
    rows_t = rows.reshape(n, r_n * j_n * 8).T.reshape(-1, ns, 128)
    fp_t = fp.T.reshape(j_n, ns, 128)
    slot_t = s_full.T.reshape(r_n * j_n, ns, 128)
    qc_t = qc.T.reshape(3, ns, 128)
    ptq = jnp.concatenate(
        [pts_w, source_mask.astype(jnp.float32)[:, None]], axis=1
    ).T.reshape(4, ns, 128)

    aux_rows = 5 * v_n
    aux = pl.pallas_call(
        _make_select_kernel(j_n, r_n, v_n, offsets),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((aux_rows, ns, 128), jnp.int32),
        interpret=interpret,
    )(ptq, qc_t, fp_t, slot_t, rows_t)

    slot_v = aux[:v_n].reshape(v_n, n).T                      # [N, V]
    packed = hashmap.gather_rows(vmap_.points, slot_v)
    pts_rows = packed.reshape(n, v_n * ppv).T.reshape(-1, ns, 128)

    scal = jnp.stack([
        jnp.asarray(voxel_size, jnp.float32),
        jnp.asarray(plane_radius * plane_radius, jnp.float32),
    ]).reshape(1, 2)
    c_n = v_n * ppv
    feat, cx, cy, cz, inf = pl.pallas_call(
        _make_prep_kernel(v_n, ppv, loss),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ptq
            pl.BlockSpec(memory_space=pltpu.VMEM),   # aux
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pts rows
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)),
        out_shape=(
            jax.ShapeDtypeStruct((8, ns, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, ns, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, ns, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, ns, 128), jnp.float32),
            jax.ShapeDtypeStruct((c_n, ns, 128), jnp.float32),
        ),
        interpret=interpret,
    )(ptq, aux, pts_rows, scal)

    return PreppedCandidates(
        feat=feat.reshape(8, n),
        cx=cx.reshape(c_n, n), cy=cy.reshape(c_n, n),
        cz=cz.reshape(c_n, n), inf=inf.reshape(c_n, n))
