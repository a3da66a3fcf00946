"""Contact manifolds at the public query surface (BASELINE config 4).

The reference emits exactly ONE contact point per query
(``/root/reference/src/GCLIB_GJKEPA.f90:329-340``); a single point cannot
stabilize stacked face contacts, so round 2 grew a box-only face-clip
manifold inside the sim.  This module generalizes it into a public op for
BOTH hull pairs and analytic shape pairs (VERDICT round-2 item 4):

  1. extract each body's *support polygon* along the contact normal
     (the vertices within ``tol`` of the support maximum — the same
     clustering rule the reference's contact-point case tree uses,
     ref :471-529, applied along +n for A and -n for B; analytic shapes
     enumerate closed-form candidate sets: box corners, capsule ends,
     cylinder rim samples);
  2. pick the REFERENCE side (more support vertices = flatter face),
     project both polygons into the contact tangent plane;
  3. clip the incident polygon against the reference polygon
     (masked fixed-capacity Sutherland-Hodgman — the TPU re-derivation
     of polygon clipping: every emit slot is located by prefix-sum rank,
     no dynamic shapes);
  4. per clipped point, per-point penetration depth = signed gap between
     the point's incident-side height and the reference plane along n;
  5. reduce to at most 4 points (deepest, farthest, then two max-area
     picks — the standard manifold reduction) with a validity mask.

Vertex/edge contacts (reference side has < 3 support vertices) fall back
to the single contact point, depth = the query depth — exactly the
reference's output.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GJKEPAConfig

__all__ = ["ManifoldResult", "manifold_batch", "manifold_shapes_batch"]

_CLIP_CAP = 16      # Sutherland-Hodgman working capacity (<= 8 + 8 verts)
_POLY_CAP = 8       # support-polygon capacity per side


class ManifoldResult(NamedTuple):
    points: jnp.ndarray   # (B, 4, 3) contact points (world)
    depths: jnp.ndarray   # (B, 4)    per-point penetration depths (>= 0)
    mask: jnp.ndarray     # (B, 4)    validity


def _first_k(sel, pts, k):
    """Compact the selected rows of pts (N,3) into k slots (rank order)."""
    seli = sel.astype(jnp.int32)
    cum = jnp.cumsum(seli)
    n_sel = cum[-1]
    out = []
    for slot in range(k):
        src = jnp.sum((cum < slot + 1).astype(jnp.int32))
        src = jnp.minimum(src, pts.shape[0] - 1)
        out.append(pts[src])
    valid = jnp.arange(k) < n_sel
    return jnp.stack(out), valid


def _hull_support_polygon(p, mask, n, tol, k=_POLY_CAP):
    """Vertices of hull p (N,3) within tol of the support max along n."""
    dots = p @ n
    if mask is not None:
        dots = jnp.where(mask, dots, -jnp.inf)
    m = jnp.max(dots)
    sel = dots >= m - tol
    if mask is not None:
        sel = sel & mask
    return _first_k(sel, p, k)


def _shape_support_polygon(kind, params, pos, rot, n, tol, k=_POLY_CAP):
    """Closed-form support-polygon candidates of one analytic shape along
    world direction n: enumerate a fixed candidate set per kind, keep the
    candidates within tol of the support maximum."""
    from ..models.shapes import BOX, CAPSULE, CYLINDER, SPHERE

    dl = rot.T @ n
    r0, p1 = params[0], params[1]

    # candidate local points, fixed count 18 (padded per kind)
    cands = []
    # sphere support point (also generic fallback for every kind)
    nl = dl / jnp.maximum(jnp.linalg.norm(dl), 1e-20)
    cands.append(r0 * nl)                                  # sphere
    # box corners (8)
    signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                       for sz in (-1, 1)], dl.dtype)
    for i in range(8):
        cands.append(signs[i] * params[:3])
    # capsule ends (2): r*unit(dl) +- (0,0,H)
    zax = jnp.array([0.0, 0.0, 1.0], dl.dtype)
    cands.append(r0 * nl + p1 * zax)
    cands.append(r0 * nl - p1 * zax)
    # cylinder rim samples: 8 grid angles on the supported cap + the exact
    # lateral rim angle on both caps (8 + 2, reuses the capsule slots' count)
    rho = jnp.sqrt(dl[0] ** 2 + dl[1] ** 2)
    co = jnp.where(rho > 1e-12, dl[0] / jnp.maximum(rho, 1e-20), 1.0)
    si = jnp.where(rho > 1e-12, dl[1] / jnp.maximum(rho, 1e-20), 0.0)
    sz_ = jnp.where(dl[2] >= 0, 1.0, -1.0)
    import numpy as _np
    for a in _np.linspace(0.0, 2 * _np.pi, 8, endpoint=False):
        cands.append(jnp.array([r0 * _np.cos(a), r0 * _np.sin(a), 0.0],
                               dl.dtype) + sz_ * p1 * zax)
    cands.append(jnp.stack([r0 * co, r0 * si, p1]))
    cands.append(jnp.stack([r0 * co, r0 * si, -p1]))
    local = jnp.stack(cands)                                # (20, 3)

    n_c = local.shape[0]
    is_sph = kind == SPHERE
    is_box = kind == BOX
    is_cap = kind == CAPSULE
    is_cyl = kind == CYLINDER
    idx = jnp.arange(n_c)
    kind_ok = jnp.where(is_sph, idx == 0,
                        jnp.where(is_box, (idx >= 1) & (idx <= 8),
                                  jnp.where(is_cap, (idx >= 9) & (idx <= 10),
                                            idx >= 11)))
    dots = local @ dl
    m = jnp.max(jnp.where(kind_ok, dots, -jnp.inf))
    sel = kind_ok & (dots >= m - tol)
    pts, valid = _first_k(sel, local, k)
    world = pts @ rot.T + pos
    del is_cyl
    return world, valid


def _ccw_order(p2, valid):
    """Permutation putting the valid 2-D points in CCW order around their
    centroid, invalid slots last (polygon clipping needs ordered verts)."""
    cnt = jnp.maximum(jnp.sum(valid), 1)
    c = jnp.sum(jnp.where(valid[:, None], p2, 0.0), axis=0) / cnt
    ang = jnp.arctan2(p2[:, 1] - c[1], p2[:, 0] - c[0])
    ang = jnp.where(valid, ang, jnp.inf)        # invalid slots sort last
    return jnp.argsort(ang)


def _clip_polygon(ref2, ref_valid, inc2, inc_z, inc_valid):
    """Masked Sutherland-Hodgman: clip (inc2, inc_z) by convex CCW ref2.

    Returns (pts2 (_CLIP_CAP,2), z (_CLIP_CAP,), valid).  z interpolates
    linearly at edge crossings (it is an affine field over the incident
    polygon's plane)."""
    cap = _CLIP_CAP
    n_ref = jnp.sum(ref_valid.astype(jnp.int32))

    pts = jnp.zeros((cap, 2), inc2.dtype).at[:inc2.shape[0]].set(inc2)
    z = jnp.zeros((cap,), inc_z.dtype).at[:inc_z.shape[0]].set(inc_z)
    valid = jnp.zeros((cap,), bool).at[:inc_valid.shape[0]].set(inc_valid)

    def clip_edge(carry, e):
        pts, z, valid = carry
        cnt = jnp.sum(valid.astype(jnp.int32))
        a = ref2[jnp.minimum(e, n_ref - 1)]
        b = ref2[jnp.where(e + 1 >= n_ref, 0, e + 1)]
        edge_on = e < n_ref
        eab = b - a

        def inside(p):
            return eab[0] * (p[:, 1] - a[1]) - eab[1] * (p[:, 0] - a[0]) >= 0.0

        nxt = jnp.where(jnp.arange(cap) + 1 >= cnt, 0, jnp.arange(cap) + 1)
        p_cur, z_cur = pts, z
        p_nxt, z_nxt = pts[nxt], z[nxt]
        in_cur = inside(p_cur)
        in_nxt = inside(p_nxt)
        live = jnp.arange(cap) < cnt
        # intersection of segment (cur -> nxt) with the edge line
        d_cur = eab[0] * (p_cur[:, 1] - a[1]) - eab[1] * (p_cur[:, 0] - a[0])
        d_nxt = eab[0] * (p_nxt[:, 1] - a[1]) - eab[1] * (p_nxt[:, 0] - a[0])
        den = d_cur - d_nxt
        t = d_cur / jnp.where(jnp.abs(den) > 1e-20, den, 1e-20)
        t = jnp.clip(t, 0.0, 1.0)
        p_x = p_cur + t[:, None] * (p_nxt - p_cur)
        z_x = z_cur + t * (z_nxt - z_cur)

        emit_self = live & in_cur
        emit_cross = live & (in_cur ^ in_nxt)
        contrib = emit_self.astype(jnp.int32) + emit_cross.astype(jnp.int32)
        cum = jnp.cumsum(contrib)
        base = cum - contrib                    # first slot of entry i
        out_cnt = cum[-1]
        slot_self = base
        slot_cross = base + emit_self.astype(jnp.int32)
        iota = jnp.arange(cap)
        new_p = jnp.zeros_like(pts)
        new_z = jnp.zeros_like(z)
        for src in range(cap):
            sm = emit_self[src] & (iota == slot_self[src])
            new_p = jnp.where(sm[:, None], p_cur[src], new_p)
            new_z = jnp.where(sm, z_cur[src], new_z)
            xm = emit_cross[src] & (iota == slot_cross[src])
            new_p = jnp.where(xm[:, None], p_x[src], new_p)
            new_z = jnp.where(xm, z_x[src], new_z)
        new_valid = iota < out_cnt
        pts = jnp.where(edge_on, new_p, pts)
        z = jnp.where(edge_on, new_z, z)
        valid = jnp.where(edge_on, new_valid, valid)
        return (pts, z, valid), None

    (pts, z, valid), _ = jax.lax.scan(clip_edge, (pts, z, valid),
                                      jnp.arange(_POLY_CAP))
    return pts, z, valid


def _reduce4(p2, depths, valid):
    """Standard 4-point manifold reduction: deepest, farthest, 2x max-area."""
    big_neg = -jnp.inf
    score0 = jnp.where(valid, depths, big_neg)
    k0 = jnp.argmax(score0)
    taken = jax.nn.one_hot(k0, p2.shape[0], dtype=bool)

    d1 = jnp.linalg.norm(p2 - p2[k0], axis=1)
    k1 = jnp.argmax(jnp.where(valid & ~taken, d1, big_neg))
    taken = taken | jax.nn.one_hot(k1, p2.shape[0], dtype=bool)

    e01 = p2[k1] - p2[k0]

    def tri_area(p):
        v = p - p2[k0]
        return e01[0] * v[:, 1] - e01[1] * v[:, 0]

    ar = tri_area(p2)
    k2 = jnp.argmax(jnp.where(valid & ~taken, ar, big_neg))
    taken = taken | jax.nn.one_hot(k2, p2.shape[0], dtype=bool)
    k3 = jnp.argmax(jnp.where(valid & ~taken, -ar, big_neg))

    n_valid = jnp.sum(valid.astype(jnp.int32))
    ks = jnp.stack([k0, k1, k2, k3])
    keep = jnp.arange(4) < jnp.minimum(n_valid, 4)
    return ks, keep


def _manifold_one(pa, va, pb, vb, n, depth, fallback_pt, tol_inside):
    """Manifold of one pair from support polygons pa/pb (world, masked)."""
    dtype = pa.dtype
    # tangent frame
    helper = jnp.where(jnp.abs(n[0]) < 0.9,
                       jnp.array([1.0, 0.0, 0.0], dtype),
                       jnp.array([0.0, 1.0, 0.0], dtype))
    u = jnp.cross(n, helper)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-20)
    v = jnp.cross(n, u)

    def project(p):
        return jnp.stack([p @ u, p @ v], axis=1), p @ n

    a2, az = project(pa)
    b2, bz = project(pb)
    n_a = jnp.sum(va.astype(jnp.int32))
    n_b = jnp.sum(vb.astype(jnp.int32))
    ref_is_a = n_a >= n_b

    ref2 = jnp.where(ref_is_a, a2, b2)
    refv = jnp.where(ref_is_a, va, vb)
    inc2 = jnp.where(ref_is_a, b2, a2)
    incz = jnp.where(ref_is_a, bz, az)
    incv = jnp.where(ref_is_a, vb, va)
    # reference plane height along n: A's max (face at support max) or B's min
    ref_z = jnp.where(ref_is_a,
                      jnp.max(jnp.where(va, az, -jnp.inf)),
                      jnp.min(jnp.where(vb, bz, jnp.inf)))

    ro = _ccw_order(ref2, refv)
    ref2s, refvs = ref2[ro], refv[ro]
    io = _ccw_order(inc2, incv)
    cp2, cz, cvalid = _clip_polygon(ref2s, refvs, inc2[io], incz[io], incv[io])

    # per-point depth: incident height vs reference plane along n
    pdepth = jnp.where(ref_is_a, ref_z - cz, cz - ref_z)
    cvalid = cvalid & (pdepth > -tol_inside)
    pdepth = jnp.maximum(pdepth, 0.0)

    ks, keep = _reduce4(cp2, pdepth, cvalid)
    pts2 = cp2[ks]
    zs = cz[ks]
    points = pts2[:, 0:1] * u[None, :] + pts2[:, 1:2] * v[None, :] \
        + zs[:, None] * n[None, :]
    depths = pdepth[ks]

    # fallbacks: reference not a face (< 3 verts) or clip emptied out
    degenerate = (jnp.maximum(n_a, n_b) < 3) | ~jnp.any(cvalid)
    pt0 = jnp.where(degenerate, fallback_pt, points[0])
    points = points.at[0].set(pt0)
    depths = depths.at[0].set(jnp.where(degenerate, depth, depths[0]))
    keep = jnp.where(degenerate,
                     jnp.arange(4) == 0, keep)
    return points, depths, keep


def manifold_batch(p1, p2, normal, depth, hit, contact_point,
                   mask1=None, mask2=None,
                   cfg: GJKEPAConfig | None = None,
                   tol: float | None = None) -> ManifoldResult:
    """Up-to-4-point contact manifolds for hull pairs.

    Args:
      p1, p2: (B, N, 3) padded vertex buffers.
      normal, depth, hit, contact_point: outputs of a narrow-phase query
        (``gjkepa_batch`` / ``gjkepa_batch_fused``) — normal points A -> B.
      tol: support-set clustering tolerance (default:
        ``cfg.support_set_tol``, the reference's 0.1 rule, ref :471-529).
    """
    cfg = cfg or GJKEPAConfig.for_f32()
    tol = cfg.support_set_tol if tol is None else tol

    def one(pa, pb, ma, mb, n, d, h, cpt):
        sa, va = _hull_support_polygon(pa, ma, n, tol)
        sb, vb = _hull_support_polygon(pb, mb, -n, tol)
        pts, dps, keep = _manifold_one(sa, va, sb, vb, n, d, cpt,
                                       tol_inside=tol)
        keep = keep & h
        return pts, dps, keep

    in_axes = (0, 0, None if mask1 is None else 0,
               None if mask2 is None else 0, 0, 0, 0, 0)
    pts, dps, keep = jax.vmap(one, in_axes=in_axes)(
        p1, p2, mask1, mask2, normal, depth, hit, contact_point)
    return ManifoldResult(points=pts, depths=dps, mask=keep)


def manifold_shapes_batch(a, b, normal, depth, hit, contact_point,
                          cfg: GJKEPAConfig | None = None,
                          tol: float | None = None) -> ManifoldResult:
    """Up-to-4-point contact manifolds for analytic shape pairs
    (:class:`gjkepa_tpu.models.ShapeBatch`)."""
    cfg = cfg or GJKEPAConfig.for_f32()
    tol = cfg.support_set_tol if tol is None else tol

    def one(ka, pma, xa, ra, kb, pmb, xb, rb, n, d, h, cpt):
        sa, va = _shape_support_polygon(ka, pma, xa, ra, n, tol)
        sb, vb = _shape_support_polygon(kb, pmb, xb, rb, -n, tol)
        pts, dps, keep = _manifold_one(sa, va, sb, vb, n, d, cpt,
                                       tol_inside=tol)
        keep = keep & h
        return pts, dps, keep

    pts, dps, keep = jax.vmap(one)(
        a.kind, a.params, a.pos, a.rot, b.kind, b.params, b.pos, b.rot,
        normal, depth, hit, contact_point)
    return ManifoldResult(points=pts, depths=dps, mask=keep)
