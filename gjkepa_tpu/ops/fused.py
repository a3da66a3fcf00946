"""Fused Pallas GJK+EPA kernel (the hot-path TPU implementation).

One `pallas_call` program processes a block of BLOCK pairs entirely in
VMEM: broadphase reject, staged init (v1-v4), the always-tetra GJK loop,
and the incremental capped-face EPA — no per-iteration XLA kernel
launches, no HBM round-trips for the polytope state, no gathers (every
indexed access is a one-hot contraction on the VPU).

Layout: *pairs live on the vector lanes*.  Every per-pair scalar is a
(1, BLOCK) array (2-D — Mosaic's layout inference is fragile for 1-D lane
vectors in loop carries) and every 3-vector is a :class:`P3` of three
(1, BLOCK) arrays, so the geometry code reads like scalar code while each
op runs 128+ pairs wide.  Vertex buffers are (N, BLOCK) per coordinate;
per-face EPA state is (F, BLOCK).  Boolean masks never cross loop
boundaries (int32 carries) and mask reductions go through int32 — both
Mosaic lowering constraints.

Semantics match gjkepa_tpu.ops.gjk / ops.epa (same staged construction,
termination rules and epsilon ladder — see those modules for the
reference citations).  The separate XLA path remains the portable
implementation and the cross-check in tests.

Current scope: convex-hull pairs, float32, hulls pre-padded by repeating
a real vertex (utils.hull.pad_hulls does this), contact derivation left
to the XLA ops (one-shot, outside the iteration hot path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GJKEPAConfig
from ..types import Status
from .directions import DIRECTION_TABLE

__all__ = ["fused_gjkepa_hulls", "fused_gjkepa_shapes",
           "fused_gjkepa_hull_shapes", "fused_gjk_distance_hulls",
           "FusedResult"]

_RUNNING = -1

# Iteration budget for the capped-EPA + polish treatment of smooth analytic
# pairs (see _epa_cascade_kernel_shapes): enough expansions to localize the
# contact-direction basin; the fixed-cost _polish_direction descent then
# refines depth/normal beyond what converged f32 EPA achieves.
_SMOOTH_EPA_CAP = 16

# Lane width of the split-pipeline GJK-loop kernel (fused_gjkepa_shapes
# fast path): the subset is 100% iterate-loop lanes, and each block runs to
# its slowest lane — narrower blocks decouple stragglers at the cost of
# more per-program floor.  At 64k mixed-analytic, 512 measured best
# (36.0M q/s vs 35.5M at 256 and 31.3M at 128: the floor wins).
_SUB_BLOCK = 512

# Init-retry directions, unrolled statically in-kernel (see _gjk_phase).
_N_INIT_UNROLL = 8
_TABLE_ROWS = tuple(tuple(float(x) for x in row)
                    for row in DIRECTION_TABLE[:_N_INIT_UNROLL])


class P3(NamedTuple):
    """A block of 3-vectors: three (1, BLOCK) lane arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return P3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return P3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self):
        return P3(-self.x, -self.y, -self.z)


def pzero(block, dtype=jnp.float32):
    z = jnp.zeros((1, block), dtype)
    return P3(z, z, z)


def _vzero(block):
    """Lane-VARYING f32 zero: loop carries that a body rewrites per-lane
    must not start as replicated constants (Mosaic relayout rule,
    docs/DESIGN.md lowering rule on int carries — it applies to f32 too)."""
    return jnp.minimum(lax.broadcasted_iota(jnp.int32, (1, block), 1),
                       jnp.int32(0)).astype(jnp.float32)


def pdot(a: P3, b: P3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def pcross(a: P3, b: P3) -> P3:
    return P3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def pscale(a: P3, s) -> P3:
    return P3(a.x * s, a.y * s, a.z * s)


def pnorm(a: P3):
    return jnp.sqrt(pdot(a, a))


def putz(a: P3, eps) -> P3:
    """utzvec: zero vector if norm < eps (ref :1343-1352)."""
    n = pnorm(a)
    s = jnp.where(n < eps, 0.0, 1.0 / jnp.where(n < eps, 1.0, n))
    return pscale(a, s)


def pwhere(m, a: P3, b: P3) -> P3:
    return P3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def pcoincide(a: P3, b: P3, eps):
    """ALL(|a-b| < eps) — the reference's vertex-coincidence test."""
    return ((jnp.abs(a.x - b.x) < eps) & (jnp.abs(a.y - b.y) < eps)
            & (jnp.abs(a.z - b.z) < eps))


def _uninml(a: P3, b: P3, c: P3, eps_zero) -> P3:
    """Plane unit normal; zero when degenerate, component-wise test
    matching UNINML (ref :1382-1394)."""
    cr = pcross(b - a, c - b)
    ok = ((jnp.abs(cr.x) > eps_zero) | (jnp.abs(cr.y) > eps_zero)
          | (jnp.abs(cr.z) > eps_zero))
    n = pnorm(cr)
    s = jnp.where(ok, 1.0 / jnp.where(ok, n, 1.0), 0.0)
    return pscale(cr, s)


def _dist_pf_sign(p: P3, a: P3, b: P3, c: P3, eps_zero):
    n = _uninml(a, b, c, eps_zero)
    return pdot(p - a, n)


def _tri_edge_cross(ax, ay, bx, by, px, py):
    """z-component of (B-A) x (P-A) for one polygon edge."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _is_inside_tri(a: P3, b: P3, c: P3, p: P3, eps_zero):
    """IS_INSIDE_PF for a triangle (ref :1271-1337), lane-vectorized.

    XOY edge crosses, |c|<eps_zero clamped to 0, the all-nonpositive quirk
    falling through to the XOZ projection, sign-flip-vs-first-element test.
    """
    def crosses(ax_, ay_, bx_, by_, cx_, cy_, px_, py_):
        c0 = _tri_edge_cross(ax_, ay_, bx_, by_, px_, py_)
        c1 = _tri_edge_cross(bx_, by_, cx_, cy_, px_, py_)
        c2 = _tri_edge_cross(cx_, cy_, ax_, ay_, px_, py_)
        return c0, c1, c2

    cx0, cx1, cx2 = crosses(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
    cx0 = jnp.where(jnp.abs(cx0) < eps_zero, 0.0, cx0)
    cx1 = jnp.where(jnp.abs(cx1) < eps_zero, 0.0, cx1)
    cx2 = jnp.where(jnp.abs(cx2) < eps_zero, 0.0, cx2)
    use_xz = ~((cx0 > 1e-15) | (cx1 > 1e-15) | (cx2 > 1e-15))
    cz0, cz1, cz2 = crosses(a.x, a.z, b.x, b.z, c.x, c.z, p.x, p.z)
    c0 = jnp.where(use_xz, cz0, cx0)
    c1 = jnp.where(use_xz, cz1, cx1)
    c2 = jnp.where(use_xz, cz2, cx2)
    outside = (c0 * c1 < 0.0) | (c0 * c2 < 0.0)
    return ~outside


# the always-tetra face tables (ref :1093-1118, :1227-1229)
_FACE_IDX = ((0, 2, 3), (0, 1, 3), (0, 1, 2), (1, 2, 3))


def _point_in_simplex(p: P3, s, eps_coincide, eps_zero):
    """isPointInSimplex (ref :1217-1265): s is a tuple of 4 P3 vertices.

    The on-face fallback (ref :1247-1260: |dist| < eps on some face =>
    2-D point-in-triangle test) runs 4x `_is_inside_tri` (~160 vector
    ops) but only matters for touching-contact configurations; it sits
    behind a scalar cond so the common strictly-inside/outside case pays
    only the 4 signed distances.  This is called once per GJK iteration —
    the skip removes ~40% of the loop-body op count."""
    m = P3((s[0].x + s[1].x + s[2].x + s[3].x) * 0.25,
           (s[0].y + s[1].y + s[2].y + s[3].y) * 0.25,
           (s[0].z + s[1].z + s[2].z + s[3].z) * 0.25)
    all_pos = None
    on_planes = []
    for i, (f0, f1, f2) in enumerate(_FACE_IDX):
        a, b, c = s[f0], s[f1], s[f2]
        nml = putz(pcross(a - b, b - c), eps_zero)
        flip = pdot(nml, s[i] - m) < 0.0
        nml = pwhere(flip, -nml, nml)
        dist = pdot(s[i] - p, nml)
        on_planes.append(jnp.abs(dist) < eps_coincide)
        pos = dist > 0.0
        all_pos = pos if all_pos is None else (all_pos & pos)
    any_on_plane = on_planes[0] | on_planes[1] | on_planes[2] | on_planes[3]

    def on_face_check(_):
        r = None
        for i, (f0, f1, f2) in enumerate(_FACE_IDX):
            inside = _is_inside_tri(s[f0], s[f1], s[f2], p, eps_zero)
            onf = on_planes[i] & inside
            r = onf if r is None else (r | onf)
        return jnp.where(r, jnp.int32(1), jnp.int32(0))

    # lane-varying zero: both cond branches must produce the same (varying)
    # layout — a replicated jnp.zeros constant breaks Mosaic's relayout
    zero_i = jnp.minimum(
        lax.broadcasted_iota(jnp.int32, p.x.shape, 1), jnp.int32(0))
    any_on_face = lax.cond(jnp.any(any_on_plane), on_face_check,
                           lambda _: zero_i, None)
    return (any_on_face > 0) | all_pos


def _vec_pl(p: P3, a: P3, b: P3, eps_zero) -> P3:
    """VEC_PL (ref :1423-1440): unit vector from p toward its foot on line ab."""
    ab = b - a
    n = pnorm(ab)
    safe = jnp.where(n < eps_zero, 1.0, n)
    t = pdot(p - a, ab) / safe
    foot = a + pscale(ab, t / safe)
    return putz(foot - p, eps_zero)


def _make_hull_support(v1x, v1y, v1z, v2x, v2y, v2z, n_iota1, n_iota2):
    """Support of the Minkowski difference over two (N, BLOCK) vertex sets.

    Directions and results are (1, BLOCK) P3s; the winning row is extracted
    with a first-max one-hot contraction (argmax keepdims), not a gather.
    """

    def support(d: P3) -> P3:
        dots1 = v1x * d.x + v1y * d.y + v1z * d.z          # (N, BLOCK)
        i1 = jnp.argmax(dots1, axis=0, keepdims=True)      # (1, BLOCK)
        oh1 = n_iota1 == i1
        ax = jnp.sum(jnp.where(oh1, v1x, 0.0), axis=0, keepdims=True)
        ay = jnp.sum(jnp.where(oh1, v1y, 0.0), axis=0, keepdims=True)
        az = jnp.sum(jnp.where(oh1, v1z, 0.0), axis=0, keepdims=True)
        dots2 = -(v2x * d.x + v2y * d.y + v2z * d.z)
        i2 = jnp.argmax(dots2, axis=0, keepdims=True)
        oh2 = n_iota2 == i2
        bx = jnp.sum(jnp.where(oh2, v2x, 0.0), axis=0, keepdims=True)
        by = jnp.sum(jnp.where(oh2, v2y, 0.0), axis=0, keepdims=True)
        bz = jnp.sum(jnp.where(oh2, v2z, 0.0), axis=0, keepdims=True)
        return P3(ax - bx, ay - by, az - bz)

    return support


def _gjk_phase(support, active, table_xyz, cfg: GJKEPAConfig, block):
    """Init (v1-v4) + iterate loop; returns (simplex 4xP3, status, iters, sep).

    `active` is a (1, BLOCK) bool; all returned per-pair values are (1, BLOCK).
    """
    eps = cfg.eps_coincide
    epz = cfg.eps_zero
    table = table_xyz                          # (n_init_unroll, 3) python floats
    zero = pzero(block)
    sep0 = jnp.zeros((1, block), jnp.float32)

    def sep_upd(sep, d, w, run):
        return jnp.where(run, jnp.maximum(sep, -pdot(w, d)), sep)

    def const_dir(i):
        tx, ty, tz = table[i]
        one = jnp.ones((1, block), jnp.float32)
        return P3(one * tx, one * ty, one * tz)

    # --- v1/v2 retry, statically unrolled (ref :82-112) -----------------
    # The reference retries up to 99 table directions while the +/- supports
    # coincide.  In the fused kernel the retry is unrolled over the first
    # n_init_unroll table rows as straight-line masked code (a loop-carried
    # table lookup trips Mosaic's layout inference); coincidence past that
    # many distinct directions means a degenerate (lower-dimensional)
    # Minkowski difference, classified MISS_INIT exactly like the
    # reference's exhausted-retries branch (:86-89).  The XLA path keeps
    # the full 99-retry semantics.
    # Row 0 probes unconditionally; rows 1..n-1 run under a SCALAR cond so
    # the (expensive, O(N)-per-probe on hulls) retry supports are skipped
    # at runtime when no lane in the block is still coincident — the
    # overwhelmingly common case.  Lanes with run=False are write-masked,
    # so skipping is observationally identical.
    d0 = const_dir(0)
    w1 = support(d0)
    w2 = support(-d0)
    s1 = pwhere(active, w1, zero)
    s2 = pwhere(active, w2, zero)
    sep = sep_upd(sep_upd(sep0, d0, w1, active), -d0, w2, active)
    run = active & pcoincide(s1, s2, eps)

    def _retry_rest(args):
        s1, s2, sep, run = args
        for i in range(1, len(table)):
            d = const_dir(i)
            w1 = support(d)
            w2 = support(-d)
            s1 = pwhere(run, w1, s1)
            s2 = pwhere(run, w2, s2)
            sep = sep_upd(sep_upd(sep, d, w1, run), -d, w2, run)
            run = run & pcoincide(s1, s2, eps)
        return s1, s2, sep, run

    if len(table) > 1:
        s1, s2, sep, run = lax.cond(jnp.any(run), _retry_rest,
                                    lambda args: args, (s1, s2, sep, run))
    init_failed = pcoincide(s1, s2, eps)

    # --- v3 (ref :115-127) + origin-on-segment robustness fix ----------
    # Scale-aware on-line test on the RAW rejection (not a zero test on the
    # normalized vec_pl output): with the origin exactly on the s1-s2 line
    # (identical shapes), FMA contraction leaves the foot a few ulps off
    # zero and normalization turns that noise into a garbage direction
    # whose support coincides with s2 -> false MISS_INIT (see ops/gjk.py,
    # same fix).
    d3 = _vec_pl(zero, s1, s2, epz)
    seg = s2 - s1
    segsq = pdot(seg, seg)
    t3 = -pdot(s1, seg) / jnp.maximum(segsq, epz)
    rej = P3(s1.x + t3 * seg.x, s1.y + t3 * seg.y, s1.z + t3 * seg.z)
    on_line = pdot(rej, rej) <= (eps * eps) * (1.0 + segsq)
    alt = putz(pcross(seg, const_dir(0)), epz)
    alt2 = putz(pcross(seg, const_dir(1)), epz)
    alt = pwhere(pdot(alt, alt) > 0.0, alt, alt2)
    d3 = pwhere((pdot(d3, d3) > 0.0) & ~on_line, d3, alt)
    s3 = support(d3)
    sep = sep_upd(sep, d3, s3, active)
    v3_degenerate = pcoincide(s3, s1, eps) | pcoincide(s3, s2, eps)

    # --- v4 + early-EPA checks (ref :130-170) ---------------------------
    d4 = putz(pcross(s2 - s1, s3 - s2), epz)
    vo = -s3
    on_plane = jnp.abs(pdot(vo, d4)) < eps
    in_tri = _is_inside_tri(s1, s2, s3, zero, epz)
    early_hit = on_plane & in_tri

    d4f = pwhere(pdot(vo, d4) < 0.0, -d4, d4)
    s4 = support(d4f)
    sep = sep_upd(sep, d4f, s4, active)
    v4_coplanar = jnp.abs(_dist_pf_sign(s4, s1, s2, s3, epz)) < eps

    # The early-EPA seed (fresh support along the unflipped tri normal,
    # falling back to the opposite side when coplanar) is needed only on
    # early_hit lanes — a rare touching-contact configuration; both extra
    # support probes sit behind a scalar cond.
    def _early_seed(s4):
        s4e = support(d4)
        s4e_cop = jnp.abs(_dist_pf_sign(s4e, s1, s2, s3, epz)) < eps
        return pwhere(s4e_cop, support(-d4), s4e)

    s4_early = lax.cond(jnp.any(early_hit), _early_seed, lambda s4: s4, s4)
    s4 = pwhere(early_hit, s4_early, s4)
    in_tetra = _point_in_simplex(zero, (s1, s2, s3, s4), eps, epz)

    status = jnp.full((1, block), _RUNNING, jnp.int32)
    status = jnp.where(in_tetra, Status.HIT, status)
    status = jnp.where(v4_coplanar, Status.MISS_INIT, status)
    status = jnp.where(early_hit, Status.HIT, status)
    status = jnp.where(v3_degenerate, Status.MISS_INIT, status)
    status = jnp.where(init_failed, Status.MISS_INIT, status)
    status = jnp.where(active, status, Status.MISS_BROADPHASE)

    # --- iterate loop (ref :178-236) ------------------------------------
    def loop_cond(c):
        run = (c["status"] == _RUNNING) & (c["it"] < cfg.gjk_max_iters)
        return jnp.sum(jnp.where(run, jnp.int32(1), jnp.int32(0))) > 0

    def loop_body(c):
        run = (c["status"] == _RUNNING) & (c["it"] < cfg.gjk_max_iters)
        s = c["s"]
        m = P3((s[0].x + s[1].x + s[2].x + s[3].x) * 0.25,
               (s[0].y + s[1].y + s[2].y + s[3].y) * 0.25,
               (s[0].z + s[1].z + s[2].z + s[3].z) * 0.25)
        # 4 outward face normals + origin-beyond scores (ref :1086-1121);
        # MAXLOC(first max) computed with an explicit strict-> chain.
        normals = []
        scores = []
        for (f0, f1, f2) in _FACE_IDX:
            n = putz(pcross(s[f0] - s[f1], s[f1] - s[f2]), epz)
            n = pwhere(pdot(n, s[f0] - m) < 0.0, -n, n)
            normals.append(n)
            scores.append(-pdot(n, s[f0]))
        best = scores[0]
        k = jnp.zeros((1, block), jnp.int32)
        for i in (1, 2, 3):
            better = scores[i] > best
            best = jnp.where(better, scores[i], best)
            k = jnp.where(better, jnp.int32(i), k)
        d = pzero(block)
        for i in range(4):
            d = pwhere(k == i, normals[i], d)
        w = support(d)
        sepn = sep_upd(c["sep"], d, w, run)
        # new simplex = chosen face verts + w (ref :1130-1153)
        new_s = []
        for slot in range(3):
            v = pzero(block)
            for i in range(4):
                v = pwhere(k == i, s[_FACE_IDX[i][slot]], v)
            new_s.append(v)
        new_s.append(w)

        flat_tri = pnorm(pcross(new_s[1] - new_s[0], new_s[2] - new_s[1])) < eps
        coplanar4 = jnp.abs(_dist_pf_sign(new_s[3], new_s[0], new_s[1],
                                          new_s[2], epz)) < eps
        contains = _point_in_simplex(pzero(block), tuple(new_s), eps, epz)
        stalled = None
        for i in range(4):
            same = (pcoincide(new_s[i], c["l1"][i], eps)
                    | pcoincide(new_s[i], c["l2"][i], eps))
            stalled = same if stalled is None else (stalled & same)

        stn = c["status"]
        stn = jnp.where(run & stalled, Status.MISS_GJK, stn)
        stn = jnp.where(run & contains, Status.HIT, stn)
        stn = jnp.where(run & coplanar4, Status.MISS_GJK, stn)
        stn = jnp.where(run & flat_tri, Status.MISS_GJK, stn)

        keep = lambda new, old: tuple(pwhere(run, n_, o_)  # noqa: E731
                                      for n_, o_ in zip(new, old))
        return {
            "s": keep(new_s, c["s"]),
            "l1": keep(c["s"], c["l1"]),
            "l2": keep(c["l1"], c["l2"]),
            "it": jnp.where(run, c["it"] + 1, c["it"]),
            "status": stn,
            "sep": sepn,
        }

    carry = {
        "s": (s1, s2, s3, s4),
        "l1": (zero, zero, zero, zero),
        "l2": (zero, zero, zero, zero),
        "it": jnp.zeros((1, block), jnp.int32),
        "status": status,
        "sep": sep,
    }
    out = lax.while_loop(loop_cond, loop_body, carry)
    status = jnp.where(out["status"] == _RUNNING, Status.MISS_GJK, out["status"])
    hit = status == Status.HIT
    sep = jnp.where(hit | ~active, 0.0, jnp.maximum(out["sep"], 0.0))
    return out["s"], status, out["it"], sep


def _epa_phase_fast(support, simplex, active, cfg: GJKEPAConfig, block,
                    k_vis: int = 8):
    """Compact-visible EPA: the kernel-side EPA engine (all cascade tiers).

    Same observable contract as the portable XLA path (ops/epa.py: depth =
    closest-face plane distance, normal = that face's outward normal,
    ref :994-1009) but ~5-10x cheaper per iteration than a dense
    all-faces formulation:

      * faces carry their corner COORDS, corner vertex ids and PLANE
        (unit normal + origin distance) in the loop state — planes are
        computed once at insertion instead of re-derived for every face
        every iteration (the general kernel's 9 chunked vertex-table
        gathers per iteration disappear; there is no vertex table at all);
      * normals are oriented at insertion against a fixed interior point
        (the seed-simplex centroid — the polytope only grows, so it stays
        interior), equivalent to the reference's centroid orientation fix
        (:902-910) for watertight polytopes;
      * the horizon is matched only among the <= k_vis VISIBLE faces:
        measured workloads (see docs/DESIGN.md) have |visible| <= 6 for
        ~99.9% of iterations, so the visible set is first compacted into
        3*k_vis edge rows and the undirected-edge match runs on
        (3K)^2 = 576 key compares instead of the general kernel's
        (3F)^2 = 20736;
      * lanes that ever exceed k_vis visible faces (or the face buffer)
        exit with HIT_EPA_CAPACITY and are re-run by the next _epa_cascade
        tier (larger K / F) — correctness never depends on one tier's caps.
    """
    eps = cfg.eps_coincide
    epz = cfg.eps_zero
    F = cfg.epa_max_faces
    K = k_vis
    E = 3 * K
    BIG = jnp.float32(3.4e38)
    MAXID = 256  # vertex ids < 4 + epa_max_iters <= 103 < 256

    f_iota = lax.broadcasted_iota(jnp.int32, (F, block), 0)
    izero = jnp.minimum(lax.broadcasted_iota(jnp.int32, (1, block), 1),
                        jnp.int32(0))
    fzero = jnp.minimum(f_iota, jnp.int32(0))

    s = simplex
    interior = P3((s[0].x + s[1].x + s[2].x + s[3].x) * 0.25,
                  (s[0].y + s[1].y + s[2].y + s[3].y) * 0.25,
                  (s[0].z + s[1].z + s[2].z + s[3].z) * 0.25)

    def plane_of(a: "tuple", b, c):
        """Unit outward normal (vs `interior`) + origin distance of the
        triangle with corner coord triples a/b/c ((F, BLOCK) arrays).
        Returns (nx, ny, nz, d) with d = BIG when degenerate."""
        e1x, e1y, e1z = b[0] - a[0], b[1] - a[1], b[2] - a[2]
        e2x, e2y, e2z = c[0] - a[0], c[1] - a[1], c[2] - a[2]
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        nrm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        ok = nrm > epz
        inv = 1.0 / jnp.where(ok, nrm, 1.0)
        nx, ny, nz = nx * inv, ny * inv, nz * inv
        out = (nx * (a[0] - interior.x) + ny * (a[1] - interior.y)
               + nz * (a[2] - interior.z)) >= 0.0
        sgn = jnp.where(out, 1.0, -1.0)
        nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
        d = nx * a[0] + ny * a[1] + nz * a[2]
        return nx, ny, nz, jnp.where(ok, d, BIG)

    # --- seed: 4 simplex faces with coords + ids + planes ------------------
    seed_faces = ((0, 1, 2), (0, 2, 3), (0, 1, 3), (1, 2, 3))  # ref :279-293

    def seed_field(get, slot):
        arr = jnp.zeros((F, block), jnp.float32)
        for f, tri in enumerate(seed_faces):
            arr = jnp.where(f_iota == f, get(s[tri[slot]]), arr)
        return arr

    coords0 = [[seed_field(g, slot) for g in
                (lambda p: p.x, lambda p: p.y, lambda p: p.z)]
               for slot in range(3)]  # [slot][xyz] -> (F, BLOCK)
    ids0 = []
    for slot in range(3):
        arr = fzero
        for f, tri in enumerate(seed_faces):
            arr = jnp.where(f_iota == f, jnp.int32(tri[slot]), arr)
        ids0.append(arr)
    nx0, ny0, nz0, dd0 = plane_of(coords0[0], coords0[1], coords0[2])
    alive0 = jnp.where(f_iota < 4, fzero + 1, fzero)
    dd0 = jnp.where(alive0 > 0, dd0, BIG)

    tril_f = jnp.tril(jnp.ones((F, F), jnp.float32))
    tril_e = jnp.tril(jnp.ones((E, E), jnp.float32))

    def cond(c):
        run = (c["done"] == 0) & (c["it"] < cfg.epa_max_iters)
        return jnp.sum(jnp.where(run, jnp.int32(1), jnp.int32(0))) > 0

    def body(c):
        run = (c["done"] == 0) & (c["it"] < cfg.epa_max_iters)   # (1, BLOCK)
        alive = c["alive"] > 0
        nxf, nyf, nzf, dd = c["nx"], c["ny"], c["nz"], c["dd"]

        # -- min face / probe direction ------------------------------------
        dvals = jnp.where(alive, dd, BIG)
        kmin = jnp.argmin(dvals, axis=0, keepdims=True)
        star = f_iota == kmin
        d_min = jnp.min(dvals, axis=0, keepdims=True)
        all_deg = d_min >= BIG * 0.5
        d_min = jnp.where(all_deg, 0.0, d_min)
        direction = P3(
            jnp.sum(jnp.where(star, nxf, 0.0), axis=0, keepdims=True),
            jnp.sum(jnp.where(star, nyf, 0.0), axis=0, keepdims=True),
            jnp.sum(jnp.where(star, nzf, 0.0), axis=0, keepdims=True))
        direction = pwhere(all_deg, pzero(block), direction)

        w = support(direction)
        gain = pdot(w, direction) - d_min
        dup_f = jnp.zeros((F, block), jnp.int32)
        for slot, (cxs, cys, czs) in enumerate(
                ((c["ax"], c["ay"], c["az"]), (c["bx"], c["by"], c["bz"]),
                 (c["cx"], c["cy"], c["cz"]))):
            hitv = (alive & (jnp.abs(cxs - w.x) < eps)
                    & (jnp.abs(cys - w.y) < eps) & (jnp.abs(czs - w.z) < eps))
            dup_f = dup_f | jnp.where(hitv, jnp.int32(1), jnp.int32(0))
        dup = jnp.max(dup_f, axis=0, keepdims=True) > 0
        converged = (gain < eps) | dup

        # -- visible set ----------------------------------------------------
        beyond = (nxf * w.x + nyf * w.y + nzf * w.z) > dd + epz
        visible = alive & (beyond | star) & (dd < BIG * 0.5)
        visible = visible | (alive & star)
        vis_i = jnp.where(visible, jnp.int32(1), jnp.int32(0))
        nvis = jnp.sum(vis_i, axis=0, keepdims=True, dtype=jnp.int32)
        over_k = nvis > K

        # -- compact the visible faces into K slots -------------------------
        cvis = jnp.dot(tril_f, jnp.where(visible, 1.0, 0.0),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        # per compact slot: 12 extracted fields (3 ids + 9 coords)
        fields = (c["ax"], c["ay"], c["az"], c["bx"], c["by"], c["bz"],
                  c["cx"], c["cy"], c["cz"])
        idf = (c["i0"], c["i1"], c["i2"])
        slots = []
        for k in range(K):
            src_k = jnp.sum(jnp.where(cvis < k + 1, jnp.int32(1),
                                      jnp.int32(0)),
                            axis=0, keepdims=True, dtype=jnp.int32)
            valid_k = jnp.asarray(k, jnp.int32) < nvis
            oh = (f_iota == src_k) & visible
            vals = [jnp.sum(jnp.where(oh, f, 0.0), axis=0, keepdims=True)
                    for f in fields]
            ivals = [jnp.sum(jnp.where(oh, f, 0), axis=0, keepdims=True,
                             dtype=jnp.int32) for f in idf]
            slots.append((valid_k, ivals, vals))

        # -- compact edge rows: (E, BLOCK) = 3 edges per compact face -------
        # edge e of face (i0,i1,i2): endpoints (i_e, i_{e+1 mod 3})
        eu_rows, ev_rows, val_rows = [], [], []
        cu_rows = [[], [], []]   # u coords x/y/z
        cv_rows = [[], [], []]   # v coords x/y/z
        for e in range(3):
            for k in range(K):
                valid_k, ivals, vals = slots[k]
                a_, b_ = e, (e + 1) % 3
                eu_rows.append(ivals[a_])
                ev_rows.append(ivals[b_])
                val_rows.append(jnp.where(valid_k, jnp.int32(1), jnp.int32(0)))
                for x in range(3):
                    cu_rows[x].append(vals[3 * a_ + x])
                    cv_rows[x].append(vals[3 * b_ + x])
        eu = jnp.concatenate(eu_rows, axis=0)          # (E, BLOCK) int32
        ev = jnp.concatenate(ev_rows, axis=0)
        evalid = jnp.concatenate(val_rows, axis=0)     # (E, BLOCK) int32
        ecoords = ([jnp.concatenate(cu_rows[x], axis=0) for x in range(3)]
                   + [jnp.concatenate(cv_rows[x], axis=0) for x in range(3)])

        # -- horizon: undirected key unique among valid edges ---------------
        ukey = jnp.where(evalid > 0,
                         jnp.minimum(eu, ev) * MAXID + jnp.maximum(eu, ev),
                         -1)
        cnt = jnp.zeros((E, block), jnp.int32)
        for e in range(E):
            key_e = lax.slice_in_dim(ukey, e, e + 1, axis=0)     # (1, BLOCK)
            val_e = lax.slice_in_dim(evalid, e, e + 1, axis=0)
            m = (evalid > 0) & (val_e > 0) & (ukey == key_e)
            cnt = cnt + jnp.where(m, jnp.int32(1), jnp.int32(0))
        horizon = (evalid > 0) & (cnt == 1)
        hor_i = jnp.where(horizon, jnp.int32(1), jnp.int32(0))
        n_new = jnp.sum(hor_i, axis=0, keepdims=True, dtype=jnp.int32)

        free = ~alive | visible
        n_free = jnp.sum(jnp.where(free, jnp.int32(1), jnp.int32(0)),
                         axis=0, keepdims=True, dtype=jnp.int32)
        # capacity failures (a larger K / face buffer fixes them -> cascade
        # retry) vs intrinsic degeneracy (no expansion exists -> futile)
        cant_cap = (~converged) & (over_k | (n_new > n_free))
        cant_deg = (~converged) & ~cant_cap & ((n_new == 0) | all_deg)
        cant = cant_cap | cant_deg
        do_ins = run & ~(converged | cant)

        # -- assign horizon edges to free slots (rank machinery) ------------
        rank_f = jnp.dot(tril_f, jnp.where(free, 1.0, 0.0),
                         preferred_element_type=jnp.float32).astype(jnp.int32) - 1
        chor = jnp.dot(tril_e, jnp.where(horizon, 1.0, 0.0),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        src_edge = jnp.zeros((F, block), jnp.int32)
        for e in range(E):
            ch_e = lax.slice_in_dim(chor, e, e + 1, axis=0)      # (1, BLOCK)
            src_edge = src_edge + jnp.where(ch_e < rank_f + 1, jnp.int32(1),
                                            jnp.int32(0))
        write = free & (rank_f < n_new) & do_ins

        # -- gather the 8 source fields from the E compact rows --------------
        gi = [fzero, fzero]                      # eu, ev (int)
        gf = [jnp.zeros((F, block), jnp.float32) for _ in range(6)]
        for e in range(E):
            oh = src_edge == e                                    # (F, BLOCK)
            ui = lax.slice_in_dim(eu, e, e + 1, axis=0)
            vi = lax.slice_in_dim(ev, e, e + 1, axis=0)
            gi[0] = gi[0] + jnp.where(oh, ui, 0)
            gi[1] = gi[1] + jnp.where(oh, vi, 0)
            for x in range(6):
                cr = lax.slice_in_dim(ecoords[x], e, e + 1, axis=0)
                gf[x] = gf[x] + jnp.where(oh, cr, 0.0)

        # -- new faces: (u, v, w) -------------------------------------------
        na = (jnp.where(write, gf[0], c["ax"]),
              jnp.where(write, gf[1], c["ay"]),
              jnp.where(write, gf[2], c["az"]))
        nb = (jnp.where(write, gf[3], c["bx"]),
              jnp.where(write, gf[4], c["by"]),
              jnp.where(write, gf[5], c["bz"]))
        ncc = (jnp.where(write, w.x, c["cx"]),
               jnp.where(write, w.y, c["cy"]),
               jnp.where(write, w.z, c["cz"]))
        i0n = jnp.where(write, gi[0], c["i0"])
        i1n = jnp.where(write, gi[1], c["i1"])
        i2n = jnp.where(write, c["nv"], c["i2"])
        pnx, pny, pnz, pdd = plane_of(na, nb, ncc)
        nxn = jnp.where(write, pnx, nxf)
        nyn = jnp.where(write, pny, nyf)
        nzn = jnp.where(write, pnz, nzf)
        ddn = jnp.where(write, pdd, dd)

        alive_keep = jnp.where((alive & ~visible) | write, jnp.int32(1),
                               jnp.int32(0))
        sel = do_ins
        upd = lambda n_, o_: jnp.where(sel, n_, o_)  # noqa: E731

        done_now = run & (converged | cant)
        status = c["status"]
        status = jnp.where(run & converged, Status.HIT, status)
        status = jnp.where(run & cant_deg, Status.HIT_EPA_DEGENERATE, status)
        status = jnp.where(run & cant_cap, Status.HIT_EPA_CAPACITY, status)
        return {
            "ax": upd(na[0], c["ax"]), "ay": upd(na[1], c["ay"]),
            "az": upd(na[2], c["az"]),
            "bx": upd(nb[0], c["bx"]), "by": upd(nb[1], c["by"]),
            "bz": upd(nb[2], c["bz"]),
            "cx": upd(ncc[0], c["cx"]), "cy": upd(ncc[1], c["cy"]),
            "cz": upd(ncc[2], c["cz"]),
            "i0": upd(i0n, c["i0"]), "i1": upd(i1n, c["i1"]),
            "i2": upd(i2n, c["i2"]),
            "nx": upd(nxn, nxf), "ny": upd(nyn, nyf), "nz": upd(nzn, nzf),
            "dd": upd(ddn, dd),
            "alive": upd(alive_keep, c["alive"]),
            "nv": jnp.where(sel, c["nv"] + 1, c["nv"]),
            "it": jnp.where(run, c["it"] + 1, c["it"]),
            "done": c["done"] | jnp.where(done_now, jnp.int32(1), jnp.int32(0)),
            "depth": jnp.where(run, d_min, c["depth"]),
            "nx_out": jnp.where(run, direction.x, c["nx_out"]),
            "ny_out": jnp.where(run, direction.y, c["ny_out"]),
            "nz_out": jnp.where(run, direction.z, c["nz_out"]),
            "status": status,
        }

    z = jnp.zeros((1, block), jnp.float32)
    carry = {
        "ax": coords0[0][0], "ay": coords0[0][1], "az": coords0[0][2],
        "bx": coords0[1][0], "by": coords0[1][1], "bz": coords0[1][2],
        "cx": coords0[2][0], "cy": coords0[2][1], "cz": coords0[2][2],
        "i0": ids0[0], "i1": ids0[1], "i2": ids0[2],
        "nx": nx0, "ny": ny0, "nz": nz0, "dd": dd0,
        "alive": alive0,
        "nv": izero + 4,
        "it": izero,
        "done": jnp.where(active, izero, izero + 1),
        "depth": z, "nx_out": z, "ny_out": z, "nz_out": z,
        "status": izero + Status.HIT_EPA_CAP,
    }
    out = lax.while_loop(cond, body, carry)
    depth = jnp.where(active, out["depth"], 0.0)
    normal = pwhere(active, P3(out["nx_out"], out["ny_out"], out["nz_out"]),
                    pzero(block))
    status = jnp.where(active, out["status"], 0)
    return depth, normal, out["it"], status


def _polish_direction(support, depth, normal: P3, status, ok, block,
                      rounds: int = 6, spread: float = 0.45,
                      shrink: float = 1.0 / 3.0,
                      promote_capacity: bool = False):
    """Fixed-cost refinement of (depth, normal) for smooth analytic pairs.

    Penetration depth = min over unit directions d of the Minkowski
    support value h(d) = <support(d), d> (distance from the origin to the
    boundary of A(-)B).  Polytopal EPA approaches that minimum by face
    refinement, which on smooth surfaces (the cylinder-rim tail,
    docs/DESIGN.md) needs 30-90 data-dependent iterations and makes whole
    blocks straggle.  For analytic shapes h(d) is exact and costs one
    closed-form support probe, so after a *capped* EPA localizes the
    basin, a fixed 3x3 tangent-grid descent (8 probes x `rounds`, step
    shrinking by `shrink`) polishes the direction to ~1e-3 rad and the
    depth to ~R*1e-6 — deterministic cost, no stragglers, and the result
    is MORE accurate than converged f32 EPA (whose duplicate-support
    termination leaves ~1e-3*R error, measured).

    The reported depth h(d*) is realized along the reported normal:
    translating B by depth*normal exactly separates the pair (an upper
    bound of the true depth, vs EPA's lower-bound d_min) — the observable
    contract of ref :994-1009 with a tighter error bar.

    Lanes with ~ok (inactive, or degenerate zero normal) pass through.
    Polished lanes report status HIT; capacity-stopped lanes keep their
    status so the cascade can still re-run them at a bigger budget
    (unless `promote_capacity`, for the final stage)."""
    unit = pnorm(normal) > 0.5
    ok = ok & unit
    # orthonormal tangent basis at n (unit on ok lanes)
    small_x = jnp.abs(normal.x) < 0.9
    one = jnp.ones((1, block), jnp.float32)
    zero = jnp.zeros((1, block), jnp.float32)
    helper = P3(jnp.where(small_x, one, zero),
                jnp.where(small_x, zero, one), zero)
    u = putz(pcross(normal, helper), 1e-20)
    v = pcross(normal, u)

    def h_at(a, b):
        # |n + a u + b v|^2 = 1 + a^2 + b^2 exactly (orthonormal frame)
        inv = 1.0 / jnp.sqrt(1.0 + a * a + b * b)
        d = P3((normal.x + a * u.x + b * v.x) * inv,
               (normal.y + a * u.y + b * v.y) * inv,
               (normal.z + a * u.z + b * v.z) * inv)
        return pdot(support(d), d), d

    a0 = _vzero(block)               # lane-varying: the body writes per-lane
    b0 = _vzero(block)
    best_h, _ = h_at(a0, b0)

    # one probe per fori step (compile-size: one body, not rounds*8 copies);
    # the 8 ring offsets around the center are derived arithmetically from
    # the step index (a loop-carried table lookup trips Mosaic layout
    # inference, DESIGN.md lowering rule 5)
    def body(r, c):
        best_h, a0, b0, s = c
        k = r % 8
        k2 = k + jnp.where(k >= 4, 1, 0)         # skip the (0,0) center
        da = (k2 // 3 - 1).astype(jnp.float32)
        db = (k2 % 3 - 1).astype(jnp.float32)
        aa = a0 + da * s
        bb = b0 + db * s
        hh, _ = h_at(aa, bb)
        better = ok & (hh < best_h)
        best_h = jnp.where(better, hh, best_h)
        a0 = jnp.where(better, aa, a0)
        b0 = jnp.where(better, bb, b0)
        s = jnp.where(k == 7, s * shrink, s)
        return best_h, a0, b0, s

    s0 = _vzero(block) + spread
    best_h, a0, b0, _ = lax.fori_loop(0, 8 * rounds, body,
                                      (best_h, a0, b0, s0))
    _, d_best = h_at(a0, b0)
    depth_out = jnp.where(ok, best_h, depth)
    normal_out = pwhere(ok, d_best, normal)
    if promote_capacity:
        promote = ok
    else:
        promote = ok & (status != Status.HIT_EPA_CAPACITY)
    status_out = jnp.where(promote, Status.HIT, status)
    return depth_out, normal_out, status_out


def _epa_cascade(support, simplex, active, stages, block):
    """Run the EPA tier ladder inside ONE kernel.

    `stages` is a list of (cfg, k_vis) tiers.  Stage 1 runs over all active
    lanes; each later stage re-runs only the lanes the previous one stopped
    for a CAPACITY reason (face-buffer / visible-set overflow — a larger
    budget fixes those; intrinsic degeneracy and the iteration cap reproduce
    identically at any capacity and are never retried, see _cascade_plan).
    Every retry tier sits behind a scalar cond, so the common all-converged
    block pays nothing for the ladder.

    This is the block-local equivalent of the former XLA-level cascade (one
    pallas pass + row rewrite + merge per stage): results are identical
    per-lane; what changed is that the retry decision is per-block instead
    of global, which deletes the per-stage inactive-program floor (~0.3 ms
    per 64k-lane pass) and the inter-stage glue."""
    c0, kv0 = stages[0]
    depth, normal, it, status = _epa_phase_fast(support, simplex, active, c0,
                                                block, k_vis=kv0)
    z1 = jnp.zeros((1, block), jnp.float32)
    zi = jnp.zeros((1, block), jnp.int32)
    for c, kv in stages[1:]:
        retry = active & (status == Status.HIT_EPA_CAPACITY)

        def run_tier(_, c=c, kv=kv, retry=retry):
            return _epa_phase_fast(support, simplex, retry, c, block,
                                   k_vis=kv)

        def skip_tier(_):
            return z1, P3(z1, z1, z1), zi, zi

        d2, n2, i2, s2 = lax.cond(jnp.any(retry), run_tier, skip_tier, None)
        depth = jnp.where(retry, d2, depth)
        normal = pwhere(retry, n2, normal)
        it = jnp.where(retry, i2, it)
        status = jnp.where(retry, s2, status)
    return depth, normal, it, status


def _hull_broadphase(v1x, v1y, v1z, v2x, v2y, v2z, tol):
    c1 = P3(jnp.mean(v1x, axis=0, keepdims=True),
            jnp.mean(v1y, axis=0, keepdims=True),
            jnp.mean(v1z, axis=0, keepdims=True))
    c2 = P3(jnp.mean(v2x, axis=0, keepdims=True),
            jnp.mean(v2y, axis=0, keepdims=True),
            jnp.mean(v2z, axis=0, keepdims=True))
    r1 = jnp.max(jnp.sqrt((v1x - c1.x) ** 2 + (v1y - c1.y) ** 2
                          + (v1z - c1.z) ** 2), axis=0, keepdims=True)
    r2 = jnp.max(jnp.sqrt((v2x - c2.x) ** 2 + (v2y - c2.y) ** 2
                          + (v2z - c2.z) ** 2), axis=0, keepdims=True)
    return pnorm(c1 - c2) <= r1 + r2 + tol


def _hull_views(p1_ref, p2_ref, block):
    # refs are (3, N, BLOCK): coordinate-major so the last two dims stay
    # tile-aligned for any block size
    n1 = p1_ref.shape[1]
    n2 = p2_ref.shape[1]
    v1 = (p1_ref[0, :, :], p1_ref[1, :, :], p1_ref[2, :, :])
    v2 = (p2_ref[0, :, :], p2_ref[1, :, :], p2_ref[2, :, :])
    iota1 = lax.broadcasted_iota(jnp.int32, (n1, block), 0)
    iota2 = lax.broadcasted_iota(jnp.int32, (n2, block), 0)
    support = _make_hull_support(*v1, *v2, iota1, iota2)
    return support, v1, v2


def _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex):
    # rows: 0 hit, 1 status, 2 gjk_iters, 3 sep, 4..15 simplex xyz*4
    f = jnp.float32
    hit = status == Status.HIT
    out_ref[0:1, :] = jnp.where(hit, 1.0, 0.0).astype(f)
    out_ref[1:2, :] = status.astype(f)
    out_ref[2:3, :] = gjk_iters.astype(f)
    out_ref[3:4, :] = sep.astype(f)
    for i in range(4):
        out_ref[4 + 3 * i:5 + 3 * i, :] = simplex[i].x
        out_ref[5 + 3 * i:6 + 3 * i, :] = simplex[i].y
        out_ref[6 + 3 * i:7 + 3 * i, :] = simplex[i].z
    out_ref[16:24, :] = jnp.zeros((8, block), f)


def _read_simplex(gin_ref):
    return tuple(
        P3(gin_ref[4 + 3 * i:5 + 3 * i, :], gin_ref[5 + 3 * i:6 + 3 * i, :],
           gin_ref[6 + 3 * i:7 + 3 * i, :])
        for i in range(4))


def _gjk_guard(support, active, table_xyz, cfg, block):
    """Run the whole GJK phase (init probes + iterate loop) only if any lane
    in the block is active (scalar cond).

    The init phase alone costs 4+ support probes plus the containment test,
    and it previously ran in EVERY block — including blocks whose lanes were
    all broadphase-rejected or closed-form-final (96 of 128 on the 64k
    mixed-analytic bench).  The skip branch reproduces `_gjk_phase`'s
    all-inactive outputs exactly: status MISS_BROADPHASE, zero iters, zero
    separation (the simplex rows of inactive lanes are never read)."""
    z = pzero(block)
    zi = jnp.zeros((1, block), jnp.int32)

    def skip(_):
        return ((z, z, z, z),
                jnp.full((1, block), Status.MISS_BROADPHASE, jnp.int32),
                zi, jnp.zeros((1, block), jnp.float32))

    return lax.cond(jnp.any(active),
                    lambda _: _gjk_phase(support, active, table_xyz, cfg,
                                         block),
                    skip, None)


def _epa_act(gin_ref):
    """EPA activity recomputed from the permuted gin rows: hit (row 0) and
    not closed-form-final (row 16; always zero on the hull path).  Computing
    it in-kernel saves the XLA-side (enb, eb) row rewrite per stage."""
    return (gin_ref[0:1, :] > 0.5) & (gin_ref[16:17, :] < 0.5)


def _epa_guard(active, block, phase):
    """Run `phase()` only if any lane in the block is active (scalar cond).

    A fully-inactive EPA program otherwise still pays the (F, BLOCK) carry
    initialization before its while loop can exit — measured at ~4.7 us per
    program for the F=208 tier, i.e. 2.4 ms per 64k-pair call spent on
    blocks with nothing to do.  Inactive lanes' outputs are identical
    either way: _write_epa_out selects per-lane between the cascade result
    (active), the closed-form channel (final) and zeros+GJK status (miss),
    and skipped blocks have no active lanes."""
    z1 = jnp.zeros((1, block), jnp.float32)
    zi = jnp.zeros((1, block), jnp.int32)

    def skip(_):
        return z1, P3(z1, z1, z1), zi, zi

    return lax.cond(jnp.any(active), lambda _: phase(), skip, None)


def _write_epa_out(out_ref, block, active, depth, normal, epa_iters, status,
                   gin_ref):
    """Write the EPA output rows, MERGED: every lane leaves with its final
    depth/normal/status, so the XLA side needs no where(final/miss, ...)
    passes at all (they cost ~0.2 ms of (B,)-row fusions per 64k call).

      * active lanes: the cascade's depth/normal; status with any surviving
        CAPACITY verdict mapped to HIT_EPA_DEGENERATE (a capacity exit from
        the FINAL tier is degenerate to callers — same mapping the XLA
        driver used to apply);
      * closed-form-final lanes (gin row 16; always zero on the hull path):
        the exact depth/normal the GJK kernel carried in rows 17-20;
      * everything else (misses): zeros, with the GJK status (row 1)
        passed through.

    Runs OUTSIDE the _epa_guard — skipped all-inactive blocks still pass
    their closed-form/miss rows through (a handful of (1, BLOCK) selects).
    """
    f = jnp.float32
    final = gin_ref[16:17, :] > 0.5
    status = jnp.where(status == Status.HIT_EPA_CAPACITY,
                       Status.HIT_EPA_DEGENERATE, status)
    out_ref[0:1, :] = jnp.where(
        active, depth, jnp.where(final, gin_ref[17:18, :], 0.0)).astype(f)
    out_ref[1:2, :] = jnp.where(
        active, normal.x, jnp.where(final, gin_ref[18:19, :], 0.0)).astype(f)
    out_ref[2:3, :] = jnp.where(
        active, normal.y, jnp.where(final, gin_ref[19:20, :], 0.0)).astype(f)
    out_ref[3:4, :] = jnp.where(
        active, normal.z, jnp.where(final, gin_ref[20:21, :], 0.0)).astype(f)
    out_ref[4:5, :] = jnp.where(active, epa_iters, 0).astype(f)
    out_ref[5:6, :] = jnp.where(active, status.astype(f), gin_ref[1:2, :])
    out_ref[6:8, :] = jnp.zeros((2, block), f)


def _make_hull_support_streamed(p1_ref, p2_ref, s1_ref, s2_ref, sem1, sem2,
                                tile, block):
    """Support map over hulls RESIDENT IN HBM, streamed through VMEM.

    The resident kernels hold both (3, N, block) hull buffers in VMEM,
    which caps N at ~4k vertices combined (VERDICT round-2 item 6 /
    SURVEY.md §5.7).  Here the hulls stay in HBM (`pltpu.ANY` operands);
    every support probe runs a fori_loop over N/tile slabs, DMA-ing each
    (3, tile, block) slab into scratch and folding it into a running
    (max-dot, argmax-vertex-coords) reduction — the support-scan analog of
    blockwise attention.  Strict `>` folding keeps the FIRST maximum across
    slabs, and argmax keeps it within a slab, so tie-breaking matches the
    reference's sequential strict-> scan (ref :1040-1057) exactly.

    Cost is bandwidth-bound: each probe re-reads both hulls (~24*N*block
    bytes).  That is the honest price of N beyond VMEM; the resident
    kernels remain the fast path for small N (`_auto_block`).
    """
    n1 = p1_ref.shape[2]
    n2 = p2_ref.shape[2]
    iota = lax.broadcasted_iota(jnp.int32, (tile, block), 0)
    prog = pl.program_id(0)

    def one_hull(p_ref, s_ref, sem, n, sign):
        nt = n // tile

        def scan(d: P3) -> P3:
            def body(t, carry):
                best, bx, by, bz = carry
                cp = pltpu.make_async_copy(
                    p_ref.at[prog, :, pl.ds(t * tile, tile), :], s_ref, sem)
                cp.start()
                cp.wait()
                vx, vy, vz = s_ref[0, :, :], s_ref[1, :, :], s_ref[2, :, :]
                dots = sign * (vx * d.x + vy * d.y + vz * d.z)
                i = jnp.argmax(dots, axis=0, keepdims=True)
                oh = iota == i
                m = jnp.max(dots, axis=0, keepdims=True)
                ax = jnp.sum(jnp.where(oh, vx, 0.0), axis=0, keepdims=True)
                ay = jnp.sum(jnp.where(oh, vy, 0.0), axis=0, keepdims=True)
                az = jnp.sum(jnp.where(oh, vz, 0.0), axis=0, keepdims=True)
                better = m > best
                return (jnp.where(better, m, best),
                        jnp.where(better, ax, bx),
                        jnp.where(better, ay, by),
                        jnp.where(better, az, bz))

            z = _vzero(block)            # lane-varying carry inits
            best, bx, by, bz = lax.fori_loop(
                0, nt, body, (z - 3.4e38, z, z, z))
            return P3(bx, by, bz)

        return scan

    scan1 = one_hull(p1_ref, s1_ref, sem1, n1, 1.0)
    scan2 = one_hull(p2_ref, s2_ref, sem2, n2, -1.0)

    def support(d: P3) -> P3:
        return scan1(d) - scan2(d)

    return support


def _gjk_kernel_hulls_big(p1_ref, p2_ref, act_ref, out_ref, s1, s2,
                          sem1, sem2, *, cfg, block, tile):
    """GJK over HBM-resident hulls (streamed support; broadphase comes in
    precomputed via act_ref row 0 — it needs a full pass over the vertices,
    which XLA does in one cheap map outside the kernel)."""
    support = _make_hull_support_streamed(p1_ref, p2_ref, s1, s2, sem1, sem2,
                                          tile, block)
    active = act_ref[0:1, :] > 0.5
    simplex, status, gjk_iters, sep = _gjk_guard(support, active, _TABLE_ROWS,
                                                 cfg, block)
    _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex)


def _epa_cascade_kernel_hulls_big(p1_ref, p2_ref, gin_ref, out_ref, s1, s2,
                                  sem1, sem2, *, stages, block, tile):
    support = _make_hull_support_streamed(p1_ref, p2_ref, s1, s2, sem1, sem2,
                                          tile, block)
    active = _epa_act(gin_ref)
    simplex = _read_simplex(gin_ref)
    depth, normal, epa_iters, status = _epa_guard(
        active, block,
        lambda: _epa_cascade(support, simplex, active, stages, block))
    _write_epa_out(out_ref, block, active, depth, normal, epa_iters, status,
                   gin_ref)


def _gjk_kernel_hulls(p1_ref, p2_ref, out_ref, *, cfg, block, use_broadphase):
    support, v1, v2 = _hull_views(p1_ref, p2_ref, block)
    if use_broadphase:
        active = _hull_broadphase(*v1, *v2, cfg.broadphase_tol)
        simplex, status, gjk_iters, sep = _gjk_guard(
            support, active, _TABLE_ROWS, cfg, block)
    else:
        active = jnp.ones((1, block), bool)
        simplex, status, gjk_iters, sep = _gjk_phase(
            support, active, _TABLE_ROWS, cfg, block)
    _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex)


def _epa_cascade_kernel_hulls(p1_ref, p2_ref, gin_ref, out_ref, *, stages,
                              block):
    support, _, _ = _hull_views(p1_ref, p2_ref, block)
    active = _epa_act(gin_ref)
    simplex = _read_simplex(gin_ref)
    depth, normal, epa_iters, status = _epa_guard(
        active, block,
        lambda: _epa_cascade(support, simplex, active, stages, block))
    _write_epa_out(out_ref, block, active, depth, normal, epa_iters, status,
                   gin_ref)


class FusedResult(NamedTuple):
    hit: jnp.ndarray
    status: jnp.ndarray
    depth: jnp.ndarray
    normal: jnp.ndarray      # (B, 3)
    gjk_iters: jnp.ndarray
    epa_iters: jnp.ndarray
    distance: jnp.ndarray    # separation lower bound (miss lanes)


def _round_cfg(cfg):
    """Mosaic needs sublane-aligned (F, BLOCK)/(3F, BLOCK) buffers: round
    the EPA caps up to multiples of 8 (a larger cap only allows more
    expansion; converged results are unchanged)."""
    if cfg is None:
        cfg = GJKEPAConfig.for_f32()
    rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
    if cfg.epa_max_verts % 8 or cfg.epa_max_faces % 8:
        cfg = cfg.replace(epa_max_verts=rup(cfg.epa_max_verts),
                          epa_max_faces=rup(cfg.epa_max_faces))
    return cfg


def _cascade_plan(cfg):
    """EPA tier ladder for the hull path: (cfg, k_vis) pairs, consumed by
    _epa_cascade INSIDE one kernel (the tiers used to be separate pallas
    passes; the per-lane semantics are unchanged).

    Tier 1: compact-visible EPA with a small face buffer (F=48, K=8) —
    covers the vast majority of contacts at minimum per-iteration cost.
    Final tier: sized for the WORST case (face capacity 2*epa_max_iters+10
    covers every iteration up to the reference's cap, ref :299, and K=16
    covers the over-K visible sets measured at <0.1%) — it re-runs only the
    lanes the previous tier stopped for a CAPACITY reason
    (Status.HIT_EPA_CAPACITY: face-buffer or visible-set overflow, which a
    larger budget fixes); intrinsically degenerate or iteration-capped
    lanes reproduce identically under any capacity and are never retried.
    Face capacity on this path is an implementation detail sized from the
    iteration cap, not the cfg.epa_max_faces knob (which still governs the
    portable XLA path).

    The middle F=88 tier lets slow-converging curved contacts (30-40
    iterations ~ 80+ live faces) finish without restarting at the
    worst-case F=208 budget, while polytopal contacts (<= 20 iterations)
    still run the cheap F=48 tier (measured on the 16k deep-hull workload).

    epa_max_iters == 0 means boolean-only mode: no EPA kernel at all (the
    reference's miss path never enters EPA, ref :178-236)."""
    if cfg.epa_max_iters == 0:
        return []
    rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
    full_f = rup(max(2 * cfg.epa_max_iters + 10, cfg.epa_max_faces))
    tiers = [(48, 8), (88, 8)]
    stages = [(cfg.replace(epa_max_faces=f), k)
              for f, k in tiers if f < full_f]
    stages.append((cfg.replace(epa_max_faces=full_f), 16))
    return stages


def _vecspec(rows, block):
    return pl.BlockSpec((1, rows, block), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_two_phase(gjk_kernel, epa_kernel, geom_arrays, geom_specs, b, block,
                   interpret, sort_hits, epa_block=None, epa_geom_specs=None,
                   out_rows=24, geom_in_rows=False, scratch_shapes=None,
                   pre_dest=None, epa_geom_arrays=None, epa_prefix_div=8):
    """Shared two-phase driver.

    Phase 1 (GJK) runs over the natural order.  Phase 2 (EPA) runs over a
    hit-compacted order: pairs are permuted so active lanes occupy the
    leading blocks, letting the per-block EPA while-loop exit immediately
    for the inactive majority — EPA cost scales with the number of
    contacts, not the batch size.  `epa_kernel` is ONE kernel carrying the
    whole capacity-tier ladder internally (_epa_cascade); it recomputes its
    activity from the gin rows (_epa_act).  Outputs are scattered back.

    `epa_kernel` may be None (boolean-only mode: the reference's miss
    path never enters EPA, ref :76-77,182-236): the GJK kernel result is
    returned directly with zero depth/normal and no EPA dispatch at all.

    `geom_arrays` are the pre-transposed per-pair geometry inputs whose
    leading dim is nb and whose LAST dim is the lane (pair) dim.

    `epa_block` (default: same as `block`) lets the EPA phase run at a
    DIFFERENT lane width than GJK: GJK is cheapest at wide blocks (fewer
    programs amortize the per-program floor; its iterate loop is short and
    uniform), while EPA wants narrow blocks (its while loop runs to the
    slowest lane in the block, and 30+-iteration stragglers are rare —
    narrow blocks contain them).  The permute step between the phases
    already rebuilds the lane layout, so the re-blocking is free.  When
    set, `epa_geom_specs` must carry the epa_block-shaped BlockSpecs and
    the EPA kernels must be built with block=epa_block.

    `pre_dest` (optional (B,) int32): the caller already scattered pair i
    into lane pre_dest[i] before the GJK kernel (GJK-lane grouping); the
    result assembly composes the inverse into its existing gathers so
    outputs come back in the caller's natural order at no extra passes.
    """
    nb = b // block
    eb = epa_block or block
    enb = b // eb
    epa_geom_specs = epa_geom_specs if epa_geom_specs is not None else geom_specs

    gout = pl.pallas_call(
        gjk_kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((nb, out_rows, block), jnp.float32),
        in_specs=list(geom_specs),
        out_specs=_vecspec(out_rows, block),
        scratch_shapes=scratch_shapes or [],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*geom_arrays)

    gflat = jnp.swapaxes(gout, 1, 2).reshape(b, out_rows)    # (B, R)
    hit = gflat[:, 0] > 0.5
    # rows 16-20: kernel-final channel (closed-form analytic lanes carry
    # their exact depth/normal straight from the GJK kernel; hull kernels
    # leave the channel zero).  Final lanes never enter the EPA phase.
    final = gflat[:, 16] > 0.5
    epa_act = hit & ~final

    if epa_kernel is None:  # boolean-only: one kernel launch, nothing else
        # Closed-form analytic lanes (kernel-final channel, rows 17-20)
        # carry exact depth/normal even in boolean mode — merge them so
        # epa_max_iters=0 loses nothing on those lanes.
        g = gflat[:, :21][pre_dest] if pre_dest is not None else gflat
        fin = g[:, 16] > 0.5
        return FusedResult(
            hit=g[:, 0] > 0.5,
            status=g[:, 1].astype(jnp.int32),
            depth=jnp.where(fin, g[:, 17], 0.0),
            normal=jnp.where(fin[:, None], g[:, 18:21], 0.0),
            gjk_iters=g[:, 2].astype(jnp.int32),
            epa_iters=jnp.zeros((b,), jnp.int32),
            distance=g[:, 3],
        )

    # Hit-compaction permutation: hit lanes first (stable).  dest (natural
    # lane -> compacted lane) comes from ONE cumsum: with c = inclusive
    # prefix count of active lanes and i = iota, dest[i] = c-1 for active
    # lanes and n_act + (i - c) for inactive ones (i - c = count of
    # inactive lanes strictly before i).  The inverse `order` comes from a
    # 2-array sort keyed on dest — NOT from a scatter and NOT from an
    # argsort over data keys: on this TPU a 64k-lane scatter lowers to
    # sort+apply whose apply pass alone costs 0.33 ms (3x a row gather)
    # and a 1-D s32 gather costs 0.47 ms (packed-layout pathology), while
    # lax.sort on two s32[64k] arrays is 0.03 ms.  All row movement is
    # GATHERS: forward by order, backward by dest.
    if sort_hits:
        act_i = epa_act.astype(jnp.int32)
        c = jnp.cumsum(act_i)
        i = jnp.arange(b, dtype=jnp.int32)
        dest = jnp.where(epa_act, c - 1, c[-1] + i - c)
        _, order = lax.sort((dest, i), num_keys=1)
    else:
        dest = order = jnp.arange(b)

    def permute_geom(arr):
        # (nb, *feat, block) -> flat pair-major -> gathered by order ->
        # back at the EPA lane width (enb, *feat, eb).  All reshapes go
        # through 2-D swapaxes: XLA's 4-D transposes with a tiny inner dim
        # run ~70x slower on TPU.
        shp = arr.shape
        feat = int(np.prod(shp[1:-1]))
        flat = jnp.swapaxes(arr.reshape(nb, feat, block), 1, 2).reshape(b, feat)
        flat = flat[order]
        back = jnp.swapaxes(flat.reshape(enb, eb, feat), 1, 2)
        return back.reshape((enb,) + shp[1:-1] + (eb,))

    # `geom_in_rows`: the GJK kernel copied the per-pair geometry into its
    # output rows (shapes path: packed shape rows 24-55), so the EPA phase
    # needs ONE permuted gather of gflat instead of one per geometry array
    # — this killed ~40% of the inter-phase XLA glue on the 64k analytic
    # workload (the geometry permutes were reshape+gather+reshape each).
    # `epa_geom_arrays`: the EPA phase may need only a SUBSET of the GJK
    # geometry (mixed hull-shape path: the shape rows ride in the gin rows,
    # only the hull buffer is re-permuted).
    geom_src = geom_arrays if epa_geom_arrays is None else epa_geom_arrays
    geom_p = (() if geom_in_rows
              else tuple(permute_geom(a) for a in geom_src))
    # EPA activity (hit & ~final, rows 0/16) is recomputed from the
    # permuted rows INSIDE the kernel (_epa_act) — no XLA-side row rewrite.
    g_perm = gflat[order]
    gin = jnp.swapaxes(g_perm.reshape(enb, eb, out_rows), 1, 2)

    epa_in_specs = ([] if geom_in_rows else list(epa_geom_specs))

    def epa_pass(gin_i, geom_i):
        blocks = gin_i.shape[0]
        eo = pl.pallas_call(
            epa_kernel,
            grid=(blocks,),
            out_shape=jax.ShapeDtypeStruct((blocks, 8, eb), jnp.float32),
            in_specs=epa_in_specs + [_vecspec(out_rows, eb)],
            out_specs=_vecspec(8, eb),
            scratch_shapes=scratch_shapes or [],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*geom_i, gin_i)
        return jnp.swapaxes(eo, 1, 2).reshape(blocks * eb, 8)

    def passthrough_rows(g):
        # XLA twin of _write_epa_out's inactive-lane merge (bit-identical
        # selects): closed-form-final lanes carry rows 17-20, misses carry
        # zeros + the GJK status (row 1).
        fin = g[:, 16] > 0.5
        z = jnp.zeros((g.shape[0],), jnp.float32)
        return jnp.stack(
            [jnp.where(fin, g[:, 17], 0.0), jnp.where(fin, g[:, 18], 0.0),
             jnp.where(fin, g[:, 19], 0.0), jnp.where(fin, g[:, 20], 0.0),
             z, g[:, 1], z, z], axis=1)

    # Compact EPA dispatch: after the hit-compaction every EPA-active lane
    # sits in the first n_act lanes, so the pallas pass only needs to scan
    # the first C = b/8 lanes — 8x less inactive-program floor and gin DMA.
    # The rare dense-contact batch (n_act > C) falls back to the full-width
    # pass behind a scalar lax.cond; the inactive tail's output rows are
    # reproduced by an XLA select twin of the kernel's passthrough.
    # (Streamed large-N path keeps the full-width pass: its ANY-space hull
    # operands are shared by all programs and the floor is already small.)
    C = max(eb, (b // epa_prefix_div) // eb * eb)
    if sort_hits and C < b and not scratch_shapes:
        cblk = C // eb
        eflat_c = epa_pass(gin[:cblk], tuple(a[:cblk] for a in geom_p))
        n_act = c[-1]
        eflat_tail = lax.cond(
            n_act > C,
            lambda _: epa_pass(gin[cblk:],                   # tail blocks only
                               tuple(a[cblk:] for a in geom_p)),
            lambda _: passthrough_rows(g_perm[C:]),
            None)
        eflat_p = jnp.concatenate([eflat_c, eflat_tail], axis=0)
    else:
        eflat_p = epa_pass(gin, geom_p)                      # permuted space
    # back to the CALLER's order: chained f32 ROW gathers (compacted ->
    # grouped -> natural) — composing the two index maps first would itself
    # be a 1-D s32 gather, which costs 4x more than the row gathers (64k
    # row gathers cost ~0.1 ms each regardless of row width, so the EPA
    # rows and the GJK-kernel rows ride ONE gather as a concat).
    eflat = eflat_p[dest]
    if pre_dest is not None:
        comb = jnp.concatenate([eflat, gflat[:, :4]], axis=1)[pre_dest]
        eflat, gnat = comb[:, :8], comb[:, 8:]
    else:
        gnat = gflat

    # The EPA kernel already merged closed-form/miss lanes into its output
    # rows (_write_epa_out), so the result assembly is pure slicing.
    return FusedResult(
        hit=gnat[:, 0] > 0.5,
        status=eflat[:, 5].astype(jnp.int32),
        depth=eflat[:, 0],
        normal=eflat[:, 1:4],
        gjk_iters=gnat[:, 2].astype(jnp.int32),
        epa_iters=eflat[:, 4].astype(jnp.int32),
        distance=gnat[:, 3],
    )


def _mask_to_padding(p, mask):
    """Replace masked-out vertices with the hull's first valid vertex.

    A repeated vertex adds no geometry, so this is observably equivalent to
    masking for every support-based quantity; and because padding rows sit
    after the valid rows, first-max argmax tie-breaking (the reference's
    strict-> scan, ref :1040-1057) picks the same index as the masked form.
    """
    if mask is None:
        return p
    first = jnp.argmax(mask, axis=1)                      # first valid row
    fv = jnp.take_along_axis(p, first[:, None, None], axis=1)
    return jnp.where(mask[:, :, None], p, fv)


_AUTO_BLOCK_BUDGET = 6 * 1024 * 1024


def _auto_block(block, n1, n2, budget_bytes=_AUTO_BLOCK_BUDGET):
    """Clamp the lane-block width so both (3, N, block) f32 hull buffers fit
    a VMEM budget (SURVEY.md §5.7 large-hull scaling).  The kernels hold the
    whole padded hulls resident; at N=64 any block works, at N=1024 the
    default block=512 would need ~25 MB of VMEM for inputs alone (the chip
    has ~16 MB).  Lane blocks stay multiples of 128 (the VPU lane width)."""
    per_lane = (n1 + n2) * 3 * 4
    fit = max(budget_bytes // per_lane // 128 * 128, 128)
    return min(block, fit)


def _pad_batch(b, block, *arrays):
    """Pad the pair axis up to a multiple of `block` (min 128) with lanes
    displaced far apart so the in-kernel broadphase retires them; returns
    (padded_arrays, padded_b).  Displacement goes on the LAST array."""
    bp = max(block, 128)
    pad = (-b) % bp
    if pad == 0:
        return arrays, b
    out = []
    for k, a in enumerate(arrays):
        pad_rows = jnp.repeat(a[:1], pad, axis=0)
        if k == len(arrays) - 1:
            pad_rows = pad_rows + jnp.asarray(4e4, a.dtype)
        out.append(jnp.concatenate([a, pad_rows], axis=0))
    return tuple(out), b + pad


def _fused_hulls_streamed(p1, p2, b, cfg, use_broadphase, interpret,
                          sort_hits, block: int = 128, tile: int = 1024):
    """Large-N hull pipeline: HBM-resident hulls, streamed support scans.

    Same two-phase dispatch and cascade semantics as the resident path;
    hulls enter the kernels as `pltpu.ANY` (HBM) operands and every support
    probe streams (3, tile, block) slabs through VMEM scratch
    (_make_hull_support_streamed).  The lane width is fixed at 128 (probe
    cost dominates; wide blocks buy nothing and quadruple scratch VMEM) and
    the broadphase is precomputed in XLA (one cheap full pass).  The
    vertex axis is padded to a tile multiple by repeating the first vertex
    (adds no geometry; padding rows sit last so first-max tie-breaking is
    unchanged — same argument as _mask_to_padding)."""
    n1, n2 = p1.shape[1], p2.shape[1]

    def pad_tile(p):
        pad = (-p.shape[1]) % tile
        if pad == 0:
            return p
        return jnp.concatenate([p, jnp.repeat(p[:, :1], pad, axis=1)], axis=1)

    p1 = pad_tile(p1)
    p2 = pad_tile(p2)
    n1, n2 = p1.shape[1], p2.shape[1]
    nb = b // block

    def to_kernel_layout(p, n):
        flat = jnp.swapaxes(p.reshape(nb, block, n * 3), 1, 2)
        return flat.reshape(nb, n, 3, block).swapaxes(1, 2)

    p1t = to_kernel_layout(p1, n1)
    p2t = to_kernel_layout(p2, n2)

    # broadphase outside the kernel (ref :1165-1188 semantics)
    if use_broadphase:
        c1 = jnp.mean(p1, axis=1)
        c2 = jnp.mean(p2, axis=1)
        r1 = jnp.max(jnp.linalg.norm(p1 - c1[:, None], axis=2), axis=1)
        r2 = jnp.max(jnp.linalg.norm(p2 - c2[:, None], axis=2), axis=1)
        active = (jnp.linalg.norm(c1 - c2, axis=1)
                  <= r1 + r2 + cfg.broadphase_tol)
    else:
        active = jnp.ones((b,), bool)
    act = jnp.zeros((nb, 8, block), jnp.float32).at[:, 0, :].set(
        jnp.where(active, 1.0, 0.0).reshape(nb, block))

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    specs = (any_spec, any_spec, _vecspec(8, block))
    scratch = [pltpu.VMEM((3, tile, block), jnp.float32),
               pltpu.VMEM((3, tile, block), jnp.float32),
               pltpu.SemaphoreType.DMA,
               pltpu.SemaphoreType.DMA]

    def gjk_wrap(p1r, p2r, actr, outr, s1, s2, m1, m2):
        _gjk_kernel_hulls_big(p1r, p2r, actr.at[0], outr.at[0], s1, s2,
                              m1, m2, cfg=cfg, block=block, tile=tile)

    stages = _cascade_plan(cfg)
    if stages:
        def epa_wrap(p1r, p2r, actr, ginr, outr, s1, s2, m1, m2):
            del actr  # EPA activity comes from the gin block
            _epa_cascade_kernel_hulls_big(p1r, p2r, ginr.at[0], outr.at[0],
                                          s1, s2, m1, m2, stages=stages,
                                          block=block, tile=tile)
    else:
        epa_wrap = None
    return _run_two_phase(gjk_wrap, epa_wrap, (p1t, p2t, act), specs, b,
                          block, interpret, sort_hits,
                          scratch_shapes=scratch)


@functools.partial(jax.jit, static_argnames=("cfg", "block", "use_broadphase",
                                             "interpret", "sort_hits"))
def fused_gjkepa_hulls(p1, p2, mask1=None, mask2=None,
                       cfg: GJKEPAConfig | None = None, block: int = 512,
                       use_broadphase: bool = True, interpret: bool = False,
                       sort_hits: bool = True) -> FusedResult:
    """Fused-kernel batch query over hull pairs (two-phase dispatch).

    Args:
      p1, p2: (B, N, 3) float32 vertex buffers.  Any B >= 1 (internally
        padded to the lane width with broadphase-rejected lanes).  Ragged
        hulls: pass per-vertex validity masks, or pre-pad by repeating a
        real vertex (utils.hull.pad_hulls) — the two are equivalent.
      mask1, mask2: optional (B, N) bool validity masks for padded rows.
      sort_hits: permute pairs between the GJK and EPA kernels so hit lanes
        share blocks — EPA cost then scales with the number of HITS, not
        the batch size.

    Returns hit/status/depth/normal + iteration counters + miss-distance
    lower bound.  Contact derivation (nearest points, contact point/type)
    stays in the XLA ops; feed them `normal` if needed.
    """
    cfg = _round_cfg(cfg)
    p1 = _mask_to_padding(p1, mask1)
    p2 = _mask_to_padding(p2, mask2)
    b_user = p1.shape[0]
    (p1, p2), b = _pad_batch(b_user, min(block, 128), p1, p2)
    n1, n2 = p1.shape[1], p2.shape[1]
    if (n1 + n2) * 3 * 4 * 128 > _AUTO_BLOCK_BUDGET:
        # hulls too large to hold VMEM-resident at any lane width: stream
        # them through VMEM from HBM (SURVEY.md §5.7, VERDICT round-2 item 6)
        res = _fused_hulls_streamed(p1, p2, b, cfg, use_broadphase,
                                    interpret, sort_hits)
        if b != b_user:
            res = FusedResult(*(x[:b_user] for x in res))
        return res
    block = _auto_block(min(block, b), n1, n2)
    if b % block != 0:
        block = 128
    nb = b // block
    # coordinate-major (nb, 3, N, block) layout: last two block dims (N,
    # block) are tile-aligned for any block size; built with 2-D swaps
    # (tiny-inner-dim 4-D transposes are pathologically slow on TPU)
    def to_kernel_layout(p, n):
        flat = jnp.swapaxes(p.reshape(nb, block, n * 3), 1, 2)  # (nb, n*3, blk)
        return flat.reshape(nb, n, 3, block).swapaxes(1, 2)     # (nb, 3, n, blk)

    p1t = to_kernel_layout(p1, n1)
    p2t = to_kernel_layout(p2, n2)

    specs = (
        pl.BlockSpec((1, 3, n1, block), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n2, block), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    def gjk_wrap(p1r, p2r, outr):
        _gjk_kernel_hulls(p1r.at[0], p2r.at[0], outr.at[0], cfg=cfg,
                          block=block, use_broadphase=use_broadphase)

    # EPA runs at a narrow lane width (straggler containment) regardless of
    # the wide GJK block — see _run_two_phase
    eb = min(block, 128)
    epa_specs = (
        pl.BlockSpec((1, 3, n1, eb), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, n2, eb), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    stages = _cascade_plan(cfg)
    if stages:
        def epa_wrap(p1r, p2r, ginr, outr):
            _epa_cascade_kernel_hulls(p1r.at[0], p2r.at[0], ginr.at[0],
                                      outr.at[0], stages=stages, block=eb)
    else:
        epa_wrap = None
    res = _run_two_phase(gjk_wrap, epa_wrap, (p1t, p2t), specs, b, block,
                         interpret, sort_hits, epa_block=eb,
                         epa_geom_specs=epa_specs)
    if b != b_user:
        res = FusedResult(*(x[:b_user] for x in res))
    return res


# ---------------------------------------------------------------------------
# Analytic-shape mode (BASELINE config 3): closed-form supports in-kernel.
# Each shape is packed as 16 rows of f32:
#   [kind, p0, p1, p2, pos.x, pos.y, pos.z, r00..r22]  (kind exact in f32)
# ---------------------------------------------------------------------------


def _shape_support_side(s, d: P3) -> P3:
    """World support point of one packed analytic shape block (16, BLOCK)
    along per-lane directions d."""
    kind = s[0:1, :]
    p0, p1, p2 = s[1:2, :], s[2:3, :], s[3:4, :]
    tx, ty, tz = s[4:5, :], s[5:6, :], s[6:7, :]
    r00, r01, r02 = s[7:8, :], s[8:9, :], s[9:10, :]
    r10, r11, r12 = s[10:11, :], s[11:12, :], s[12:13, :]
    r20, r21, r22 = s[13:14, :], s[14:15, :], s[15:16, :]
    # d_local = R^T d
    dl = P3(r00 * d.x + r10 * d.y + r20 * d.z,
            r01 * d.x + r11 * d.y + r21 * d.z,
            r02 * d.x + r12 * d.y + r22 * d.z)
    # sphere: radius p0 * unit(dl)
    n = pnorm(dl)
    inv = jnp.where(n > 1e-20, 1.0 / jnp.where(n > 1e-20, n, 1.0), 0.0)
    sph = pscale(dl, inv * p0)
    # box: sign(dl) * half extents (p0,p1,p2)
    box = P3(jnp.where(dl.x >= 0.0, p0, -p0),
             jnp.where(dl.y >= 0.0, p1, -p1),
             jnp.where(dl.z >= 0.0, p2, -p2))
    # capsule: radius p0 * unit(dl) + (0,0,+-p1)
    cap_end = jnp.where(dl.z >= 0.0, p1, -p1)
    cap = P3(sph.x, sph.y, sph.z + cap_end)
    # cylinder: rim p0*unit(dl.xy) + (0,0,+-p1)
    np_ = jnp.sqrt(dl.x * dl.x + dl.y * dl.y)
    invp = jnp.where(np_ > 1e-20, 1.0 / jnp.where(np_ > 1e-20, np_, 1.0), 0.0)
    cyl = P3(p0 * dl.x * invp, p0 * dl.y * invp, cap_end)
    # select by kind (0 sphere, 1 box, 2 capsule, 3 cylinder)
    sl = pwhere(kind < 0.5, sph,
                pwhere(kind < 1.5, box,
                       pwhere(kind < 2.5, cap, cyl)))
    # world = R s + t
    return P3(r00 * sl.x + r01 * sl.y + r02 * sl.z + tx,
              r10 * sl.x + r11 * sl.y + r12 * sl.z + ty,
              r20 * sl.x + r21 * sl.y + r22 * sl.z + tz)


def _make_shape_support(sa, sb):
    """Minkowski support over two packed analytic shape blocks (16, BLOCK)."""

    def support(d: P3) -> P3:
        return _shape_support_side(sa, d) - _shape_support_side(sb, -d)

    return support


def _shape_radius(s):
    """Conservative bounding radius of a packed shape block (16, BLOCK)."""
    kind = s[0:1, :]
    p0, p1, p2 = s[1:2, :], s[2:3, :], s[3:4, :]
    rbox = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    return jnp.where(kind < 0.5, p0,
                     jnp.where(kind < 1.5, rbox, p0 + p1))


def _shape_broadphase(sa, sb, tol):
    radius = _shape_radius

    ca = P3(sa[4:5, :], sa[5:6, :], sa[6:7, :])
    cb = P3(sb[4:5, :], sb[5:6, :], sb[6:7, :])
    return pnorm(ca - cb) <= radius(sa) + radius(sb) + tol


def _closed_form_rows(sa, sb, tol, block):
    """In-kernel exact answers for the analytic pair types with closed
    forms — the row-vectorized twin of `_closed_form_shape_pairs` (same
    math, same observables; computed in-kernel so the 64k-batch pipeline
    does not pay separate fusion passes + merges):

      * {sphere,capsule} x {sphere,capsule}: swept-sphere segment-segment
        distance;
      * sphere-box (either order): point-box clamp;
      * sphere-cylinder (either order): point-vs-solid-cylinder clamp;
      * box-box: SAT over the 15 separating axes (3+3 face normals +
        9 edge cross products — exactly the face normals of the box-box
        Minkowski difference, so the minimum-overlap axis IS the exact
        EPA depth/normal, ref observables :994-1009).

    Returns (final, depth, normal P3, gap, status); `final` lanes bypass
    GJK/EPA entirely.  Normal points A -> B (EPA convention)."""
    k1, k2 = sa[0:1, :], sb[0:1, :]
    r1, r2 = sa[1:2, :], sb[1:2, :]
    # kind codes: 0 sphere, 1 box, 2 capsule, 3 cylinder
    is_ss1 = (k1 < 0.5) | ((k1 > 1.5) & (k1 < 2.5))
    is_ss2 = (k2 < 0.5) | ((k2 > 1.5) & (k2 < 2.5))
    both_swept = is_ss1 & is_ss2
    s_b = (k1 < 0.5) & (jnp.abs(k2 - 1.0) < 0.5)
    b_s = (jnp.abs(k1 - 1.0) < 0.5) & (k2 < 0.5)
    s_c = (k1 < 0.5) & (k2 > 2.5)
    c_s = (k1 > 2.5) & (k2 < 0.5)
    b_b = (jnp.abs(k1 - 1.0) < 0.5) & (jnp.abs(k2 - 1.0) < 0.5)
    final = both_swept | s_b | b_s | s_c | c_s | b_b

    pos1 = P3(sa[4:5, :], sa[5:6, :], sa[6:7, :])
    pos2 = P3(sb[4:5, :], sb[5:6, :], sb[6:7, :])

    # -- swept-sphere pair: segment-segment closest points ------------------
    L1 = jnp.where((k1 > 1.5) & (k1 < 2.5), sa[2:3, :], 0.0)
    L2 = jnp.where((k2 > 1.5) & (k2 < 2.5), sb[2:3, :], 0.0)
    u1 = P3(sa[9:10, :], sa[12:13, :], sa[15:16, :])   # R column 2 (local z)
    u2 = P3(sb[9:10, :], sb[12:13, :], sb[15:16, :])
    rv = pos1 - pos2
    bb = pdot(u1, u2)
    cc = pdot(u1, rv)
    ff = pdot(u2, rv)
    den = 1.0 - bb * bb
    s0 = jnp.where(den > 1e-12,
                   (ff * bb - cc) / jnp.where(den > 1e-12, den, 1.0), 0.0)
    s = jnp.clip(s0, -L1, L1)
    t = jnp.clip(s * bb + ff, -L2, L2)
    s = jnp.clip(t * bb - cc, -L1, L1)
    dvec = (pos2 + pscale(u2, t)) - (pos1 + pscale(u1, s))
    dist = pnorm(dvec)
    inv = 1.0 / jnp.maximum(dist, 1e-20)
    zhat = P3(jnp.zeros((1, block), jnp.float32),
              jnp.zeros((1, block), jnp.float32),
              jnp.ones((1, block), jnp.float32))
    n_ss = pwhere(dist > 1e-12, pscale(dvec, inv), zhat)
    depth_ss = r1 + r2 - dist
    gap_ss = dist - (r1 + r2)

    # -- sphere-box (either order) ------------------------------------------
    def sphere_vs_box(c_sph, r_sph, s_box):
        pb = P3(s_box[4:5, :], s_box[5:6, :], s_box[6:7, :])
        hx, hy, hz = s_box[1:2, :], s_box[2:3, :], s_box[3:4, :]
        d = c_sph - pb
        r00, r01, r02 = s_box[7:8, :], s_box[8:9, :], s_box[9:10, :]
        r10, r11, r12 = s_box[10:11, :], s_box[11:12, :], s_box[12:13, :]
        r20, r21, r22 = s_box[13:14, :], s_box[14:15, :], s_box[15:16, :]
        dl = P3(r00 * d.x + r10 * d.y + r20 * d.z,
                r01 * d.x + r11 * d.y + r21 * d.z,
                r02 * d.x + r12 * d.y + r22 * d.z)
        cl = P3(jnp.clip(dl.x, -hx, hx), jnp.clip(dl.y, -hy, hy),
                jnp.clip(dl.z, -hz, hz))
        delta = dl - cl
        d_out = pnorm(delta)
        outside = d_out > 1e-12
        n_out = pscale(delta, -1.0 / jnp.maximum(d_out, 1e-20))
        penx, peny, penz = hx - jnp.abs(dl.x), hy - jnp.abs(dl.y), hz - jnp.abs(dl.z)
        m = jnp.minimum(penx, jnp.minimum(peny, penz))
        ax_x = (penx <= peny) & (penx <= penz)
        ax_y = (~ax_x) & (peny <= penz)
        ax_z = (~ax_x) & (~ax_y)
        sg = lambda c: jnp.where(c >= 0.0, 1.0, -1.0)  # noqa: E731
        n_in = P3(-jnp.where(ax_x, sg(dl.x), 0.0),
                  -jnp.where(ax_y, sg(dl.y), 0.0),
                  -jnp.where(ax_z, sg(dl.z), 0.0))
        depth = jnp.where(outside, r_sph - d_out, r_sph + m)
        nl = pwhere(outside, n_out, n_in)
        nw = P3(r00 * nl.x + r01 * nl.y + r02 * nl.z,
                r10 * nl.x + r11 * nl.y + r12 * nl.z,
                r20 * nl.x + r21 * nl.y + r22 * nl.z)
        return depth, nw, jnp.maximum(d_out - r_sph, 0.0)

    d_sb, n_sb, g_sb = sphere_vs_box(pos1, r1, sb)
    d_bs, n_bs, g_bs = sphere_vs_box(pos2, r2, sa)
    n_bs = -n_bs

    # -- sphere-cylinder (either order): point vs solid cylinder -------------
    def sphere_vs_cyl(c_sph, r_sph, s_cyl):
        pc = P3(s_cyl[4:5, :], s_cyl[5:6, :], s_cyl[6:7, :])
        rc, hc = s_cyl[1:2, :], s_cyl[2:3, :]
        r00, r01, r02 = s_cyl[7:8, :], s_cyl[8:9, :], s_cyl[9:10, :]
        r10, r11, r12 = s_cyl[10:11, :], s_cyl[11:12, :], s_cyl[12:13, :]
        r20, r21, r22 = s_cyl[13:14, :], s_cyl[14:15, :], s_cyl[15:16, :]
        d = c_sph - pc
        dl = P3(r00 * d.x + r10 * d.y + r20 * d.z,
                r01 * d.x + r11 * d.y + r21 * d.z,
                r02 * d.x + r12 * d.y + r22 * d.z)
        rho = jnp.sqrt(dl.x * dl.x + dl.y * dl.y)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        # scale is EXACTLY 1.0 inside (clip semantics): rho*(1/rho) = 1 +/-
        # 1 ulp would leave delta ~ 1e-8 > eps and misclassify inside lanes
        scale = jnp.where(rho > rc, rc * inv_rho, 1.0)
        qz = jnp.clip(dl.z, -hc, hc)
        delta = P3(dl.x - dl.x * scale, dl.y - dl.y * scale, dl.z - qz)
        d_out = pnorm(delta)
        outside = d_out > 1e-12
        n_out = pscale(delta, -1.0 / jnp.maximum(d_out, 1e-20))
        pen_lat = rc - rho
        pen_cap = hc - jnp.abs(dl.z)
        use_lat = pen_lat <= pen_cap
        lx = jnp.where(rho > 1e-12, dl.x * inv_rho, 1.0)
        ly = jnp.where(rho > 1e-12, dl.y * inv_rho, 0.0)
        sgz = jnp.where(dl.z >= 0.0, 1.0, -1.0)
        n_in = P3(jnp.where(use_lat, -lx, 0.0),
                  jnp.where(use_lat, -ly, 0.0),
                  jnp.where(use_lat, 0.0, -sgz))
        depth = jnp.where(outside, r_sph - d_out,
                          r_sph + jnp.minimum(pen_lat, pen_cap))
        nl = pwhere(outside, n_out, n_in)
        nw = P3(r00 * nl.x + r01 * nl.y + r02 * nl.z,
                r10 * nl.x + r11 * nl.y + r12 * nl.z,
                r20 * nl.x + r21 * nl.y + r22 * nl.z)
        return depth, nw, jnp.maximum(d_out - r_sph, 0.0)

    d_sc, n_sc, g_sc = sphere_vs_cyl(pos1, r1, sb)
    d_cs, n_cs, g_cs = sphere_vs_cyl(pos2, r2, sa)
    n_cs = -n_cs

    # -- box-box: SAT minimum-translation over the 15 axes -------------------
    def box_box_sat(sa_, sb_):
        ha = (sa_[1:2, :], sa_[2:3, :], sa_[3:4, :])
        hb = (sb_[1:2, :], sb_[2:3, :], sb_[3:4, :])
        ax = [P3(sa_[7 + j:8 + j, :], sa_[10 + j:11 + j, :],
                 sa_[13 + j:14 + j, :]) for j in range(3)]
        bx = [P3(sb_[7 + j:8 + j, :], sb_[10 + j:11 + j, :],
                 sb_[13 + j:14 + j, :]) for j in range(3)]
        t = pos2 - pos1
        BIGF = jnp.float32(3.4e38)
        axes = ax + bx + [pcross(ax[i], bx[j])
                          for i in range(3) for j in range(3)]
        best = jnp.full((1, block), BIGF)
        bn = pzero(block)
        sep = jnp.full((1, block), -BIGF)
        for L in axes:
            ln2 = pdot(L, L)
            valid = ln2 > 1e-12
            inv = 1.0 / jnp.sqrt(jnp.where(valid, ln2, 1.0))
            s = pdot(t, L) * inv
            ra = (ha[0] * jnp.abs(pdot(ax[0], L)) + ha[1] * jnp.abs(pdot(ax[1], L))
                  + ha[2] * jnp.abs(pdot(ax[2], L))) * inv
            rb = (hb[0] * jnp.abs(pdot(bx[0], L)) + hb[1] * jnp.abs(pdot(bx[1], L))
                  + hb[2] * jnp.abs(pdot(bx[2], L))) * inv
            ov = ra + rb - jnp.abs(s)
            sep = jnp.maximum(sep, jnp.where(valid, -ov, -BIGF))
            ovv = jnp.where(valid, ov, BIGF)
            better = ovv < best
            best = jnp.where(better, ovv, best)
            sgn = jnp.where(s >= 0.0, 1.0, -1.0)
            bn = pwhere(better, pscale(L, inv * sgn), bn)
        return best, bn, jnp.maximum(sep, 0.0)

    d_bb, n_bb, g_bb = box_box_sat(sa, sb)

    depth = jnp.where(both_swept, depth_ss, jnp.where(s_b, d_sb, d_bs))
    normal = pwhere(both_swept, n_ss, pwhere(s_b, n_sb, n_bs))
    gap = jnp.where(both_swept, gap_ss, jnp.where(s_b, g_sb, g_bs))
    depth = jnp.where(s_c, d_sc, jnp.where(c_s, d_cs, depth))
    normal = pwhere(s_c, n_sc, pwhere(c_s, n_cs, normal))
    gap = jnp.where(s_c, g_sc, jnp.where(c_s, g_cs, gap))
    depth = jnp.where(b_b, d_bb, depth)
    normal = pwhere(b_b, n_bb, normal)
    gap = jnp.where(b_b, g_bb, gap)
    hit = final & (depth > 0.0)
    depth = jnp.where(hit, depth, 0.0)
    normal = pwhere(hit, normal, pzero(block))
    status = jnp.where(hit, jnp.int32(Status.HIT),
                       jnp.where(gap > tol, jnp.int32(Status.MISS_BROADPHASE),
                                 jnp.int32(Status.MISS_GJK)))
    return final, depth, normal, gap, status


def _cf_kind_mask(sa, sb):
    """The closed-form `final` predicate of _closed_form_rows, kinds only
    (exact integer-code comparisons — bit-identical between the XLA
    grouping predicate and the in-kernel recompute)."""
    k1, k2 = sa[0:1, :], sb[0:1, :]
    is_ss1 = (k1 < 0.5) | ((k1 > 1.5) & (k1 < 2.5))
    is_ss2 = (k2 < 0.5) | ((k2 > 1.5) & (k2 < 2.5))
    s_b = (k1 < 0.5) & (jnp.abs(k2 - 1.0) < 0.5)
    b_s = (jnp.abs(k1 - 1.0) < 0.5) & (k2 < 0.5)
    s_c = (k1 < 0.5) & (k2 > 2.5)
    c_s = (k1 > 2.5) & (k2 < 0.5)
    b_b = (jnp.abs(k1 - 1.0) < 0.5) & (jnp.abs(k2 - 1.0) < 0.5)
    return (is_ss1 & is_ss2) | s_b | b_s | s_c | c_s | b_b


# Shapes GJK-kernel output layout: rows 0-23 = the standard _write_gjk_out
# channels (incl. the closed-form rows 16-20); rows 24-39 / 40-55 = a copy
# of the packed shape rows of A / B.  The EPA phase reads its geometry from
# these rows of the (already permuted) gin block, so the inter-phase glue
# is ONE gather instead of three (see _run_two_phase geom_in_rows).
_SHAPE_OUT_ROWS = 56

# Split-pipeline closed-form kernel output layout (natural order, no
# simplex / geometry copies needed): 0 hit, 1 status, 2 depth, 3-5 normal,
# 6 distance, 7 pad.
_CF_OUT_ROWS = 8


def _cf_kernel_shapes(sa_ref, sb_ref, out_ref, *, cfg, block):
    """Closed-form-only shapes kernel (split pipeline, natural pair order).

    Produces the exact per-lane results of _gjk_kernel_shapes for every
    lane that does NOT enter the GJK loop: closed-form analytic pairs
    (`final`) carry their exact depth/normal/status, everything else is
    the broadphase-miss row the _gjk_guard skip branch would emit
    (status MISS_BROADPHASE, zero depth/distance).  Lanes that DO need
    the GJK loop are handled by _gjk_sub_kernel_shapes on the gathered
    subset; their rows here are ignored by the caller's g0 merge.
    """
    sa = sa_ref[:, :]
    sb = sb_ref[:, :]
    final, cf_depth, cf_n, cf_gap, cf_status = _closed_form_rows(
        sa, sb, cfg.broadphase_tol, block)
    f = jnp.float32
    miss = jnp.full((1, block), Status.MISS_BROADPHASE, jnp.int32)
    status = jnp.where(final, cf_status, miss)
    sep = jnp.where(final, jnp.maximum(cf_gap, 0.0), 0.0)
    finf = jnp.where(final, 1.0, 0.0).astype(f)
    out_ref[0:1, :] = jnp.where(status == Status.HIT, 1.0, 0.0).astype(f)
    out_ref[1:2, :] = status.astype(f)
    out_ref[2:3, :] = cf_depth.astype(f) * finf
    out_ref[3:4, :] = cf_n.x.astype(f) * finf
    out_ref[4:5, :] = cf_n.y.astype(f) * finf
    out_ref[5:6, :] = cf_n.z.astype(f) * finf
    out_ref[6:7, :] = sep.astype(f)
    out_ref[7:8, :] = jnp.zeros((1, block), f)


def _gjk_sub_kernel_shapes(sa_ref, sb_ref, out_ref, *, cfg, block):
    """GJK-loop-only shapes kernel (split pipeline, compact subset order).

    Runs on the gathered subset of pairs whose XLA-side grouping predicate
    said "broadphase overlap and no closed form".  Activity is recomputed
    in-kernel from the same formulas (the XLA predicate carries a margin,
    so every kernel-active lane is guaranteed to be in the subset; filler
    lanes fail the in-kernel test and whole filler blocks skip via
    _gjk_guard).  Output rows match _gjk_kernel_shapes minus the
    closed-form channel (rows 16-20 stay zero: no subset lane is final).
    """
    sa = sa_ref[:, :]
    sb = sb_ref[:, :]
    support = _make_shape_support(sa, sb)
    # sa row 16: the dispatch's swept-envelope retirement bit (a certified
    # miss decided ONCE in XLA and consumed identically by every branch)
    active = (_shape_broadphase(sa, sb, cfg.broadphase_tol)
              & ~_cf_kind_mask(sa, sb) & (sa[16:17, :] < 0.5))
    simplex, status, gjk_iters, sep = _gjk_guard(support, active, _TABLE_ROWS,
                                                 cfg, block)
    _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex)
    out_ref[24:40, :] = sa[0:16, :]
    out_ref[40:56, :] = sb[0:16, :]


def _gjk_kernel_shapes(sa_ref, sb_ref, out_ref, *, cfg, block):
    sa = sa_ref[:, :]
    sb = sb_ref[:, :]
    support = _make_shape_support(sa, sb)
    final, cf_depth, cf_n, cf_gap, cf_status = _closed_form_rows(
        sa, sb, cfg.broadphase_tol, block)
    # sa row 16: swept-envelope retirement bit (see _gjk_sub_kernel_shapes)
    active = (_shape_broadphase(sa, sb, cfg.broadphase_tol) & ~final
              & (sa[16:17, :] < 0.5))
    simplex, status, gjk_iters, sep = _gjk_guard(support, active, _TABLE_ROWS,
                                                 cfg, block)
    status = jnp.where(final, cf_status, status)
    sep = jnp.where(final, jnp.maximum(cf_gap, 0.0), sep)
    _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex)
    # rows 16-20: closed-form channel (consumed by _run_two_phase's merge)
    f = jnp.float32
    fin_f = jnp.where(final, 1.0, 0.0).astype(f)
    out_ref[16:17, :] = fin_f
    out_ref[17:18, :] = cf_depth.astype(f)
    out_ref[18:19, :] = cf_n.x.astype(f)
    out_ref[19:20, :] = cf_n.y.astype(f)
    out_ref[20:21, :] = cf_n.z.astype(f)
    out_ref[24:40, :] = sa[0:16, :]
    out_ref[40:56, :] = sb[0:16, :]


def _closed_form_shape_pairs(a, b, broadphase_tol):
    """Exact narrow-phase answers for the analytic pair types that have
    closed forms: {sphere,capsule} x {sphere,capsule} (swept-sphere
    segment-segment distance) and sphere-box (point-box clamp).

    NOTE: the production path computes these IN-KERNEL (`_closed_form_rows`,
    the row-vectorized twin of this function, written out via the
    kernel-final channel).  This XLA version is retained as the
    differential oracle for that kernel code (tests/test_fused.py) — the
    two must agree to f32 eps on every lane.

    These are precisely the smooth-shape pairs on which polytope EPA
    converges slowest AND carries ~1e-4*R polyhedral depth error; the
    closed forms are exact to f32 eps (a capability/accuracy extension —
    the reference handles vertex clouds only).

    Returns (handled, hit, depth, normal (B,3), distance, status) —
    fields only valid where `handled`.  Normal points A -> B (translating
    B by depth*normal separates the pair), matching the EPA convention.
    """
    from ..models.shapes import BOX, CAPSULE, CYLINDER, SPHERE

    k1, k2 = a.kind, b.kind
    r1, r2 = a.params[:, 0], b.params[:, 0]
    is_ss1 = (k1 == SPHERE) | (k1 == CAPSULE)
    is_ss2 = (k2 == SPHERE) | (k2 == CAPSULE)
    both_swept = is_ss1 & is_ss2
    sb = (k1 == SPHERE) & (k2 == BOX)
    bs = (k1 == BOX) & (k2 == SPHERE)
    sc = (k1 == SPHERE) & (k2 == CYLINDER)
    cs = (k1 == CYLINDER) & (k2 == SPHERE)
    # NB: name must not collide with the swept-sphere section's `bb` dot
    bbx = (k1 == BOX) & (k2 == BOX)
    handled = both_swept | sb | bs | sc | cs | bbx

    # -- swept-sphere pair: segment-segment closest points -------------------
    L1 = jnp.where(k1 == CAPSULE, a.params[:, 1], 0.0)
    L2 = jnp.where(k2 == CAPSULE, b.params[:, 1], 0.0)
    u1 = a.rot[:, :, 2]                       # capsule axis: local z, world
    u2 = b.rot[:, :, 2]
    rvec = a.pos - b.pos
    bb = jnp.einsum("ij,ij->i", u1, u2)
    cc = jnp.einsum("ij,ij->i", u1, rvec)
    ff = jnp.einsum("ij,ij->i", u2, rvec)
    den = 1.0 - bb * bb
    s0 = jnp.where(den > 1e-12, (ff * bb - cc) / jnp.where(den > 1e-12, den, 1.0),
                   0.0)
    s = jnp.clip(s0, -L1, L1)
    t = jnp.clip(s * bb + ff, -L2, L2)
    s = jnp.clip(t * bb - cc, -L1, L1)
    q1 = a.pos + s[:, None] * u1
    q2 = b.pos + t[:, None] * u2
    dvec = q2 - q1
    dist_core = jnp.linalg.norm(dvec, axis=1)
    safe = jnp.maximum(dist_core, 1e-20)
    n_ss = jnp.where((dist_core > 1e-12)[:, None], dvec / safe[:, None],
                     jnp.array([0.0, 0.0, 1.0], jnp.float32)[None, :])
    depth_ss = r1 + r2 - dist_core
    gap_ss = dist_core - (r1 + r2)

    # -- sphere-box (either order) -------------------------------------------
    def sphere_vs_box(c_sph, r_sph, p_box, rot_box, h_box):
        dl = jnp.einsum("ikj,ik->ij", rot_box, c_sph - p_box)  # R^T (c - p)
        cl = jnp.clip(dl, -h_box, h_box)
        delta = dl - cl
        d_out = jnp.linalg.norm(delta, axis=1)
        outside = d_out > 1e-12
        n_out_l = -delta / jnp.maximum(d_out, 1e-20)[:, None]
        # inside: exit through the nearest face
        pen = h_box - jnp.abs(dl)
        ax = jnp.argmin(pen, axis=1)
        oh = jax.nn.one_hot(ax, 3, dtype=dl.dtype)
        sgn = jnp.sign(jnp.einsum("ij,ij->i", oh, dl))
        sgn = jnp.where(sgn == 0.0, 1.0, sgn)
        n_in_l = -(sgn[:, None] * oh)
        depth = jnp.where(outside, r_sph - d_out,
                          r_sph + jnp.min(pen, axis=1))
        n_l = jnp.where(outside[:, None], n_out_l, n_in_l)
        n_w = jnp.einsum("ijk,ik->ij", rot_box, n_l)       # R n
        return depth, n_w, jnp.maximum(d_out - r_sph, 0.0)

    d_sb, n_sb, gap_sb = sphere_vs_box(a.pos, r1, b.pos, b.rot, b.params)
    d_bs, n_bs, gap_bs = sphere_vs_box(b.pos, r2, a.pos, a.rot, a.params)
    n_bs = -n_bs

    # -- sphere-cylinder (either order): point vs solid cylinder -------------
    def sphere_vs_cyl(c_sph, r_sph, p_cyl, rot_cyl, prm_cyl):
        rc, hc = prm_cyl[:, 0], prm_cyl[:, 1]
        dl = jnp.einsum("ikj,ik->ij", rot_cyl, c_sph - p_cyl)  # R^T (c - p)
        rho = jnp.sqrt(dl[:, 0] ** 2 + dl[:, 1] ** 2)
        inv_rho = 1.0 / jnp.maximum(rho, 1e-20)
        # exactly 1.0 inside — see the kernel twin (_closed_form_rows)
        scale = jnp.where(rho > rc, rc * inv_rho, 1.0)
        q = jnp.stack([dl[:, 0] * scale, dl[:, 1] * scale,
                       jnp.clip(dl[:, 2], -hc, hc)], axis=1)
        delta = dl - q
        d_out = jnp.linalg.norm(delta, axis=1)
        outside = d_out > 1e-12
        n_out = -delta / jnp.maximum(d_out, 1e-20)[:, None]
        pen_lat = rc - rho
        pen_cap = hc - jnp.abs(dl[:, 2])
        use_lat = pen_lat <= pen_cap
        lx = jnp.where(rho > 1e-12, dl[:, 0] * inv_rho, 1.0)
        ly = jnp.where(rho > 1e-12, dl[:, 1] * inv_rho, 0.0)
        sgz = jnp.where(dl[:, 2] >= 0.0, 1.0, -1.0)
        n_in = jnp.stack([jnp.where(use_lat, -lx, 0.0),
                          jnp.where(use_lat, -ly, 0.0),
                          jnp.where(use_lat, 0.0, -sgz)], axis=1)
        depth = jnp.where(outside, r_sph - d_out,
                          r_sph + jnp.minimum(pen_lat, pen_cap))
        n_l = jnp.where(outside[:, None], n_out, n_in)
        n_w = jnp.einsum("ijk,ik->ij", rot_cyl, n_l)
        return depth, n_w, jnp.maximum(d_out - r_sph, 0.0)

    d_sc, n_sc, gap_sc = sphere_vs_cyl(a.pos, r1, b.pos, b.rot, b.params)
    d_cs, n_cs, gap_cs = sphere_vs_cyl(b.pos, r2, a.pos, a.rot, a.params)
    n_cs = -n_cs

    # -- box-box: SAT minimum-translation over the 15 axes -------------------
    def box_box_sat():
        BIGF = jnp.float32(3.4e38)
        t = b.pos - a.pos                              # (B, 3)
        ax = [a.rot[:, :, j] for j in range(3)]        # world axis columns
        bx = [b.rot[:, :, j] for j in range(3)]
        axes = ax + bx + [jnp.cross(ax[i], bx[j])
                          for i in range(3) for j in range(3)]
        nB = t.shape[0]
        best = jnp.full((nB,), BIGF)
        bn = jnp.zeros((nB, 3), t.dtype)
        sep = jnp.full((nB,), -BIGF)
        for L in axes:
            ln2 = jnp.einsum("ij,ij->i", L, L)
            valid = ln2 > 1e-12
            inv = 1.0 / jnp.sqrt(jnp.where(valid, ln2, 1.0))
            s = jnp.einsum("ij,ij->i", t, L) * inv
            ra = sum(a.params[:, i] * jnp.abs(jnp.einsum("ij,ij->i", ax[i], L))
                     for i in range(3)) * inv
            rb = sum(b.params[:, j] * jnp.abs(jnp.einsum("ij,ij->i", bx[j], L))
                     for j in range(3)) * inv
            ov = ra + rb - jnp.abs(s)
            sep = jnp.maximum(sep, jnp.where(valid, -ov, -BIGF))
            ovv = jnp.where(valid, ov, BIGF)
            better = ovv < best
            best = jnp.where(better, ovv, best)
            sgn = jnp.where(s >= 0.0, 1.0, -1.0)
            bn = jnp.where(better[:, None], L * (inv * sgn)[:, None], bn)
        return best, bn, jnp.maximum(sep, 0.0)

    d_bb, n_bb, gap_bb = box_box_sat()

    depth = jnp.where(both_swept, depth_ss, jnp.where(sb, d_sb, d_bs))
    normal = jnp.where(both_swept[:, None], n_ss,
                       jnp.where(sb[:, None], n_sb, n_bs))
    gap = jnp.where(both_swept, gap_ss, jnp.where(sb, gap_sb, gap_bs))
    depth = jnp.where(sc, d_sc, jnp.where(cs, d_cs, depth))
    normal = jnp.where(sc[:, None], n_sc, jnp.where(cs[:, None], n_cs, normal))
    gap = jnp.where(sc, gap_sc, jnp.where(cs, gap_cs, gap))
    depth = jnp.where(bbx, d_bb, depth)
    normal = jnp.where(bbx[:, None], n_bb, normal)
    gap = jnp.where(bbx, gap_bb, gap)
    hit = handled & (depth > 0.0)
    depth = jnp.where(hit, depth, 0.0)
    normal = jnp.where(hit[:, None], normal, 0.0)
    bp_miss = gap > broadphase_tol
    status = jnp.where(hit, jnp.int32(Status.HIT),
                       jnp.where(bp_miss, jnp.int32(Status.MISS_BROADPHASE),
                                 jnp.int32(Status.MISS_GJK)))
    return handled, hit, depth, normal, gap, status


def _epa_cascade_kernel_shapes(gin_ref, out_ref, *, stages, block,
                               polish=True):
    """Shapes EPA kernel: in-kernel tier ladder + closed-form polish.

    Every analytic pair still reaching EPA has a curved side (all flat-flat
    combinations — box-box included — are answered in closed form by the
    GJK kernel), so the smooth-lane treatment applies to the WHOLE kernel:
    run the compact-visible EPA for at most _SMOOTH_EPA_CAP iterations
    (enough to localize the basin of the true contact direction; the K=16
    retry tier sits behind a scalar cond for the <0.1% of lanes whose
    visible set overflows K=8), then refine depth/normal ONCE with the
    fixed-cost support-function descent (_polish_direction).  This removes
    the 90-iteration cylinder-rim straggler tail entirely: worst-case EPA
    cost per lane is bounded and uniform."""
    support = _make_shape_support(gin_ref[24:40, :], gin_ref[40:56, :])
    active = _epa_act(gin_ref)
    simplex = _read_simplex(gin_ref)

    def run():
        depth, normal, epa_iters, status = _epa_cascade(
            support, simplex, active, stages, block)
        if polish:
            depth, normal, status = _polish_direction(
                support, depth, normal, status, active, block,
                promote_capacity=True)
        return depth, normal, epa_iters, status

    depth, normal, epa_iters, status = _epa_guard(active, block, run)
    _write_epa_out(out_ref, block, active, depth, normal, epa_iters, status,
                   gin_ref)


def _pack_rows(batch):
    """ShapeBatch -> (B, 24) f32 packed rows.

    Rows 0-15: kind, params, pos, rot; rows 16-23 zero padding (sublane
    alignment).  Unrelated to the kernel OUTPUT row 16, which is the
    closed-form "final" channel written by the GJK kernel.
    """
    bsz = batch.kind.shape[0]
    kind = batch.kind.astype(jnp.float32)[:, None]
    params = batch.params.astype(jnp.float32)
    pos = batch.pos.astype(jnp.float32)
    rot = batch.rot.astype(jnp.float32).reshape(-1, 9)
    pad = jnp.zeros((bsz, 8), jnp.float32)
    return jnp.concatenate([kind, params, pos, rot, pad], axis=1)


def _rows_to_lanes(rows, nb, block):
    """(B, R) pair-major rows -> (nb, R, block) kernel blocks via ONE large
    2-D transpose + leading-dim swap: the direct (nb, block, R) ->
    (nb, R, block) form is a tiny-inner-dim 3-D transpose, which XLA:TPU
    executes ~10x slower."""
    R = rows.shape[1]
    return jnp.swapaxes(rows.T.reshape(R, nb, block), 0, 1)


def _pack_shapes(batch, nb, block, order=None):
    """ShapeBatch -> (nb, 24, block) f32 packed rows (see _pack_rows);
    `order` (optional (B,) int32 permutation) makes lane j take pair
    order[j]'s rows (a row GATHER — scatters cost 3x more on TPU)."""
    packed = _pack_rows(batch)
    if order is not None:
        packed = packed[order]
    return _rows_to_lanes(packed, nb, block)


@functools.partial(jax.jit, static_argnames=("cfg", "block", "interpret",
                                             "sort_hits"))
def fused_gjkepa_shapes(a, b, cfg: GJKEPAConfig | None = None, block: int = 128,
                        interpret: bool = False,
                        sort_hits: bool = True) -> FusedResult:
    """Fused-kernel batch query over analytic shape pairs (ShapeBatch pair).

    Same output surface as fused_gjkepa_hulls; broadphase uses conservative
    per-shape bounding radii.

    Dispatch (sort_hits=True, the production mode) is a SPLIT pipeline:

      * a closed-form kernel answers every non-GJK lane in the CALLER's
        natural order (9 of the 16 kind combinations have closed forms,
        and broadphase misses need no geometry at all), so the bulk of the
        batch never pays a permutation gather in either direction;
      * the minority of lanes that need the iterate loop — broadphase
        overlap and no closed form (predicate `g0`) — are gathered into a
        compact subset (cap C1 = B/8; the swept-envelope retirement
        keeps the population an order of magnitude below it) for the
        GJK kernel, then
        hit-compacted again (cap C2 = C1/8) for the EPA cascade;
      * results come back through ONE (B, 12) row gather + ONE transpose;
        every output field is then a contiguous row slice (column reads
        of a row-major (B, k) array are a TPU layout pathology measured
        at ~170 us per 64k call).

    The g0 predicate mirrors the kernels' own activity recompute but adds
    a relative margin, making it a guaranteed SUPERSET of the in-kernel
    broadphase (the two formulas can round differently between XLA and
    Mosaic); subset filler lanes fail the in-kernel test and cost nothing
    (whole filler blocks skip via _gjk_guard).  Batches denser than C1
    fall back to the round-3 grouped single-kernel path behind a scalar
    lax.cond — a speed tier, never a correctness one.
    """
    cfg = _round_cfg(cfg)
    b_user = a.kind.shape[0]
    pad = (-b_user) % max(min(block, 128), 128)
    if pad:
        def pad_shapes(sbatch, displace):
            rep = lambda x: jnp.concatenate(  # noqa: E731
                [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
            pos = rep(sbatch.pos)
            if displace:
                pos = pos.at[b_user:].add(4e4)
            return type(sbatch)(kind=rep(sbatch.kind), params=rep(sbatch.params),
                                pos=pos, rot=rep(sbatch.rot))
        a = pad_shapes(a, False)
        b = pad_shapes(b, True)
    bsz = a.kind.shape[0]
    block = min(block, bsz)
    if bsz % block != 0:
        block = 128
    nb = bsz // block
    eb = min(block, 128)
    f32 = jnp.float32

    # Shapes EPA: ONE kernel, two capped tiers + one polish.  Every EPA
    # lane is a smooth pair (flat-flat combinations are closed-form
    # final), so the capped treatment applies to the whole kernel: the
    # _SMOOTH_EPA_CAP iteration budget localizes the contact basin; F=48
    # covers the face growth of a capped run (4 + 2*cap <= 48) so the only
    # capacity exit left is the K=8 visible-set bound — the in-kernel K=16
    # retry tier covers those lanes behind a scalar cond.
    epa_wrap = None
    if cfg.epa_max_iters > 0:
        rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
        cap = min(_SMOOTH_EPA_CAP, cfg.epa_max_iters)
        stage_f = rup(max(2 * cap + 10, 48))
        stage_cfg = cfg.replace(epa_max_iters=cap, epa_max_faces=stage_f)
        stages = [(stage_cfg, 8), (stage_cfg, 16)]

        def epa_wrap(ginr, outr):
            _epa_cascade_kernel_shapes(ginr.at[0], outr.at[0], stages=stages,
                                       block=eb)

    def gjk_wrap(sar, sbr, outr):
        _gjk_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                           block=block)

    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    rows = jnp.concatenate([_pack_rows(a), _pack_rows(b)], axis=1)  # (B, 48)

    def lanes24(rows48, nblk):
        rt = rows48.T
        sa_ = jnp.swapaxes(rt[:24].reshape(24, nblk, block), 0, 1)
        sb_ = jnp.swapaxes(rt[24:].reshape(24, nblk, block), 0, 1)
        return sa_, sb_

    def legacy(rows48, pre_dest):
        sa_, sb_ = lanes24(rows48, nb)
        specs = (_vecspec(24, block), _vecspec(24, block))
        return _run_two_phase(gjk_wrap, epa_wrap, (sa_, sb_), specs, bsz,
                              block, interpret, sort_hits, epa_block=eb,
                              out_rows=_SHAPE_OUT_ROWS, geom_in_rows=True,
                              pre_dest=pre_dest)

    # --- grouping predicate (XLA twin of the kernels' activity test) -------
    ka = a.kind.astype(jnp.int32)
    kb = b.kind.astype(jnp.int32)
    sw_a = (ka == 0) | (ka == 2)
    sw_b = (kb == 0) | (kb == 2)
    cf = (sw_a & sw_b) | ((ka == 1) & (kb == 1))
    cf |= ((ka == 0) & (kb == 1)) | ((ka == 1) & (kb == 0))
    cf |= ((ka == 0) & (kb == 3)) | ((ka == 3) & (kb == 0))

    # --- swept-envelope retirement (capsule bound) -------------------------
    # A cylinder (r, half-height L) is CONTAINED in the capsule (r, L) on
    # the same axis, and the capsule-capsule gap is exact closed form
    # (Ericson's clamped segment-segment solve — the same formula the
    # closed-form channel uses for capsule pairs).  So for the GJK-lane
    # kind pairs where both sides are swept-boundable ({capsule,cylinder} x
    # {capsule,cylinder} minus the capsule-capsule closed form), a positive
    # envelope gap is a CERTIFIED miss: the lane skips the GJK subset
    # entirely and reports the envelope gap as its separation certificate
    # (status MISS_BROADPHASE: an envelope rejection, one tier tighter than
    # the sphere envelope of ref :1165-1188).  On the c3 bench fixture this
    # retires ~90% of the g0 population (8034 -> 791 GJK lanes).  The
    # margin keeps razor-edge lanes in the subset so a true hit can never
    # retire; the decision is made ONCE here and applied identically to
    # every dispatch branch (fast / legacy / unsorted), so results stay
    # bit-identical across them.
    pa_ = a.params.astype(f32)
    pb_ = b.params.astype(f32)
    r1e, l1e = pa_[:, 0], pa_[:, 1]
    r2e, l2e = pb_[:, 0], pb_[:, 1]
    pos_a = a.pos.astype(f32)
    pos_b = b.pos.astype(f32)
    u1e = a.rot.astype(f32)[:, :, 2]
    u2e = b.rot.astype(f32)[:, :, 2]
    rve = pos_a - pos_b
    bbe = jnp.sum(u1e * u2e, axis=1)
    cce = jnp.sum(u1e * rve, axis=1)
    ffe = jnp.sum(u2e * rve, axis=1)
    dene = 1.0 - bbe * bbe
    s0e = jnp.where(dene > 1e-12,
                    (ffe * bbe - cce) / jnp.where(dene > 1e-12, dene, 1.0),
                    0.0)
    se = jnp.clip(s0e, -l1e, l1e)
    te = jnp.clip(se * bbe + ffe, -l2e, l2e)
    se = jnp.clip(te * bbe - cce, -l1e, l1e)
    dve = (pos_b + u2e * te[:, None]) - (pos_a + u1e * se[:, None])
    env_gap = jnp.sqrt(jnp.sum(dve * dve, axis=1)) - r1e - r2e
    swept_both = ((ka == 2) | (ka == 3)) & ((kb == 2) | (kb == 3)) & ~cf
    retired = swept_both & (env_gap > 1e-4 + 1e-4 * (r1e + r2e))
    env_dist = jnp.maximum(env_gap, 0.0)
    # thread the decision to the kernels through spare packed row 16: the
    # in-kernel activity tests must consume the SAME bit (not recompute
    # the envelope) — otherwise a retired lane landing in the subset's
    # filler region (shuffled caller orders) passes the in-kernel
    # broadphase and un-skips whole filler blocks (measured: 49 -> 29M q/s
    # on the shuffled 64k config before this bit existed).
    rows = rows.at[:, 16].set(jnp.where(retired, 1.0, 0.0).astype(f32))

    def apply_retired(res):
        zi_ = jnp.zeros_like(res.gjk_iters)
        return FusedResult(
            hit=jnp.where(retired, False, res.hit),
            status=jnp.where(retired, Status.MISS_BROADPHASE, res.status),
            depth=jnp.where(retired, 0.0, res.depth),
            normal=jnp.where(retired[:, None], 0.0, res.normal),
            gjk_iters=jnp.where(retired, zi_, res.gjk_iters),
            epa_iters=jnp.where(retired, zi_, res.epa_iters),
            distance=jnp.where(retired, env_dist, res.distance),
        )

    if not sort_hits:
        res = apply_retired(legacy(rows, None))
        if bsz != b_user:
            res = FusedResult(*(x[:b_user] for x in res))
        return res

    def radius(s):
        p = s.params.astype(f32)
        rbox = jnp.sqrt(jnp.sum(p * p, axis=1))
        return jnp.where(s.kind == 0, p[:, 0],
                         jnp.where(s.kind == 1, rbox, p[:, 0] + p[:, 1]))

    gap = jnp.sqrt(jnp.sum((pos_a - pos_b) ** 2, axis=1))
    rr = radius(a) + radius(b) + cfg.broadphase_tol
    # relative margin >> f32 rounding differences between this computation
    # and the in-kernel _shape_broadphase: g0 must be a SUPERSET of the
    # kernel's activity for the split pipeline (below) to be lossless.
    g0 = (gap <= rr + 1e-4 + 1e-4 * jnp.abs(rr)) & ~cf & ~retired
    gi = g0.astype(jnp.int32)
    csum = jnp.cumsum(gi)
    n_g0 = csum[-1]
    iot = jnp.arange(bsz, dtype=jnp.int32)
    dest1 = jnp.where(g0, csum - 1, n_g0 + iot - csum)
    _, order1 = lax.sort((dest1, iot), num_keys=1)  # inverse, scatter-free

    C1 = max(block, (bsz // 8) // block * block)
    if C1 >= bsz:
        # small batch: the subset would be the whole batch — the grouped
        # single-kernel path is strictly cheaper.
        res = apply_retired(legacy(rows[order1], dest1))
        if bsz != b_user:
            res = FusedResult(*(x[:b_user] for x in res))
        return res

    def fast(_):
        # closed-form kernel over the natural order: no input permute
        sa_n, sb_n = lanes24(rows, nb)

        def cf_wrap(sar, sbr, outr):
            _cf_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                              block=block)

        gout_cf = pl.pallas_call(
            cf_wrap, grid=(nb,),
            out_shape=jax.ShapeDtypeStruct((nb, _CF_OUT_ROWS, block), f32),
            in_specs=[_vecspec(24, block), _vecspec(24, block)],
            out_specs=_vecspec(_CF_OUT_ROWS, block),
            compiler_params=cparams, interpret=interpret,
        )(sa_n, sb_n)

        # GJK kernel over the gathered compact subset.  The loop kernel
        # gets its OWN (narrower) lane width: its while loop runs to the
        # slowest lane in a block, and the subset is 100% loop lanes —
        # narrower blocks decouple the stragglers (the cf kernel keeps the
        # wide block: its cost is uniform).
        gb = min(block, _SUB_BLOCK)
        nbg = C1 // gb

        def lanes24g(rows48):
            rt = rows48.T
            sa_ = jnp.swapaxes(rt[:24].reshape(24, nbg, gb), 0, 1)
            sb_ = jnp.swapaxes(rt[24:].reshape(24, nbg, gb), 0, 1)
            return sa_, sb_

        sa_g, sb_g = lanes24g(rows[order1[:C1]])

        def sub_wrap(sar, sbr, outr):
            _gjk_sub_kernel_shapes(sar.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                                   block=gb)

        gout2 = pl.pallas_call(
            sub_wrap, grid=(nbg,),
            out_shape=jax.ShapeDtypeStruct((nbg, _SHAPE_OUT_ROWS, gb), f32),
            in_specs=[_vecspec(24, gb), _vecspec(24, gb)],
            out_specs=_vecspec(_SHAPE_OUT_ROWS, gb),
            compiler_params=cparams, interpret=interpret,
        )(sa_g, sb_g)

        hit2 = gout2[:, 0, :].reshape(C1)
        stat2 = gout2[:, 1, :].reshape(C1)
        iters2 = gout2[:, 2, :].reshape(C1)
        dist2 = gout2[:, 3, :].reshape(C1)
        zc = jnp.zeros((C1,), f32)

        if epa_wrap is None:
            # boolean-only: subset lanes carry zero depth/normal + GJK status
            eflat2 = jnp.stack([zc, zc, zc, zc, zc, stat2, zc, zc], axis=1)
        else:
            act2 = hit2 > 0.5
            ai = act2.astype(jnp.int32)
            c2 = jnp.cumsum(ai)
            i2 = jnp.arange(C1, dtype=jnp.int32)
            # hit-compaction + difficulty grouping: actives first, ordered
            # by GJK iteration count (a strong proxy for EPA cost — each
            # EPA block runs its cascade to the SLOWEST lane, so clustering
            # similar-cost lanes stops one straggler stalling 127 cheap
            # ones).  dest2 = inverse permutation via a second 2-array sort
            # (scatters cost 3x more than sorts on this TPU).
            key = jnp.where(act2, iters2.astype(jnp.int32), jnp.int32(1 << 20))
            _, order2 = lax.sort((key, i2), num_keys=1)
            _, dest2 = lax.sort((order2, i2), num_keys=1)
            gflat2 = jnp.swapaxes(gout2, 1, 2).reshape(C1, _SHAPE_OUT_ROWS)
            g_perm2 = gflat2[order2]
            enb2 = C1 // eb
            gin2 = jnp.swapaxes(
                g_perm2.reshape(enb2, eb, _SHAPE_OUT_ROWS), 1, 2)

            def epa_pass(gin_i):
                blocks = gin_i.shape[0]
                eo = pl.pallas_call(
                    epa_wrap, grid=(blocks,),
                    out_shape=jax.ShapeDtypeStruct((blocks, 8, eb), f32),
                    in_specs=[_vecspec(_SHAPE_OUT_ROWS, eb)],
                    out_specs=_vecspec(8, eb),
                    compiler_params=cparams, interpret=interpret,
                )(gin_i)
                return jnp.swapaxes(eo, 1, 2).reshape(blocks * eb, 8)

            C2 = max(eb, (C1 // 8) // eb * eb)
            cblk2 = C2 // eb
            if C2 < C1:
                eflat_c = epa_pass(gin2[:cblk2])
                # no subset lane is closed-form-final: the inactive-tail
                # passthrough is zeros + the GJK status (gin row 1)
                def tail_pt(_):
                    gs = g_perm2[C2:, 1]
                    z = jnp.zeros((C1 - C2,), f32)
                    return jnp.stack([z, z, z, z, z, gs, z, z], axis=1)

                eflat_tail = lax.cond(c2[-1] > C2,
                                      lambda _: epa_pass(gin2[cblk2:]),
                                      tail_pt, None)
                eflat_p2 = jnp.concatenate([eflat_c, eflat_tail], axis=0)
            else:
                eflat_p2 = epa_pass(gin2)
            eflat2 = eflat_p2[dest2]

        sub = jnp.concatenate(
            [eflat2, hit2[:, None], iters2[:, None], dist2[:, None],
             jnp.zeros((C1, 1), f32)], axis=1)           # (C1, 12)
        comb = sub[jnp.clip(dest1, 0, C1 - 1)]           # ONE (B, 12) gather
        # Materialize the transpose: without the barrier XLA fuses it into
        # the per-field consumers as strided column reads of the row-major
        # (B, 12) array — measured at ~170 us per 64k call vs ~20 us for
        # one real (12, B) relayout + contiguous row slices.
        ct = lax.optimization_barrier(comb.T)            # (12, B): row slices

        cfr = lambda r: gout_cf[:, r, :].reshape(bsz)  # noqa: E731
        zi = jnp.zeros((bsz,), jnp.int32)
        return FusedResult(
            hit=jnp.where(g0, ct[8] > 0.5, cfr(0) > 0.5),
            status=jnp.where(g0, ct[5], cfr(1)).astype(jnp.int32),
            depth=jnp.where(g0, ct[0], cfr(2)),
            normal=jnp.stack([jnp.where(g0, ct[1], cfr(3)),
                              jnp.where(g0, ct[2], cfr(4)),
                              jnp.where(g0, ct[3], cfr(5))], axis=1),
            gjk_iters=jnp.where(g0, ct[9].astype(jnp.int32), zi),
            epa_iters=jnp.where(g0, ct[4].astype(jnp.int32), zi),
            distance=jnp.where(g0, ct[10], cfr(6)),
        )

    res = apply_retired(
        lax.cond(n_g0 > C1, lambda _: legacy(rows[order1], dest1), fast,
                 None))
    if bsz != b_user:
        res = FusedResult(*(x[:b_user] for x in res))
    return res


# ---------------------------------------------------------------------------
# Mixed hull-vs-analytic-shape mode: one vertex-cloud side + one closed-form
# side in the same kernels (capability extension; the reference is
# cloud-vs-cloud only, ref :43-46).  The hull rides as a (3, N, BLOCK) geom
# block (GJK + EPA), the shape as 16 packed rows that the GJK kernel copies
# into its output (rows 24-39) so the EPA phase re-permutes only the hull.
# ---------------------------------------------------------------------------

_MIXED_OUT_ROWS = 40


def _make_hull_shape_support(v1x, v1y, v1z, n_iota1, sb):
    """Minkowski support: hull side A (first-max argmax scan, reference
    semantics ref :1030-1062) minus analytic side B (closed form)."""

    def support(d: P3) -> P3:
        dots1 = v1x * d.x + v1y * d.y + v1z * d.z          # (N, BLOCK)
        i1 = jnp.argmax(dots1, axis=0, keepdims=True)
        oh1 = n_iota1 == i1
        ax = jnp.sum(jnp.where(oh1, v1x, 0.0), axis=0, keepdims=True)
        ay = jnp.sum(jnp.where(oh1, v1y, 0.0), axis=0, keepdims=True)
        az = jnp.sum(jnp.where(oh1, v1z, 0.0), axis=0, keepdims=True)
        bpt = _shape_support_side(sb, -d)
        return P3(ax - bpt.x, ay - bpt.y, az - bpt.z)

    return support


def _hull_shape_broadphase(v1x, v1y, v1z, sb, tol):
    c1 = P3(jnp.mean(v1x, axis=0, keepdims=True),
            jnp.mean(v1y, axis=0, keepdims=True),
            jnp.mean(v1z, axis=0, keepdims=True))
    r1 = jnp.max(jnp.sqrt((v1x - c1.x) ** 2 + (v1y - c1.y) ** 2
                          + (v1z - c1.z) ** 2), axis=0, keepdims=True)
    cb = P3(sb[4:5, :], sb[5:6, :], sb[6:7, :])
    return pnorm(c1 - cb) <= r1 + _shape_radius(sb) + tol


def _gjk_kernel_hull_shape(p1_ref, sb_ref, out_ref, *, cfg, block):
    n1 = p1_ref.shape[1]
    v1 = (p1_ref[0, :, :], p1_ref[1, :, :], p1_ref[2, :, :])
    iota1 = lax.broadcasted_iota(jnp.int32, (n1, block), 0)
    sb = sb_ref[:, :]
    support = _make_hull_shape_support(*v1, iota1, sb)
    # sb row 16: the dispatch's sphere-envelope retirement bit (certified
    # miss via the hull's bounding sphere vs the exact analytic shape,
    # decided once in XLA — see fused_gjkepa_hull_shapes)
    active = (_hull_shape_broadphase(*v1, sb, cfg.broadphase_tol)
              & (sb[16:17, :] < 0.5))
    simplex, status, gjk_iters, sep = _gjk_guard(support, active, _TABLE_ROWS,
                                                 cfg, block)
    _write_gjk_out(out_ref, block, status, gjk_iters, sep, simplex)
    out_ref[24:40, :] = sb[0:16, :]


def _epa_cascade_kernel_hull_shape(p1_ref, gin_ref, out_ref, *, stages,
                                   block, polish=True):
    """Mixed EPA: in-kernel tier ladder + closed-form polish.

    The polish (support-function descent, _polish_direction) is valid for
    ANY exact support map — the hull argmax is exact — and the analytic
    side is usually smooth, so the mixed path uses the shapes treatment
    (capped tiers + polish) rather than the hull path's pure-polytopal
    convergence: bounded per-lane cost, no rim-tail stragglers."""
    n1 = p1_ref.shape[1]
    v1 = (p1_ref[0, :, :], p1_ref[1, :, :], p1_ref[2, :, :])
    iota1 = lax.broadcasted_iota(jnp.int32, (n1, block), 0)
    support = _make_hull_shape_support(*v1, iota1, gin_ref[24:40, :])
    active = _epa_act(gin_ref)
    simplex = _read_simplex(gin_ref)

    def run():
        depth, normal, epa_iters, status = _epa_cascade(
            support, simplex, active, stages, block)
        if polish:
            depth, normal, status = _polish_direction(
                support, depth, normal, status, active, block,
                promote_capacity=True)
        return depth, normal, epa_iters, status

    depth, normal, epa_iters, status = _epa_guard(active, block, run)
    _write_epa_out(out_ref, block, active, depth, normal, epa_iters, status,
                   gin_ref)


@functools.partial(jax.jit, static_argnames=("cfg", "block", "interpret",
                                             "sort_hits"))
def fused_gjkepa_hull_shapes(p1, shapes, mask1=None,
                             cfg: GJKEPAConfig | None = None,
                             block: int = 512, interpret: bool = False,
                             sort_hits: bool = True) -> FusedResult:
    """Fused-kernel batch query: convex hull vs analytic shape per pair.

    Args:
      p1: (B, N, 3) float32 padded hull vertex buffers (side A).
      shapes: :class:`gjkepa_tpu.models.ShapeBatch` of length B (side B).
      mask1: optional (B, N) validity mask for padded hull rows.

    Same output surface and two-phase dispatch as the hull/shape paths.
    Depth/normal follow the shapes-path contract (capped EPA + polished
    support descent: depth realized along the reported normal).
    """
    cfg = _round_cfg(cfg)
    p1 = _mask_to_padding(p1, mask1)
    b_user = p1.shape[0]
    (p1,), b = _pad_batch(b_user, min(block, 128), p1)
    if b != b_user:
        pad = b - b_user
        rep = lambda x: jnp.concatenate(  # noqa: E731
            [x, jnp.repeat(x[:1], pad, axis=0)], axis=0)
        shapes = type(shapes)(kind=rep(shapes.kind), params=rep(shapes.params),
                              pos=rep(shapes.pos).at[b_user:].add(-4e4),
                              rot=rep(shapes.rot))
    n1 = p1.shape[1]
    block = _auto_block(min(block, b), n1, 0)
    if b % block != 0:
        block = 128
    nb = b // block

    def to_kernel_layout(p, n):
        flat = jnp.swapaxes(p.reshape(nb, block, n * 3), 1, 2)
        return flat.reshape(nb, n, 3, block).swapaxes(1, 2)

    # --- sphere-envelope retirement ----------------------------------------
    # The hull is contained in its bounding sphere, and sphere-vs-shape has
    # an exact closed form for every analytic kind (_closed_form_shape_pairs
    # with a virtual sphere side A covers all four).  A positive envelope
    # gap above a safety margin certifies a miss: the lane skips the GJK
    # loop (near-miss lanes are exactly the ones that run it to the
    # stagnation heuristics) and reports the envelope gap as its
    # separation certificate — envelope ⊇ hull means d(env, shape) <=
    # d(hull, shape), so a positive envelope gap both proves the miss and
    # is a valid lower bound for the `distance` field.
    f32 = jnp.float32
    p1f = p1.astype(f32)
    c1h = jnp.mean(p1f, axis=1)
    r1h = jnp.sqrt(jnp.max(jnp.sum((p1f - c1h[:, None, :]) ** 2, axis=2),
                           axis=1))
    virt = type(shapes)(
        kind=jnp.zeros((b,), shapes.kind.dtype),           # SPHERE
        params=jnp.stack([r1h, jnp.zeros_like(r1h), jnp.zeros_like(r1h)], 1),
        pos=c1h,
        rot=jnp.broadcast_to(jnp.eye(3, dtype=f32), (b, 3, 3)),
    )
    handled_e, _, _, _, env_dist, _ = _closed_form_shape_pairs(
        virt, shapes, cfg.broadphase_tol)
    scale_e = r1h + shapes.params.astype(f32)[:, 0] + \
        shapes.params.astype(f32)[:, 1]
    retired = handled_e & (env_dist > 1e-4 + 1e-4 * scale_e)

    # --- activity grouping (GJK-lane compaction without truncation) --------
    # This fixture class is dense (the bench's c3b: 86% broadphase-pass,
    # 38% still active after retirement), so inactive lanes scattered
    # through the blocks rarely let a whole block skip.  Permute actives to
    # the front (any permutation is correct: _run_two_phase composes the
    # inverse via pre_dest), so the GJK while-loop runs in ~ceil(n_act/
    # block) blocks and the all-inactive rest exit via the guard.
    rows_sh = _pack_rows(shapes)
    rows_sh = rows_sh.at[:, 16].set(jnp.where(retired, 1.0, 0.0).astype(f32))
    if sort_hits:
        def radius_sh(s):
            p = s.params.astype(f32)
            rbox = jnp.sqrt(jnp.sum(p * p, axis=1))
            return jnp.where(s.kind == 0, p[:, 0],
                             jnp.where(s.kind == 1, rbox, p[:, 0] + p[:, 1]))

        gap_e = jnp.sqrt(jnp.sum((c1h - shapes.pos.astype(f32)) ** 2,
                                 axis=1))
        act_pred = (gap_e <= r1h + radius_sh(shapes) + cfg.broadphase_tol) \
            & ~retired
        ai_ = act_pred.astype(jnp.int32)
        csum_ = jnp.cumsum(ai_)
        iot_ = jnp.arange(b, dtype=jnp.int32)
        pre_dest = jnp.where(act_pred, csum_ - 1, csum_[-1] + iot_ - csum_)
        _, order1 = lax.sort((pre_dest, iot_), num_keys=1)
        p1t = to_kernel_layout(
            p1.reshape(b, n1 * 3)[order1].reshape(b, n1, 3), n1)
        sbt = _rows_to_lanes(rows_sh[order1], nb, block)
    else:
        pre_dest = None
        p1t = to_kernel_layout(p1, n1)
        sbt = _rows_to_lanes(rows_sh, nb, block)
    specs = (
        pl.BlockSpec((1, 3, n1, block), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        _vecspec(24, block),
    )

    def gjk_wrap(p1r, sbr, outr):
        _gjk_kernel_hull_shape(p1r.at[0], sbr.at[0], outr.at[0], cfg=cfg,
                               block=block)

    eb = min(block, 128)
    epa_specs = (
        pl.BlockSpec((1, 3, n1, eb), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    epa_wrap = None
    if cfg.epa_max_iters > 0:
        rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
        cap = min(_SMOOTH_EPA_CAP, cfg.epa_max_iters)
        stage_f = rup(max(2 * cap + 10, 48))
        stage_cfg = cfg.replace(epa_max_iters=cap, epa_max_faces=stage_f)
        stages = [(stage_cfg, 8), (stage_cfg, 16)]

        def epa_wrap(p1r, ginr, outr):
            _epa_cascade_kernel_hull_shape(p1r.at[0], ginr.at[0], outr.at[0],
                                           stages=stages, block=eb)

    res = _run_two_phase(gjk_wrap, epa_wrap, (p1t, sbt), specs, b, block,
                         interpret, sort_hits, epa_block=eb,
                         epa_geom_specs=epa_specs,
                         out_rows=_MIXED_OUT_ROWS,
                         epa_geom_arrays=(p1t,),
                         pre_dest=pre_dest,
                         # the bench-class mixed fixture hits on ~22% of
                         # lanes — a b/8 prefix overflows every call and
                         # pays the full-width tail; b/4 covers it
                         epa_prefix_div=4)
    # retired lanes come back as kernel-inactive broadphase misses (zeros);
    # surface the envelope gap as their separation certificate
    res = res._replace(distance=jnp.where(retired, env_dist, res.distance))
    if b != b_user:
        res = FusedResult(*(x[:b_user] for x in res))
    return res


# ---------------------------------------------------------------------------
# Fused distance-GJK (BASELINE config 2): closest distance + witness points.
# Same algorithm as ops.distance.gjk_distance, in pairs-on-lanes form: the
# closest-point-on-simplex step enumerates all 15 sub-simplices with static
# indices (vertices/edges via clamped projections, faces/tetra via
# barycentric validity) and the supporting subset becomes the next simplex.
# ---------------------------------------------------------------------------

_DIST_SUBSETS = (
    # (verts...), padded later; order matches ops.distance._SUBSETS
    (0,), (1,), (2,), (3,),
    (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
    (0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3),
    (0, 1, 2, 3),
)


def _make_hull_support_ab(v1x, v1y, v1z, v2x, v2y, v2z, n_iota1, n_iota2):
    """Like _make_hull_support but also returns the per-hull witnesses."""

    def support(d: P3):
        dots1 = v1x * d.x + v1y * d.y + v1z * d.z
        i1 = jnp.argmax(dots1, axis=0, keepdims=True)
        oh1 = n_iota1 == i1
        a = P3(jnp.sum(jnp.where(oh1, v1x, 0.0), axis=0, keepdims=True),
               jnp.sum(jnp.where(oh1, v1y, 0.0), axis=0, keepdims=True),
               jnp.sum(jnp.where(oh1, v1z, 0.0), axis=0, keepdims=True))
        dots2 = -(v2x * d.x + v2y * d.y + v2z * d.z)
        i2 = jnp.argmax(dots2, axis=0, keepdims=True)
        oh2 = n_iota2 == i2
        b = P3(jnp.sum(jnp.where(oh2, v2x, 0.0), axis=0, keepdims=True),
               jnp.sum(jnp.where(oh2, v2y, 0.0), axis=0, keepdims=True),
               jnp.sum(jnp.where(oh2, v2z, 0.0), axis=0, keepdims=True))
        return a - b, a, b

    return support


def _closest_candidates(w, n_pts, block):
    """(d2, bary4, size) per sub-simplex of the 4-point simplex `w`.

    Returns lists over the 15 candidates; invalid candidates get d2=BIG.
    Mirrors ops.distance._closest_point_candidates.
    """
    BIG = jnp.full((1, block), 3.4e38, jnp.float32)
    zero = jnp.zeros((1, block), jnp.float32)
    out = []

    def bary_of(pairs):
        bar = [zero, zero, zero, zero]
        for i, val in pairs:
            bar[i] = val
        return bar

    one = jnp.ones((1, block), jnp.float32)
    # vertices
    for i in range(4):
        d2 = pdot(w[i], w[i])
        valid = jnp.asarray(i, jnp.int32) < n_pts
        out.append((jnp.where(valid, d2, BIG), bary_of([(i, one)]), 1))
    # edges (clamped segment projection)
    for i, j in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
        a, b = w[i], w[j]
        ab = b - a
        den = pdot(ab, ab)
        t = jnp.clip(pdot(-a, ab) / jnp.where(den > 0, den, 1.0), 0.0, 1.0)
        p = a + pscale(ab, t)
        valid = (jnp.asarray(j, jnp.int32) < n_pts) & (den > 0)
        out.append((jnp.where(valid, pdot(p, p), BIG),
                    bary_of([(i, 1.0 - t), (j, t)]), 2))
    # faces (plane projection, valid iff inside)
    for i, j, k in ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)):
        a, b, c = w[i], w[j], w[k]
        nrm = pcross(b - a, c - a)
        nn = pdot(nrm, nrm)
        safe = jnp.where(nn > 0, nn, 1.0)
        dist_plane = pdot(a, nrm) / safe
        p = pscale(nrm, dist_plane)
        v0, v1, v2 = b - a, c - a, p - a
        d00, d01, d11 = pdot(v0, v0), pdot(v0, v1), pdot(v1, v1)
        d20, d21 = pdot(v2, v0), pdot(v2, v1)
        den = d00 * d11 - d01 * d01
        dsafe = jnp.where(jnp.abs(den) > 0, den, 1.0)
        bv = (d11 * d20 - d01 * d21) / dsafe
        bw = (d00 * d21 - d01 * d20) / dsafe
        bu = 1.0 - bv - bw
        inside = (bu >= 0) & (bv >= 0) & (bw >= 0) & (jnp.abs(den) > 0)
        valid = (jnp.asarray(k, jnp.int32) < n_pts) & inside
        out.append((jnp.where(valid, pdot(p, p), BIG),
                    bary_of([(i, bu), (j, bv), (k, bw)]), 3))
    # tetra interior via Cramer
    a, b, c, d = w
    e0, e1, e2 = b - a, c - a, d - a
    det = pdot(pcross(e0, e1), e2)
    dsafe = jnp.where(jnp.abs(det) > 0, det, 1.0)
    rhs = -a
    l0 = pdot(pcross(rhs, e1), e2) / dsafe
    l1 = pdot(pcross(e0, rhs), e2) / dsafe
    l2 = pdot(pcross(e0, e1), rhs) / dsafe
    u = 1.0 - l0 - l1 - l2
    inside = (u >= 0) & (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (jnp.abs(det) > 0)
    valid = (n_pts >= 4) & inside
    out.append((jnp.where(valid, zero, BIG), [u, l0, l1, l2], 4))
    return out


def _distance_kernel_hulls(p1_ref, p2_ref, out_ref, *, cfg, block, max_iters,
                           done0_ref=None):
    """`done0_ref` (optional (1, block) row): lanes already converged by a
    previous pass start done, so straggler-free blocks exit before their
    first iteration (their output rows are garbage; the dispatch merges
    phase-1 rows back for them)."""
    support, v1, v2 = _hull_views(p1_ref, p2_ref, block)
    support_ab = _make_hull_support_ab(*v1, *v2,
                                       lax.broadcasted_iota(jnp.int32, (p1_ref.shape[1], block), 0),
                                       lax.broadcasted_iota(jnp.int32, (p2_ref.shape[1], block), 0))
    eps = cfg.eps_coincide
    eps_rel = 1e-6
    zero = pzero(block)
    one_dir = P3(jnp.ones((1, block), jnp.float32),
                 jnp.zeros((1, block), jnp.float32),
                 jnp.zeros((1, block), jnp.float32))
    w0, a0, b0 = support_ab(one_dir)

    def seed(p):
        return (p, zero, zero, zero)

    def cond(c):
        run = (c["done"] == 0) & (c["it"] < max_iters)
        return jnp.sum(jnp.where(run, jnp.int32(1), jnp.int32(0))) > 0

    def body(c):
        run = (c["done"] == 0) & (c["it"] < max_iters)
        w, wa, wb, n = c["w"], c["wa"], c["wb"], c["n"]
        cands = _closest_candidates(w, n, block)
        best_d2 = cands[0][0]
        best_k = jnp.zeros((1, block), jnp.int32)
        for k in range(1, len(cands)):
            better = cands[k][0] < best_d2
            best_d2 = jnp.where(better, cands[k][0], best_d2)
            best_k = jnp.where(better, jnp.int32(k), best_k)
        bary = [jnp.zeros((1, block), jnp.float32) for _ in range(4)]
        for k, (_, bk, _) in enumerate(cands):
            sel = best_k == k
            for s in range(4):
                bary[s] = jnp.where(sel, bk[s], bary[s])
        vpt = pzero(block)
        pa = pzero(block)
        pb = pzero(block)
        for s in range(4):
            vpt = vpt + pscale(w[s], bary[s])
            pa = pa + pscale(wa[s], bary[s])
            pb = pb + pscale(wb[s], bary[s])
        v2_ = pdot(vpt, vpt)
        inter = v2_ < eps_rel

        # reduce to the supporting subset (static per candidate)
        new_w = [zero, zero, zero, zero]
        new_a = [zero, zero, zero, zero]
        new_b = [zero, zero, zero, zero]
        size = jnp.zeros((1, block), jnp.int32)
        for k, sub in enumerate(_DIST_SUBSETS):
            sel = best_k == k
            size = jnp.where(sel, jnp.int32(len(sub)), size)
            for s, vi in enumerate(sub):
                new_w[s] = pwhere(sel, w[vi], new_w[s])
                new_a[s] = pwhere(sel, wa[vi], new_a[s])
                new_b[s] = pwhere(sel, wb[vi], new_b[s])

        rw, ra, rb = support_ab(-vpt)
        gap = v2_ - pdot(vpt, rw)
        converged = inter | (gap <= eps_rel * jnp.maximum(v2_, 1.0))
        dup = jnp.zeros((1, block), bool)
        for s in range(4):
            dup = dup | ((jnp.asarray(s, jnp.int32) < size)
                         & pcoincide(new_w[s], rw, eps))
        done_now = run & (converged | dup)

        # insert the new support at slot `size`
        for s in range(4):
            here = (size == s) & run & ~done_now
            new_w[s] = pwhere(here, rw, new_w[s])
            new_a[s] = pwhere(here, ra, new_a[s])
            new_b[s] = pwhere(here, rb, new_b[s])
        n_new = jnp.where(run & ~done_now, jnp.minimum(size + 1, 4), size)

        keep = lambda news, olds: tuple(  # noqa: E731
            pwhere(run, nv_, ov_) for nv_, ov_ in zip(news, olds))
        return {
            "w": keep(new_w, c["w"]), "wa": keep(new_a, c["wa"]),
            "wb": keep(new_b, c["wb"]),
            "n": jnp.where(run, n_new, c["n"]),
            "it": jnp.where(run, c["it"] + 1, c["it"]),
            "done": c["done"] | jnp.where(done_now, jnp.int32(1), jnp.int32(0)),
            "d2": jnp.where(run, v2_, c["d2"]),
            "pa": pwhere(run, pa, c["pa"]),
            "pb": pwhere(run, pb, c["pb"]),
            "inter": jnp.where(run, jnp.where(inter, jnp.int32(1), jnp.int32(0)),
                               c["inter"]),
        }

    # int carries start lane-VARYING (iota-derived zeros): Mosaic cannot
    # relayout a varying loop-body output back into a replicated-constant
    # initial carry ("Invalid relayout ... replicated in destination").
    izero = jnp.minimum(lax.broadcasted_iota(jnp.int32, (1, block), 1),
                        jnp.int32(0))
    done_init = izero
    if done0_ref is not None:
        done_init = jnp.where(done0_ref[:, :] > 0.5, jnp.int32(1), izero)
    carry = {
        "w": seed(w0), "wa": seed(a0), "wb": seed(b0),
        "n": izero + 1,
        "it": izero,
        "done": done_init,
        "d2": jnp.zeros((1, block), jnp.float32),
        "pa": zero, "pb": zero,
        "inter": izero,
    }
    out = lax.while_loop(cond, body, carry)
    inter = out["inter"] > 0
    dist = jnp.sqrt(jnp.maximum(out["d2"], 0.0))
    dist = jnp.where(inter, 0.0, dist)
    f = jnp.float32
    out_ref[0:1, :] = dist.astype(f)
    out_ref[1:2, :] = out["pa"].x
    out_ref[2:3, :] = out["pa"].y
    out_ref[3:4, :] = out["pa"].z
    out_ref[4:5, :] = out["pb"].x
    out_ref[5:6, :] = out["pb"].y
    out_ref[6:7, :] = out["pb"].z
    out_ref[7:8, :] = jnp.where(inter, 1.0, 0.0).astype(f)
    out_ref[8:9, :] = out["it"].astype(f)
    # row 9: converged flag — the two-phase dispatch gathers lanes still
    # running at the phase-1 cap into a compact straggler pass
    out_ref[9:10, :] = jnp.where(out["done"] > 0, 1.0, 0.0).astype(f)
    out_ref[10:16, :] = jnp.zeros((6, block), f)


@functools.partial(jax.jit, static_argnames=("cfg", "block", "max_iters",
                                             "interpret", "two_phase",
                                             "phase1_iters"))
def fused_gjk_distance_hulls(p1, p2, mask1=None, mask2=None,
                             cfg: GJKEPAConfig | None = None,
                             block: int = 512, max_iters: int = 64,
                             interpret: bool = False, two_phase: bool = True,
                             phase1_iters: int = 10):
    """Fused distance-GJK over hull pairs: (distance, point_a, point_b,
    intersecting, iters) — the BASELINE config-2 capability at kernel speed.
    Any B >= 1; ragged hulls via (B, N) masks or repeated-vertex padding.

    `two_phase` (default, batches >= 2 blocks): the distance loop's
    iteration count is long-tailed (p50 ~ a third of the observed max) and
    each block's while-loop runs to its SLOWEST lane, so one straggler
    stalls 511 cheap ones.  Phase 1 runs everyone at a low cap
    (`phase1_iters`, wide blocks); the unconverged minority is gathered
    into a compact prefix (cap B/8, the same cumsum+sort machinery as
    _run_two_phase) and RESTARTED at the full `max_iters` on narrow
    blocks.  The restart retraces the identical deterministic iteration
    sequence, so results are bit-identical to the single-phase kernel
    (pinned by tests/test_distance_two_phase.py); batches with more
    stragglers than the prefix fall back to full-width phase 2 behind a
    scalar lax.cond — a speed tier, never a correctness one."""
    if cfg is None:
        cfg = GJKEPAConfig.for_f32()
    p1 = _mask_to_padding(p1, mask1)
    p2 = _mask_to_padding(p2, mask2)
    b_user = p1.shape[0]
    (p1, p2), b = _pad_batch(b_user, min(block, 128), p1, p2)
    n1, n2 = p1.shape[1], p2.shape[1]
    block = _auto_block(min(block, b), n1, n2)
    if b % block != 0:
        block = 128
    nb = b // block

    def to_kernel_layout(p, n, nblk, blk):
        flat = jnp.swapaxes(p.reshape(nblk, blk, n * 3), 1, 2)
        return flat.reshape(nblk, n, 3, blk).swapaxes(1, 2)

    def run_pass(p1_i, p2_i, blk, iters_cap, done_i=None):
        nblk = p1_i.shape[0]
        specs = [
            pl.BlockSpec((1, 3, n1, blk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n2, blk), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [p1_i, p2_i]
        if done_i is not None:
            specs.append(_vecspec(1, blk))
            args.append(done_i)

        def wrap(*refs):
            p1r, p2r, outr = refs[0], refs[1], refs[-1]
            dref = refs[2].at[0] if done_i is not None else None
            _distance_kernel_hulls(p1r.at[0], p2r.at[0], outr.at[0], cfg=cfg,
                                   block=blk, max_iters=iters_cap,
                                   done0_ref=dref)

        return pl.pallas_call(
            wrap, grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct((nblk, 16, blk), jnp.float32),
            in_specs=specs, out_specs=_vecspec(16, blk),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*args)

    eb = min(block, 128)
    C = max(eb, (b // 8) // eb * eb)
    use_two_phase = two_phase and C < b and phase1_iters < max_iters

    p1t = to_kernel_layout(p1, n1, nb, block)
    p2t = to_kernel_layout(p2, n2, nb, block)
    out = run_pass(p1t, p2t, block,
                   phase1_iters if use_two_phase else max_iters)

    if use_two_phase:
        R = 16
        flat_a = jnp.swapaxes(out, 1, 2).reshape(b, R)
        unfinished = flat_a[:, 9] < 0.5
        ui = unfinished.astype(jnp.int32)
        csum = jnp.cumsum(ui)
        n_unf = csum[-1]
        iot = jnp.arange(b, dtype=jnp.int32)
        dest = jnp.where(unfinished, csum - 1, n_unf + iot - csum)
        _, order = lax.sort((dest, iot), num_keys=1)

        enb = b // eb
        cblk = C // eb
        f1 = p1.reshape(b, n1 * 3)
        f2 = p2.reshape(b, n2 * 3)
        a_perm = flat_a[order]
        # phase-1 done flags ride into phase 2 so the compact prefix's
        # filler blocks (already-converged lanes dragged in to round C up)
        # exit before their first iteration; the merge below takes phase-2
        # rows ONLY for unfinished lanes, so their garbage rows never leak.
        dn = jnp.swapaxes(a_perm[:, 9].reshape(enb, eb, 1), 1, 2)

        def rows_of(o):
            return jnp.swapaxes(o, 1, 2).reshape(o.shape[0] * eb, R)

        def run_slice(lo, hi):
            # geometry gather + relayout for exactly this permuted slice —
            # the tail slice lives INSIDE the overflow cond so the common
            # case never pays the full-batch (2 x 50 MB at 64k x 64-vert)
            # gather, only the B/8 prefix.
            nblk = (hi - lo) // eb
            g1s = to_kernel_layout(f1[order[lo:hi]], n1, nblk, eb)
            g2s = to_kernel_layout(f2[order[lo:hi]], n2, nblk, eb)
            return rows_of(run_pass(g1s, g2s, eb, max_iters,
                                    dn[lo // eb:hi // eb]))

        flat_pref = run_slice(0, C)
        tail = lax.cond(
            n_unf > C,
            lambda _: run_slice(C, b),
            lambda _: a_perm[C:],
            None)
        final = jnp.concatenate([flat_pref, tail], axis=0)[dest]
        final = jnp.where(unfinished[:, None], final, flat_a)

        def row(i):
            return final[:, i][:b_user]
    else:
        def row(i):
            return out[:, i, :].reshape(b)[:b_user]

    from .distance import DistanceResult
    return DistanceResult(
        distance=row(0),
        point_a=jnp.stack([row(1), row(2), row(3)], axis=1),
        point_b=jnp.stack([row(4), row(5), row(6)], axis=1),
        intersecting=row(7) > 0.5,
        iters=row(8).astype(jnp.int32),
    )
