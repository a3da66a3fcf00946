"""L3a: GJK boolean-intersection core.

Faithful re-derivation of the reference's non-standard GJK
(``/root/reference/src/GCLIB_GJKEPA.f90``):

  * staged initial-simplex construction v1-v4 with the deterministic
    direction table and up-to-99 retries (:82-170, SURVEY.md C3);
  * an always-4-vertex update step that picks the tetra face most "beyond"
    the origin and replaces the excluded vertex with a new support
    (:1070-1157, SURVEY.md C6) — no line/point Voronoi cases exist;
  * termination purely by stagnation heuristics: degenerate flat simplex
    (:199-207), two-step cycle detection (:219-234), or the 50-iteration
    cap (:186).  A GJK "miss" here is a heuristic verdict, not a distance
    certificate (SURVEY.md §3.2).

The control flow is re-architected for XLA: both loops are fixed-shape
``lax.while_loop``s whose carry holds the (4,3) simplex in registers, so a
``vmap`` over pairs compiles to one fused program where each batched
iteration retires whole lanes.  As an extension, every support probe feeds
a separating-plane bound, so the miss path reports a lower bound on the
separation distance (the reference leaves nearest info zero on miss).

Deviations from the reference (documented, all on dark-corner paths):
  * the early-EPA branch (:140-148) passes a simplex whose 4th vertex is a
    stale SAVE temporary in the Fortran; we instead seed it with a fresh
    support along the triangle normal (or its negation when coplanar),
    which is deterministic and geometrically sound;
  * interactive STOPs become status codes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import GJKEPAConfig
from ..types import Status
from .directions import DIRECTION_TABLE
from .geom import cross3, dist_pf_sign, is_inside_pf, point_in_simplex, utzvec, vec_pl

__all__ = ["GJKResult", "run_gjk", "update_simplex"]

_RUNNING = jnp.int32(-1)

# update_simplex_GJK face tables (ref :1093-1118): vertex triples whose
# first entry is the reference vertex used for orientation and distance.
_FACE_IDX = jnp.array([[0, 2, 3], [0, 1, 3], [0, 1, 2], [1, 2, 3]], dtype=jnp.int32)


class GJKResult(NamedTuple):
    simplex: jnp.ndarray   # (4,3) final simplex (valid on hit)
    status: jnp.ndarray    # int32 Status code
    hit: jnp.ndarray       # bool
    iters: jnp.ndarray     # int32 GJK loop iterations
    sep_lb: jnp.ndarray    # separation-distance lower bound (miss path)


def update_simplex(support: Callable, simplex: jnp.ndarray) -> jnp.ndarray:
    """One always-tetra GJK step (update_simplex_GJK, ref :1070-1157).

    Computes the 4 outward face normals (outward = away from the tetra
    centroid), scores each face by how far beyond it the origin lies,
    expands through the max face, and returns that face's 3 vertices plus
    the new support point.
    """
    m = jnp.mean(simplex, axis=0)

    def one_face(f):
        a, b, c = simplex[f[0]], simplex[f[1]], simplex[f[2]]
        n = utzvec(cross3(a - b, b - c))
        n = jnp.where(jnp.dot(n, a - m) < 0.0, -n, n)
        # signed "distance of origin beyond this face": dot(-n, a - O)
        return n, -jnp.dot(n, a)

    normals, scores = jax.vmap(one_face)(_FACE_IDX)
    k = jnp.argmax(scores)
    sel = (jnp.arange(4) == k)
    d = jnp.sum(jnp.where(sel[:, None], normals, 0.0), axis=0)
    w = support(d).w
    # kept face rows via static gather + one-hot select (no dynamic gather)
    cands = simplex[_FACE_IDX]              # (4,3,3), static indices
    kept = jnp.sum(jnp.where(sel[:, None, None], cands, 0.0), axis=0)
    return jnp.concatenate([kept, w[None, :]], axis=0), d, w


def _sep_bound(best, d, w):
    """Separating-plane bound: unit dir d with support w and dot(w,d)<0
    certifies separation >= -dot(w,d)."""
    return jnp.maximum(best, -jnp.dot(w, d))


def run_gjk(support: Callable, cfg: GJKEPAConfig, dtype=jnp.float32,
            active: jnp.ndarray | bool = True) -> GJKResult:
    """Full init + iterate GJK pipeline for one pair (vmap over pairs).

    `active=False` lanes (e.g. broadphase-rejected, ref :76-77) skip both
    while loops entirely and report Status.MISS_BROADPHASE.
    """
    active = jnp.asarray(active)
    eps = cfg.eps_coincide
    table = jnp.asarray(DIRECTION_TABLE, dtype=dtype)
    zero3 = jnp.zeros(3, dtype=dtype)

    # ------------------------------------------------------------------
    # [1.1/1.2] v1, v2: probe table direction +/-, retry while coincident
    # (ref :82-112).  Probes use table[it] for it = 0..init_max_iters-1,
    # matching GET_RANDOM_UNIT_VECTOR(iter) for iter = 1..99.
    # ------------------------------------------------------------------
    def coincide(a, b):
        return jnp.all(jnp.abs(a - b) < eps)

    def init_cond(c):
        it, s1, s2, _ = c
        return active & (it < cfg.init_max_iters) & coincide(s1, s2)

    def init_body(c):
        it, _, _, sep = c
        sel = (jnp.arange(table.shape[0]) == it % table.shape[0])
        d = jnp.sum(jnp.where(sel[:, None], table, 0.0), axis=0)
        r1 = support(d)
        r2 = support(-d)
        sep = _sep_bound(_sep_bound(sep, d, r1.w), -d, r2.w)
        return it + 1, r1.w, r2.w, sep

    sep0 = jnp.asarray(0.0, dtype=dtype)
    _, s1, s2, sep = lax.while_loop(init_cond, init_body, (jnp.int32(0), zero3, zero3, sep0))
    init_failed = coincide(s1, s2)  # 99 retries exhausted (ref :86-89)

    # ------------------------------------------------------------------
    # [1.3] v3: support along the point->line direction (ref :115-127).
    #
    # Robustness fix over the reference: when the origin lies ON the line
    # through s1,s2 (symmetric configurations, e.g. identical shapes),
    # VEC_PL degenerates to the zero vector and the Fortran wanders into
    # undefined behavior (support along a zero direction, then an early-EPA
    # call whose 4th simplex vertex is stale SAVE memory, :143-145).  We
    # instead probe a direction perpendicular to the segment, which keeps
    # the simplex construction well-defined.
    # ------------------------------------------------------------------
    d3 = vec_pl(zero3, jnp.stack([s1, s2]), cfg.eps_zero)
    seg = s2 - s1
    # The on-line test must be SCALE-AWARE on the raw rejection, not a
    # zero test on vec_pl's normalized output: when the origin sits on the
    # s1-s2 line exactly (identical shapes), compiled-XLA FMA contraction
    # leaves the foot a few ulps off zero, and utzvec then normalizes that
    # noise into a full-magnitude garbage direction (measured: s3 landed
    # ON s2 and the query misclassified as MISS_INIT under jit while the
    # same float32 math passed eagerly).  Rejections below
    # eps_coincide * line scale are treated as on-line -> perpendicular
    # fallback; genuine rejections are orders of magnitude larger.
    segsq = jnp.dot(seg, seg)
    t3 = jnp.dot(-s1, seg) / jnp.maximum(segsq, cfg.eps_zero)
    rej = s1 + t3 * seg                      # foot - origin, unnormalized
    on_line = jnp.dot(rej, rej) <= (eps * eps) * (1.0 + segsq)
    alt = utzvec(cross3(seg, table[0]), cfg.eps_zero)
    alt = jnp.where(jnp.sum(alt * alt) > 0.0, alt,
                    utzvec(cross3(seg, table[1]), cfg.eps_zero))
    d3 = jnp.where((jnp.sum(d3 * d3) > 0.0) & ~on_line, d3, alt)
    r3 = support(d3)
    s3 = r3.w
    sep = _sep_bound(sep, d3, s3)
    v3_degenerate = coincide(s3, s1) | coincide(s3, s2)

    # ------------------------------------------------------------------
    # [1.4] v4 + early-EPA / coplanar / containment checks (ref :130-170).
    # ------------------------------------------------------------------
    tri = jnp.stack([s1, s2, s3])
    d4 = utzvec(cross3(s2 - s1, s3 - s2), cfg.eps_zero)
    vo = -s3  # O - s3
    origin_on_tri_plane = jnp.abs(jnp.dot(vo, d4)) < eps
    origin_in_tri = is_inside_pf(tri, zero3, eps_zero=cfg.eps_zero)
    early_hit = origin_on_tri_plane & origin_in_tri

    d4_flipped = jnp.where(jnp.dot(vo, d4) < 0.0, -d4, d4)
    r4 = support(d4_flipped)
    s4 = r4.w
    sep = _sep_bound(sep, d4_flipped, s4)
    v4_coplanar = jnp.abs(dist_pf_sign(s4, tri, cfg.eps_zero)) < eps

    # Early-EPA seed: the reference forwards a stale 4th vertex here
    # (:143-145); we use a fresh support along the (unflipped) tri normal,
    # falling back to the opposite side when that support is coplanar.
    s4e = support(d4).w
    s4e_coplanar = jnp.abs(dist_pf_sign(s4e, tri, cfg.eps_zero)) < eps
    s4_early = jnp.where(s4e_coplanar, support(-d4).w, s4e)

    simplex = jnp.stack([s1, s2, s3, jnp.where(early_hit, s4_early, s4)])
    origin_in_tetra = point_in_simplex(zero3, simplex, eps, cfg.eps_zero)

    # Init-phase verdict (ordered exactly as the reference's early returns).
    status0 = _RUNNING
    status0 = jnp.where(origin_in_tetra, jnp.int32(Status.HIT), status0)
    status0 = jnp.where(v4_coplanar, jnp.int32(Status.MISS_INIT), status0)
    status0 = jnp.where(early_hit, jnp.int32(Status.HIT), status0)
    status0 = jnp.where(v3_degenerate, jnp.int32(Status.MISS_INIT), status0)
    status0 = jnp.where(init_failed, jnp.int32(Status.MISS_INIT), status0)
    status0 = jnp.where(active, status0, jnp.int32(Status.MISS_BROADPHASE))

    # ------------------------------------------------------------------
    # [2] iterate loop (ref :178-236)
    # ------------------------------------------------------------------
    def loop_cond(c):
        simplex, l1, l2, it, status, sep = c
        return (status == _RUNNING) & (it < cfg.gjk_max_iters)

    def loop_body(c):
        simplex, l1, l2, it, status, sep = c
        l2 = l1
        l1 = simplex
        new_simplex, d, w = update_simplex(support, simplex)
        sep = _sep_bound(sep, d, w)

        tri = new_simplex[:3]
        flat_tri = jnp.linalg.norm(cross3(new_simplex[1] - new_simplex[0],
                                          new_simplex[2] - new_simplex[1])) < eps
        coplanar4 = jnp.abs(dist_pf_sign(new_simplex[3], tri, cfg.eps_zero)) < eps
        contains = point_in_simplex(jnp.zeros(3, dtype=simplex.dtype), new_simplex,
                                    eps, cfg.eps_zero)
        # two-step cycle detection (ref :219-234): every vertex matches its
        # counterpart in one of the last two simplices
        row_same = lambda a, b: jnp.all(jnp.abs(a - b) < eps, axis=1)
        stalled = jnp.all(row_same(new_simplex, l1) | row_same(new_simplex, l2))

        st = status
        st = jnp.where(stalled, jnp.int32(Status.MISS_GJK), st)
        st = jnp.where(contains, jnp.int32(Status.HIT), st)
        st = jnp.where(coplanar4, jnp.int32(Status.MISS_GJK), st)
        st = jnp.where(flat_tri, jnp.int32(Status.MISS_GJK), st)
        return new_simplex, l1, l2, it + 1, st, sep

    init = (simplex, jnp.zeros_like(simplex), jnp.zeros_like(simplex),
            jnp.int32(0), status0, sep)
    simplex, _, _, iters, status, sep = lax.while_loop(loop_cond, loop_body, init)

    # iteration cap exhausted without a verdict => non-hit (ref :186-189)
    status = jnp.where(status == _RUNNING, jnp.int32(Status.MISS_GJK), status)
    hit = status == Status.HIT
    sep = jnp.where(hit | ~active, jnp.zeros_like(sep), jnp.maximum(sep, 0.0))
    return GJKResult(simplex=simplex, status=status, hit=hit, iters=iters, sep_lb=sep)
