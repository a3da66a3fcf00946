"""Rigid-body mini-sim: falling boxes (BASELINE config 5).

Demonstrates the full pipeline in one jitted step: uniform-grid broadphase
(fixed-capacity candidate pairs) -> batched GJK/EPA narrowphase over
analytic box supports -> ground-plane contacts -> a few iterations of a
sequential-impulse solver with Baumgarte positional bias -> semi-implicit
Euler integration.  Everything is fixed-shape; invalid candidate lanes are
masked, so the whole step compiles to one XLA program and shards over a
device mesh along the body/pair axes (see __graft_entry__.dryrun_multichip).

The reference is a narrow-phase library intended to be driven by exactly
this kind of host loop (one pair per OMP thread, SURVEY.md §0); here the
loop itself is on-device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import GJKEPAConfig
from ..models.shapes import make_shape_pair_support, BOX
from ..ops.broadphase import grid_candidate_pairs
from ..ops.epa import run_epa
from ..ops.gjk import run_gjk

__all__ = ["SimState", "SimConfig", "init_boxes", "sim_step"]


class SimState(NamedTuple):
    pos: jnp.ndarray       # (N,3)
    quat: jnp.ndarray      # (N,4)  (w,x,y,z)
    vel: jnp.ndarray       # (N,3)
    angvel: jnp.ndarray    # (N,3)
    half: jnp.ndarray      # (N,3)  box half extents


class SimConfig(NamedTuple):
    dt: float = 1.0 / 60.0
    gravity: float = -9.81
    max_pairs: int = 8192
    solver_iters: int = 4
    baumgarte: float = 0.2
    restitution: float = 0.0
    friction: float = 0.4
    ground_z: float = 0.0


def quat_to_mat(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_integrate(q, w, dt):
    """q' = q + dt/2 * (0,w) * q, renormalized (semi-implicit)."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    wx, wy, wz = w[0], w[1], w[2]
    dq = 0.5 * jnp.array([
        -wx * qx - wy * qy - wz * qz,
        wx * qw + wy * qz - wz * qy,
        -wx * qz + wy * qw + wz * qx,
        wx * qy - wy * qx + wz * qw,
    ])
    qn = q + dt * dq
    return qn / jnp.linalg.norm(qn)


def init_boxes(n: int, seed: int = 0, spread: float = 12.0, height: float = 10.0,
               dtype=jnp.float32) -> SimState:
    """N boxes in a jittered grid above the ground plane."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    side = int(jnp.ceil(n ** (1 / 3)))
    idx = jnp.arange(n)
    gx = (idx % side).astype(dtype)
    gy = ((idx // side) % side).astype(dtype)
    gz = (idx // (side * side)).astype(dtype)
    spacing = spread / side
    pos = jnp.stack([
        (gx - side / 2) * spacing,
        (gy - side / 2) * spacing,
        gz * spacing + height,
    ], axis=1)
    pos = pos + jax.random.uniform(k1, (n, 3), dtype, -0.2, 0.2) * spacing * 0.3
    quat = jnp.zeros((n, 4), dtype).at[:, 0].set(1.0)
    half = jnp.full((n, 3), 0.5, dtype) * jax.random.uniform(k2, (n, 1), dtype, 0.8, 1.2)
    vel = jax.random.uniform(k3, (n, 3), dtype, -0.5, 0.5)
    return SimState(pos=pos, quat=quat, vel=vel,
                    angvel=jnp.zeros((n, 3), dtype), half=half)


def _pair_contacts_xla(state: SimState, rot, pairs, valid, cfg: GJKEPAConfig):
    """Portable narrowphase: vmapped XLA GJK/EPA over analytic box supports."""
    dtype = state.pos.dtype

    def one(i, j, active):
        sup = make_shape_pair_support(
            jnp.int32(BOX), state.half[i], state.pos[i], rot[i],
            jnp.int32(BOX), state.half[j], state.pos[j], rot[j],
        )
        g = run_gjk(sup, cfg, dtype=dtype, active=active)
        e = run_epa(sup, g.simplex, g.hit, cfg)
        s = sup(e.normal)
        point = 0.5 * (s.a + s.b)
        return g.hit, e.depth, e.normal, point

    return jax.vmap(one)(pairs[:, 0], pairs[:, 1], valid)


def _pair_contacts(state: SimState, rot, pairs, valid, cfg: GJKEPAConfig):
    """Batched GJK/EPA over candidate box pairs.

    On TPU, boxes enter the fused Pallas hull kernel as their 8 world-space
    corners (the pair list is padded to the kernel block size); the contact
    point is then recovered from the analytic box supports along the EPA
    normal (witness midpoint).  Other backends use the portable XLA path.
    """
    if jax.default_backend() != "tpu":
        return _pair_contacts_xla(state, rot, pairs, valid, cfg)

    from ..ops.fused import fused_gjkepa_hulls  # deferred import

    dtype = state.pos.dtype
    block = 128
    p = pairs.shape[0]
    pad = (-p) % block
    if pad:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((pad, 2), pairs.dtype)], axis=0)
        valid_k = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    else:
        valid_k = valid

    signs = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                       for sz in (-1, 1)], dtype)  # (8,3)

    def corners(idx):
        h = state.half[idx]                     # (P,3)
        r = rot[idx]                            # (P,3,3)
        t = state.pos[idx]                      # (P,3)
        local = signs[None, :, :] * h[:, None, :]           # (P,8,3)
        return jnp.einsum("pij,pkj->pki", r, local) + t[:, None, :]

    i_all, j_all = pairs[:, 0], pairs[:, 1]
    res = fused_gjkepa_hulls(corners(i_all), corners(j_all), cfg=cfg,
                             block=block, use_broadphase=True)
    hit = res.hit[:p] & valid
    normal = res.normal[:p]
    i_idx, j_idx = i_all[:p], j_all[:p]

    # witness midpoint via analytic box supports along the EPA normal
    def witness(i, j, n):
        sup = make_shape_pair_support(
            jnp.int32(BOX), state.half[i], state.pos[i], rot[i],
            jnp.int32(BOX), state.half[j], state.pos[j], rot[j],
        )
        s = sup(n)
        return 0.5 * (s.a + s.b)

    point = jax.vmap(witness)(i_idx, j_idx, normal)
    return hit, res.depth[:p], normal, point


@functools.partial(jax.jit, static_argnames=("scfg", "cfg"))
def sim_step(state: SimState, scfg: SimConfig = SimConfig(),
             cfg: GJKEPAConfig = GJKEPAConfig.for_f32()) -> tuple[SimState, dict]:
    """One physics step.  Returns (new_state, diagnostics)."""
    n = state.pos.shape[0]
    dtype = state.pos.dtype
    dt = jnp.asarray(scfg.dt, dtype)

    # gravity
    vel = state.vel + jnp.array([0.0, 0.0, scfg.gravity], dtype) * dt
    angvel = state.angvel

    rot = jax.vmap(quat_to_mat)(state.quat)

    # ---- broadphase ------------------------------------------------------
    radii = jnp.linalg.norm(state.half, axis=1)
    pairs, valid, n_cand = grid_candidate_pairs(
        state.pos, radii, cell_size=0.5, max_pairs=scfg.max_pairs)

    # ---- narrowphase -----------------------------------------------------
    hit, depth, normal, point = _pair_contacts(state, rot, pairs, valid, cfg)
    contact = hit & valid

    # ---- ground contacts: deepest corner of each box ---------------------
    corners = jnp.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], dtype)  # (8,3)

    def ground_one(p, r, h):
        pts = p + (corners * h) @ r.T
        k = jnp.argmin(pts[:, 2])
        deepest = pts[k]
        pen = scfg.ground_z - deepest[2]
        return pen > 0, jnp.maximum(pen, 0.0), deepest

    g_hit, g_pen, g_point = jax.vmap(ground_one)(state.pos, rot, state.half)

    # ---- sequential impulses ----------------------------------------------
    inv_mass = 1.0 / (8.0 * state.half[:, 0] * state.half[:, 1] * state.half[:, 2])
    # box inertia (diagonal in body frame; world approx via scalar — boxes
    # are near-cubes here).  I = m/12 * (h_j^2 + h_k^2), use mean.
    ext2 = (2 * state.half) ** 2
    inertia = (1.0 / inv_mass) / 12.0 * (ext2.sum(axis=1) - ext2.mean(axis=1))
    inv_inertia = 1.0 / inertia

    i_idx, j_idx = pairs[:, 0], pairs[:, 1]
    bias = scfg.baumgarte / dt

    def solve(carry, _):
        vel, angvel = carry

        # --- pair contacts ---
        ra = point - state.pos[i_idx]
        rb = point - state.pos[j_idx]
        va = vel[i_idx] + jnp.cross(angvel[i_idx], ra)
        vb = vel[j_idx] + jnp.cross(angvel[j_idx], rb)
        # normal points from the min EPA face outward (separates A from B by
        # moving B along +normal), so relative approach velocity is
        # dot(vb - va, -normal) ... contact impulse pushes B along +normal.
        rel = vb - va
        vn = jnp.einsum("ij,ij->i", rel, normal)
        k_n = (inv_mass[i_idx] + inv_mass[j_idx]
               + inv_inertia[i_idx] * jnp.einsum(
                   "ij,ij->i", jnp.cross(ra, normal), jnp.cross(ra, normal))
               + inv_inertia[j_idx] * jnp.einsum(
                   "ij,ij->i", jnp.cross(rb, normal), jnp.cross(rb, normal)))
        jn = (-vn + bias * depth) / jnp.maximum(k_n, 1e-6)
        jn = jnp.where(contact, jnp.maximum(jn, 0.0), 0.0)
        imp = jn[:, None] * normal

        vel = vel.at[i_idx].add(-imp * inv_mass[i_idx, None])
        vel = vel.at[j_idx].add(imp * inv_mass[j_idx, None])
        angvel = angvel.at[i_idx].add(-inv_inertia[i_idx, None] * jnp.cross(ra, imp))
        angvel = angvel.at[j_idx].add(inv_inertia[j_idx, None] * jnp.cross(rb, imp))

        # --- pair friction (Coulomb clamp on the tangential relative vel) ---
        vt_rel = rel - vn[:, None] * normal
        vt_n = jnp.linalg.norm(vt_rel, axis=1)
        jt = jnp.where(contact,
                       jnp.minimum(vt_n / jnp.maximum(k_n, 1e-6),
                                   scfg.friction * jn), 0.0)
        t_dirp = -vt_rel / jnp.maximum(vt_n, 1e-6)[:, None]
        imp_tp = jt[:, None] * t_dirp
        vel = vel.at[i_idx].add(-imp_tp * inv_mass[i_idx, None])
        vel = vel.at[j_idx].add(imp_tp * inv_mass[j_idx, None])
        angvel = angvel.at[i_idx].add(-inv_inertia[i_idx, None]
                                      * jnp.cross(ra, imp_tp))
        angvel = angvel.at[j_idx].add(inv_inertia[j_idx, None]
                                      * jnp.cross(rb, imp_tp))

        # --- ground contacts (static plane, normal +z) ---
        rg = g_point - state.pos
        vg = vel + jnp.cross(angvel, rg)
        vn_g = vg[:, 2]
        k_g = inv_mass + inv_inertia * jnp.einsum(
            "ij,ij->i", jnp.cross(rg, jnp.array([0.0, 0.0, 1.0], dtype)[None, :]),
            jnp.cross(rg, jnp.array([0.0, 0.0, 1.0], dtype)[None, :]))
        jg = jnp.where(g_hit, jnp.maximum(-vn_g + bias * g_pen, 0.0)
                       / jnp.maximum(k_g, 1e-6), 0.0)
        imp_g = jg[:, None] * jnp.array([0.0, 0.0, 1.0], dtype)[None, :]
        vel = vel + imp_g * inv_mass[:, None]
        angvel = angvel + inv_inertia[:, None] * jnp.cross(rg, imp_g)

        # --- ground friction (tangential clamp) ---
        vt = vg.at[:, 2].set(0.0)
        vt_norm = jnp.linalg.norm(vt, axis=1)
        jt = jnp.where(g_hit, jnp.minimum(vt_norm / jnp.maximum(k_g, 1e-6),
                                          scfg.friction * jg), 0.0)
        t_dir = -vt / jnp.maximum(vt_norm, 1e-6)[:, None]
        imp_t = jt[:, None] * t_dir
        vel = vel + imp_t * inv_mass[:, None]
        angvel = angvel + inv_inertia[:, None] * jnp.cross(rg, imp_t)

        return (vel, angvel), None

    (vel, angvel), _ = jax.lax.scan(solve, (vel, angvel), None,
                                    length=scfg.solver_iters)

    # ---- integrate ---------------------------------------------------------
    pos = state.pos + vel * dt
    quat = jax.vmap(quat_integrate, in_axes=(0, 0, None))(state.quat, angvel, dt)

    diag = {
        "n_candidates": n_cand,
        "n_contacts": jnp.sum(contact.astype(jnp.int32)),
        "n_ground": jnp.sum(g_hit.astype(jnp.int32)),
        "max_depth": jnp.max(jnp.where(contact, depth, 0.0)),
    }
    return SimState(pos=pos, quat=quat, vel=vel, angvel=angvel,
                    half=state.half), diag
