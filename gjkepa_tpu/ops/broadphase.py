"""L4 broadphase: bounding-sphere reject + uniform-grid pair generation.

The reference's only broadphase is a centroid + max-radius bounding-sphere
guard with a fixed 1.0 inflation
(RoughCollisionDetection_SphericalEnvelope,
``/root/reference/src/GCLIB_GJKEPA.f90:1165-1188``).  The uniform grid is a
capability extension used by the rigid-body mini-sim (BASELINE config 5) to
generate fixed-capacity candidate pair lists on-device.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sphere_envelope_overlap", "bounding_spheres", "grid_candidate_pairs"]


def _masked_mean(p, mask):
    if mask is None:
        return jnp.mean(p, axis=0)
    cnt = jnp.maximum(jnp.sum(mask), 1).astype(p.dtype)
    return jnp.sum(jnp.where(mask[:, None], p, 0.0), axis=0) / cnt


def bounding_spheres(p, mask=None):
    """Centroid + max-radius bounding sphere of a vertex cloud (ref :1174-1182)."""
    c = _masked_mean(p, mask)
    d = jnp.linalg.norm(p - c, axis=1)
    if mask is not None:
        d = jnp.where(mask, d, 0.0)
    return c, jnp.max(d)


def sphere_envelope_overlap(p1, p2, mask1=None, mask2=None, tol: float = 1.0):
    """Reject if ||c1-c2|| > r1 + r2 + TOL, TOL=1.0 (ref :1172,1185)."""
    c1, r1 = bounding_spheres(p1, mask1)
    c2, r2 = bounding_spheres(p2, mask2)
    return jnp.linalg.norm(c1 - c2) <= r1 + r2 + tol


def grid_candidate_pairs(centers, radii, cell_size: float, max_pairs: int):
    """Broadphase candidate-pair generation over body bounding spheres.

    Emits up to `max_pairs` candidate (i, j) pairs whose inflated spheres
    overlap, as a fixed-shape (max_pairs, 2) int32 buffer + validity mask;
    also returns the true candidate count so callers can detect overflow.

    For sim-scale n (O(1k) bodies) this is an O(n^2) masked sweep: on TPU a
    1k x 1k distance matrix is ~1M lanes of cheap VPU work and one argsort,
    which beats gather-heavy hash-grid probing by a wide margin.  `cell_size`
    inflates the acceptance radius the way a one-cell grid neighborhood
    would, so narrowphase sees the same candidate set a classic uniform grid
    produces.
    """
    n = centers.shape[0]
    dist = jnp.linalg.norm(centers[:, None, :] - centers[None, :, :], axis=-1)
    rsum = radii[:, None] + radii[None, :]
    iu = jnp.triu_indices(n, k=1)
    cand = dist[iu] <= rsum[iu] + cell_size
    # compact candidate pairs to the front of a fixed buffer
    order = jnp.argsort(~cand)
    ii = iu[0][order][:max_pairs]
    jj = iu[1][order][:max_pairs]
    valid = cand[order][:max_pairs]
    pairs = jnp.stack([ii, jj], axis=1).astype(jnp.int32)
    return pairs, valid, jnp.sum(cand)
