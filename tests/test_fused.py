"""Fused Pallas kernel vs the XLA reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gjkepa_tpu import GJKEPAConfig, gjkepa_batch
from gjkepa_tpu.ops.fused import fused_gjkepa_hulls
from tests.conftest import cube, random_hull

CFG = GJKEPAConfig.for_f32()


def _batch(rng, b, n, spread=0.8):
    p1 = np.stack([random_hull(rng, n, center=rng.normal(size=3) * spread)
                   for _ in range(b)]).astype(np.float32)
    p2 = np.stack([random_hull(rng, n, center=rng.normal(size=3) * spread)
                   for _ in range(b)]).astype(np.float32)
    return jnp.asarray(p1), jnp.asarray(p2)


def test_fused_matches_xla_path(rng):
    p1, p2 = _batch(rng, 128, 12)
    rf = fused_gjkepa_hulls(p1, p2, cfg=CFG, block=128, interpret=True)
    rx = gjkepa_batch(p1, p2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(rf.hit), np.asarray(rx.hit))
    np.testing.assert_array_equal(np.asarray(rf.status), np.asarray(rx.status))
    m = np.asarray(rf.hit)
    assert m.sum() > 10
    np.testing.assert_allclose(np.asarray(rf.depth)[m], np.asarray(rx.depth)[m],
                               atol=1e-6)
    # normals: same min face generically
    dots = np.einsum("ij,ij->i", np.asarray(rf.normal)[m], np.asarray(rx.normal)[m])
    assert (dots > 1.0 - 1e-5).mean() > 0.9
    np.testing.assert_allclose(np.asarray(rf.distance), np.asarray(rx.distance),
                               atol=1e-6)


def test_fused_known_geometry():
    c0 = cube([0, 0, 0]).astype(np.float32)
    offsets = [0.3, 0.7, 1.2, 2.5] * 32
    p1 = jnp.asarray(np.stack([c0] * 128))
    p2 = jnp.asarray(np.stack([c0 + np.array([dx, 0, 0], np.float32)
                               for dx in offsets]))
    r = fused_gjkepa_hulls(p1, p2, cfg=CFG, block=128, interpret=True)
    hit = np.asarray(r.hit)
    depth = np.asarray(r.depth)
    for i, dx in enumerate(offsets):
        if dx < 1.0:
            assert hit[i] and abs(depth[i] - (1.0 - dx)) < 1e-5, (i, dx, depth[i])
        else:
            assert not hit[i], (i, dx)


def test_fused_accepts_any_batch_size(rng):
    """Non-multiple-of-128 batches are padded internally with
    broadphase-rejected lanes and sliced back (VERDICT round-1 item 3)."""
    p1, p2 = _batch(rng, 100, 12)
    rf = fused_gjkepa_hulls(p1, p2, cfg=CFG, block=128, interpret=True)
    rx = gjkepa_batch(p1, p2, cfg=CFG)
    assert rf.hit.shape == (100,)
    np.testing.assert_array_equal(np.asarray(rf.hit), np.asarray(rx.hit))
    m = np.asarray(rf.hit)
    np.testing.assert_allclose(np.asarray(rf.depth)[m], np.asarray(rx.depth)[m],
                               atol=1e-6)


def test_fused_ragged_hull_masks(rng):
    """Per-vertex masks on the fused path agree with the masked XLA path
    (VERDICT round-1 item 3: reference takes arbitrary N1/N2 per call)."""
    b, n = 128, 16
    p1, p2 = _batch(rng, b, n)
    n1 = rng.integers(4, n + 1, size=b)
    n2 = rng.integers(4, n + 1, size=b)
    m1 = jnp.asarray(np.arange(n)[None, :] < n1[:, None])
    m2 = jnp.asarray(np.arange(n)[None, :] < n2[:, None])
    rf = fused_gjkepa_hulls(p1, p2, m1, m2, cfg=CFG, block=128, interpret=True)
    rx = gjkepa_batch(p1, p2, m1, m2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(rf.hit), np.asarray(rx.hit))
    m = np.asarray(rf.hit)
    assert m.sum() > 5
    np.testing.assert_allclose(np.asarray(rf.depth)[m], np.asarray(rx.depth)[m],
                               atol=1e-6)
    dots = np.einsum("ij,ij->i", np.asarray(rf.normal)[m],
                     np.asarray(rx.normal)[m])
    assert (dots > 1.0 - 1e-5).mean() > 0.9


def test_fused_full_api_matches_xla(rng):
    from gjkepa_tpu.api import gjkepa_batch_fused

    p1, p2 = _batch(rng, 128, 12, spread=0.6)
    rf = gjkepa_batch_fused(p1, p2, cfg=CFG, interpret=True)
    rx = gjkepa_batch(p1, p2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(rf.hit), np.asarray(rx.hit))
    m = np.asarray(rf.hit)
    assert m.sum() > 10
    np.testing.assert_allclose(np.asarray(rf.contact_point)[m],
                               np.asarray(rx.contact_point)[m], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rf.colli_type)[m],
                                  np.asarray(rx.colli_type)[m])
    np.testing.assert_allclose(np.asarray(rf.depth)[m],
                               np.asarray(rx.depth)[m], atol=1e-6)


def test_fused_cascade_capacity_path():
    """Deep-penetration pairs with tiny stage-1 caps must be rescued by the
    full-cap cascade stage: depth still matches the XLA path."""
    from gjkepa_tpu import GJKEPAConfig

    rng = np.random.default_rng(3)
    b, n = 128, 24
    big = rng.normal(size=(b, n, 3)).astype(np.float32)
    big /= np.linalg.norm(big, axis=-1, keepdims=True)
    big *= 2.0
    small = rng.normal(size=(b, n, 3)).astype(np.float32)
    small /= np.linalg.norm(small, axis=-1, keepdims=True)
    small = small * 0.5 + rng.normal(size=(b, 1, 3)).astype(np.float32) * 0.2
    p1, p2 = jnp.asarray(big), jnp.asarray(small)
    cfg = GJKEPAConfig.for_f32()  # cascade: (24,48) then (40,80)
    rf = fused_gjkepa_hulls(p1, p2, cfg=cfg, block=128, interpret=True)
    rx = gjkepa_batch(p1, p2, cfg=cfg)
    m = np.asarray(rf.hit)
    assert m.mean() > 0.9  # deep-penetration fixture: nearly all hit
    np.testing.assert_allclose(np.asarray(rf.depth)[m], np.asarray(rx.depth)[m],
                               atol=1e-6)


def test_fused_distance_matches_xla(rng):
    from gjkepa_tpu.api import gjk_distance_batch
    from gjkepa_tpu.ops.fused import fused_gjk_distance_hulls

    p1, p2 = _batch(rng, 128, 12, spread=2.0)
    rf = fused_gjk_distance_hulls(p1, p2, cfg=CFG, interpret=True)
    rx = gjk_distance_batch(p1, p2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(rf.intersecting),
                                  np.asarray(rx.intersecting))
    m = ~np.asarray(rf.intersecting)
    assert m.sum() > 50
    np.testing.assert_allclose(np.asarray(rf.distance)[m],
                               np.asarray(rx.distance)[m], atol=1e-5)
    # witnesses realize the distance
    gap = np.linalg.norm(np.asarray(rf.point_a) - np.asarray(rf.point_b), axis=1)
    np.testing.assert_allclose(gap[m], np.asarray(rf.distance)[m], atol=1e-5)


def test_kernel_closed_form_matches_xla_oracle(rng):
    """The in-kernel closed-form channel (_closed_form_rows) must agree
    with its XLA twin (_closed_form_shape_pairs) on every handled lane —
    hit, depth, normal, and status."""
    import numpy as np

    from gjkepa_tpu.models.shapes import (boxes, capsules, concat_shapes,
                                          cylinders, spheres)
    from gjkepa_tpu.ops.fused import (_closed_form_shape_pairs,
                                      fused_gjkepa_shapes)

    n = 64

    def rots(k):
        ms = []
        for _ in range(k):
            q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            ms.append(q)
        return jnp.asarray(np.stack(ms), jnp.float32)

    pos = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(n, 3)).astype(np.float32) * 0.8)
    r = lambda: jnp.asarray(  # noqa: E731
        (0.3 + 0.4 * rng.random(n)).astype(np.float32))
    hext = lambda: jnp.asarray(  # noqa: E731
        0.2 + 0.4 * rng.random((n, 3)), jnp.float32)
    a = concat_shapes(
        spheres(r(), pos=pos()),
        capsules(r(), r(), pos=pos(), rot=rots(n)),
        spheres(r(), pos=pos()),
        spheres(r(), pos=pos()),
        cylinders(r(), r(), pos=pos(), rot=rots(n)),
        boxes(hext(), pos=pos(), rot=rots(n)),
    )
    b = concat_shapes(
        capsules(r(), r(), pos=pos(), rot=rots(n)),
        capsules(r(), r(), pos=pos(), rot=rots(n)),
        boxes(hext(), pos=pos(), rot=rots(n)),
        cylinders(r(), r(), pos=pos(), rot=rots(n)),
        spheres(r(), pos=pos()),
        boxes(hext(), pos=pos(), rot=rots(n)),
    )
    cfg = GJKEPAConfig.for_f32()
    res = fused_gjkepa_shapes(a, b, cfg=cfg, interpret=True)
    handled, c_hit, c_depth, c_normal, c_gap, c_status = (
        np.asarray(x) for x in _closed_form_shape_pairs(a, b, cfg.broadphase_tol))
    assert handled.all()  # every pair type here has a closed form
    np.testing.assert_array_equal(np.asarray(res.hit), c_hit)
    np.testing.assert_array_equal(np.asarray(res.status), c_status)
    np.testing.assert_allclose(np.asarray(res.depth), c_depth, atol=2e-6)
    # normals at 1e-5: the lane-rows kernel and the einsum XLA twin order
    # f32 arithmetic differently; near-parallel capsule pairs amplify the
    # segment-segment direction by ~1/sin(angle)
    np.testing.assert_allclose(np.asarray(res.normal), c_normal, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.epa_iters), 0)


@pytest.mark.parametrize("version", [1, 3])
def test_fused_full_api_contact_versions(rng, version):
    """The fused full-surface path under contact-point versions 1 and 3
    (the version-2 path is covered by test_fused_full_api_matches_xla):
    contact point / normal / type must match the portable XLA batch path,
    including version 3's normal rewrite (ref :334-335, :426-452)."""
    import numpy as np

    from gjkepa_tpu import GJKEPAConfig, gjkepa_batch
    from gjkepa_tpu.api import gjkepa_batch_fused
    from tests.conftest import random_hull

    cfg = GJKEPAConfig.for_f32().replace(version=version)
    b = 32
    p1 = np.stack([random_hull(rng, 10, center=rng.normal(size=3) * 0.4)
                   for _ in range(b)]).astype(np.float32)
    p2 = np.stack([random_hull(rng, 10, center=rng.normal(size=3) * 0.4)
                   for _ in range(b)]).astype(np.float32)
    rf = gjkepa_batch_fused(jnp.asarray(p1), jnp.asarray(p2), cfg=cfg,
                            interpret=True)
    rx = gjkepa_batch(jnp.asarray(p1), jnp.asarray(p2), cfg=cfg)
    hit = np.asarray(rx.hit)
    np.testing.assert_array_equal(np.asarray(rf.hit), hit)
    assert hit.sum() >= 4
    # contact outputs are functions of the (per-path) EPA normal; compare
    # only lanes where the two EPA mechanisms agreed on the normal
    nf, nx = np.asarray(rf.normal), np.asarray(rx.normal)
    agree = hit & (np.einsum("ij,ij->i", nf, nx) > 1.0 - 1e-5)
    assert agree.sum() >= hit.sum() * 3 // 4
    np.testing.assert_array_equal(np.asarray(rf.colli_type)[agree],
                                  np.asarray(rx.colli_type)[agree])
    np.testing.assert_allclose(np.asarray(rf.contact_point)[agree],
                               np.asarray(rx.contact_point)[agree],
                               atol=2e-5)
    if version == 3:  # the rewritten normal lies in the XY plane
        np.testing.assert_allclose(nf[hit][:, 2], 0.0, atol=1e-6)
