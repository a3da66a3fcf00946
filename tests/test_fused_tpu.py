"""Compiled-Mosaic kernel checks on a real TPU (VERDICT round-1 item 4).

The regular suite exercises the fused kernels in interpret mode only; a
Mosaic lowering regression would pass it and fail on hardware.  These tests
run the COMPILED kernels and compare against the same kernels in interpret
mode (bitwise-comparable arithmetic) and the XLA path.

Run with:  GJKEPA_TPU_TESTS=1 python -m pytest tests/test_fused_tpu.py -q

Shapes are chosen to match bench.py's programs so the persistent compile
cache makes this cheap (~seconds when warm).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("GJKEPA_TPU_TESTS", "") in ("", "0"),
    reason="TPU kernel tests need GJKEPA_TPU_TESTS=1 (and a real TPU)",
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("GJKEPA_TPU_TESTS", "") not in ("", "0"):
    pytestmark = pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason=f"needs a TPU backend, have {jax.default_backend()}",
    )


def random_hulls(rng, b, n, spread=0.8):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= 0.5 + 0.5 * rng.random((b, n, 1))
    return jnp.asarray((v + rng.normal(size=(b, 1, 3)) * spread),
                       dtype=jnp.float32)


def _cfg():
    from gjkepa_tpu import GJKEPAConfig

    return GJKEPAConfig.for_f32()


def _compare(rc, ri, what, depth_atol=1e-5):
    np.testing.assert_array_equal(np.asarray(rc.hit), np.asarray(ri.hit),
                                  err_msg=f"{what}: hit mismatch")
    m = np.asarray(rc.hit)
    np.testing.assert_allclose(np.asarray(rc.depth)[m],
                               np.asarray(ri.depth)[m], atol=depth_atol,
                               err_msg=f"{what}: depth mismatch")
    dots = np.einsum("ij,ij->i", np.asarray(rc.normal)[m],
                     np.asarray(ri.normal)[m])
    assert (dots > 1.0 - 1e-4).mean() > 0.98, f"{what}: normals diverge"


def test_compiled_hull_pipeline_deep():
    from gjkepa_tpu.ops.fused import fused_gjkepa_hulls

    rng = np.random.default_rng(0)
    b, n = 512, 24
    big = random_hulls(rng, b, n, spread=0.0) * 2.0
    small = random_hulls(rng, b, n, spread=0.0) * 0.5
    small = small + jnp.asarray(rng.normal(size=(b, 1, 3)) * 0.2, jnp.float32)
    cfg = _cfg()
    rc = fused_gjkepa_hulls(big, small, cfg=cfg, block=512)
    ri = fused_gjkepa_hulls(big, small, cfg=cfg, block=512, interpret=True)
    assert np.asarray(rc.hit).mean() > 0.9
    _compare(rc, ri, "deep hulls compiled-vs-interpret")


def test_compiled_hull_boolean():
    from gjkepa_tpu.ops.fused import fused_gjkepa_hulls

    rng = np.random.default_rng(1)
    p1 = random_hulls(rng, 512, 64)
    p2 = random_hulls(rng, 512, 64)
    cfg = _cfg().replace(epa_max_iters=0)
    rc = fused_gjkepa_hulls(p1, p2, cfg=cfg, block=512)
    ri = fused_gjkepa_hulls(p1, p2, cfg=cfg, block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(rc.hit), np.asarray(ri.hit))
    np.testing.assert_array_equal(np.asarray(rc.status), np.asarray(ri.status))


def test_compiled_shape_pipeline():
    from gjkepa_tpu.models import (boxes, capsules, concat_shapes, cylinders,
                                   spheres)
    from gjkepa_tpu.ops.fused import fused_gjkepa_shapes

    rng = np.random.default_rng(2)
    q = 128
    pos = lambda: rng.normal(size=(q, 3)).astype(np.float32)  # noqa: E731
    mk = lambda: concat_shapes(  # noqa: E731
        spheres(0.4 + 0.4 * rng.random(q).astype(np.float32), pos=pos()),
        boxes(0.3 + 0.4 * rng.random((q, 3)).astype(np.float32), pos=pos()),
        capsules(0.2 + 0.2 * rng.random(q).astype(np.float32),
                 0.3 + 0.3 * rng.random(q).astype(np.float32), pos=pos()),
        cylinders(0.2 + 0.3 * rng.random(q).astype(np.float32),
                  0.3 + 0.3 * rng.random(q).astype(np.float32), pos=pos()),
    )
    a, b = mk(), mk()
    cfg = _cfg()
    rc = fused_gjkepa_shapes(a, b, cfg=cfg, block=128)
    ri = fused_gjkepa_shapes(a, b, cfg=cfg, block=128, interpret=True)
    assert int(np.asarray(rc.hit).sum()) > 20
    _compare(rc, ri, "analytic shapes compiled-vs-interpret")


def test_compiled_distance_kernel():
    from gjkepa_tpu.ops.fused import fused_gjk_distance_hulls

    rng = np.random.default_rng(3)
    p1 = random_hulls(rng, 512, 64)
    p2 = random_hulls(rng, 512, 64)
    cfg = _cfg()
    rc = fused_gjk_distance_hulls(p1, p2, cfg=cfg, block=512)
    ri = fused_gjk_distance_hulls(p1, p2, cfg=cfg, block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(rc.intersecting),
                                  np.asarray(ri.intersecting))
    m = ~np.asarray(rc.intersecting)
    assert m.sum() > 100
    np.testing.assert_allclose(np.asarray(rc.distance)[m],
                               np.asarray(ri.distance)[m], atol=1e-5)
