"""Streamed large-N hull support (SURVEY.md §5.7 / VERDICT round-2 item 6).

The resident fused kernels hold both (3, N, block) hull buffers in VMEM,
capping N at ~4k combined vertices; `_fused_hulls_streamed` keeps the hulls
in HBM and DMA-streams (3, tile, block) slabs through scratch per support
probe.  These tests pin (a) bitwise agreement with the resident path (the
per-tile argmax + strict cross-tile max reproduces the reference's
first-max scan exactly), (b) the automatic dispatch threshold, and (c) the
tile-padding rule.  On-device N=8192 coverage lives in
tests/test_fused_tpu.py (TPU tier).
"""

import numpy as np
import jax.numpy as jnp

from gjkepa_tpu import GJKEPAConfig
from gjkepa_tpu.ops.fused import (_AUTO_BLOCK_BUDGET, _fused_hulls_streamed,
                                  fused_gjkepa_hulls)

CFG = GJKEPAConfig.for_f32()


def _hulls(rng, b, n, spread=0.6):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= 0.5 + 0.5 * rng.random((b, n, 1))
    return jnp.asarray(v + rng.normal(size=(b, 1, 3)) * spread, jnp.float32)


def test_streamed_bitwise_matches_resident(rng):
    """Same inputs, tiny tile: the streamed pipeline must reproduce the
    resident kernels EXACTLY (hit, depth, distance) — identical arithmetic,
    only the scan order over vertex slabs differs, and first-max
    tie-breaking is preserved across slabs."""
    b, n = 128, 64
    p1, p2 = _hulls(rng, b, n), _hulls(rng, b, n)
    rs = _fused_hulls_streamed(p1, p2, b, CFG, True, True, True,
                               block=128, tile=16)
    rr = fused_gjkepa_hulls(p1, p2, cfg=CFG, block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(rs.hit), np.asarray(rr.hit))
    np.testing.assert_array_equal(np.asarray(rs.status), np.asarray(rr.status))
    np.testing.assert_array_equal(np.asarray(rs.depth), np.asarray(rr.depth))
    np.testing.assert_array_equal(np.asarray(rs.distance),
                                  np.asarray(rr.distance))
    assert np.asarray(rr.hit).sum() > 20


def test_streamed_tile_padding(rng):
    """N not a multiple of the tile: padded by repeating the first vertex
    (no geometry change) — results equal the resident path."""
    b, n = 128, 48                      # pads 48 -> 64 at tile=16
    p1, p2 = _hulls(rng, b, n), _hulls(rng, b, n)
    rs = _fused_hulls_streamed(p1, p2, b, CFG, True, True, True,
                               block=128, tile=16)
    rr = fused_gjkepa_hulls(p1, p2, cfg=CFG, block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(rs.hit), np.asarray(rr.hit))
    np.testing.assert_array_equal(np.asarray(rs.depth), np.asarray(rr.depth))


def test_large_n_dispatch_threshold():
    """fused_gjkepa_hulls routes to the streamed path exactly when the
    resident buffers cannot fit the VMEM budget at the minimum lane width."""
    per_lane_limit = _AUTO_BLOCK_BUDGET // (3 * 4 * 128)
    assert per_lane_limit == 4096       # documented threshold: n1+n2 > 4096
