"""Large-hull scaling (SURVEY.md §5.7, VERDICT round-1 item 10).

The reference takes arbitrary N1/N2 per call (`/root/reference/src/
GCLIB_GJKEPA.f90:43-46`); its support scan is a sequential O(N) loop
(:1040-1057).  The fused kernels hold both (3, N, block) hull buffers
resident in VMEM, so large N must shrink the lane block instead of blowing
VMEM: `_auto_block` caps block so the inputs fit a 6 MB budget
(N=64 -> block 512 unchanged; N=1024 -> block 256).

These tests pin (a) the auto-block policy, (b) fused-vs-XLA agreement at
N=1024 through the full pipeline, and (c) mask support at large N.
"""

import jax.numpy as jnp
import numpy as np

from gjkepa_tpu import GJKEPAConfig, gjkepa_batch
from gjkepa_tpu.ops.fused import _auto_block, fused_gjkepa_hulls

F32 = GJKEPAConfig.for_f32()


def test_auto_block_policy():
    assert _auto_block(512, 64, 64) == 512          # small hulls: unchanged
    assert _auto_block(512, 1024, 1024) == 256      # 24 KB/lane -> 256 lanes
    assert _auto_block(512, 4096, 4096) == 128      # floor at one lane tile
    assert _auto_block(128, 1024, 1024) == 128      # never grows the block


def _big_hulls(rng, b, n, radius=1.0, spread=0.5):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= radius * (0.6 + 0.4 * rng.random((b, n, 1)))
    v += rng.normal(size=(b, 1, 3)) * spread
    return v.astype(np.float32)


def test_n1024_fused_matches_xla():
    """Full fused pipeline at N=1024 vertices/hull: hit/depth/normal agree
    with the portable XLA path (same f32 config) — no VMEM blowup, no
    accuracy cliff at the auto-reduced block."""
    rng = np.random.default_rng(11)
    b = 8
    p1 = jnp.asarray(_big_hulls(rng, b, 1024))
    p2 = jnp.asarray(_big_hulls(rng, b, 1024))
    rf = fused_gjkepa_hulls(p1, p2, cfg=F32, block=512, interpret=True)
    rx = gjkepa_batch(p1, p2, cfg=F32)
    np.testing.assert_array_equal(np.asarray(rf.hit), np.asarray(rx.hit))
    hit = np.asarray(rx.hit)
    if hit.any():
        df, dx = np.asarray(rf.depth)[hit], np.asarray(rx.depth)[hit]
        np.testing.assert_allclose(df, dx, atol=5e-5)


def test_n1024_masked_equals_unpadded():
    """A 700-vertex hull padded to 1024 rows under a mask gives the same
    answer as the unpadded 700-vertex call (large-N mask path)."""
    rng = np.random.default_rng(3)
    b, n_real, n_pad = 4, 700, 1024
    p1 = _big_hulls(rng, b, n_real)
    p2 = _big_hulls(rng, b, n_real)
    pad1 = np.concatenate(
        [p1, np.full((b, n_pad - n_real, 3), 7e3, np.float32)], axis=1)
    pad2 = np.concatenate(
        [p2, np.full((b, n_pad - n_real, 3), -7e3, np.float32)], axis=1)
    m = np.zeros((b, n_pad), bool)
    m[:, :n_real] = True
    rm = fused_gjkepa_hulls(jnp.asarray(pad1), jnp.asarray(pad2),
                            mask1=jnp.asarray(m), mask2=jnp.asarray(m),
                            cfg=F32, interpret=True)
    ru = fused_gjkepa_hulls(jnp.asarray(p1), jnp.asarray(p2), cfg=F32,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(rm.hit), np.asarray(ru.hit))
    np.testing.assert_allclose(np.asarray(rm.depth), np.asarray(ru.depth),
                               atol=1e-6)
