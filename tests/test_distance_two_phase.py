"""Two-phase straggler dispatch of the fused distance kernel.

The production mode of fused_gjk_distance_hulls runs everyone at a low
iteration cap, then gathers the lanes still running into a compact prefix
and restarts them at the full cap (ops/fused.py).  The restart retraces
the identical deterministic iteration sequence, so every DistanceResult
field must be bit-identical to the single-phase kernel — including when
the straggler population overflows the B/8 prefix and the full-width
phase-2 cond fires.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gjkepa_tpu import GJKEPAConfig

CFG = GJKEPAConfig.for_f32()


def _batch(rng, b, n, spread):
    v = rng.normal(size=(b, n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v *= 0.5 + 0.5 * rng.random((b, n, 1))
    c = rng.normal(size=(b, 1, 3)) * spread
    return jnp.asarray((v + c).astype(np.float32)), jnp.asarray(
        (v[::-1] + c[::-1] * -0.5).astype(np.float32))


@pytest.mark.slow
@pytest.mark.parametrize("phase1_iters", [2, 12])
def test_two_phase_distance_bit_identical(rng, phase1_iters):
    """phase1_iters=2 leaves most of the 512 lanes unconverged, forcing
    the n_unf > C full-width phase-2 fallback; phase1_iters=12 exercises
    the compact-prefix path with the phase-1 passthrough tail."""
    from gjkepa_tpu.ops.fused import fused_gjk_distance_hulls

    p1, p2 = _batch(rng, 512, 12, spread=2.0)
    r2p = fused_gjk_distance_hulls(p1, p2, cfg=CFG, interpret=True,
                                   two_phase=True,
                                   phase1_iters=phase1_iters)
    r1p = fused_gjk_distance_hulls(p1, p2, cfg=CFG, interpret=True,
                                   two_phase=False)
    for name in r2p._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(r2p, name)), np.asarray(getattr(r1p, name)),
            err_msg=f"phase1_iters={phase1_iters}: field {name} diverges")
    # the fixture must actually produce stragglers for the low cap
    if phase1_iters == 2:
        assert int((np.asarray(r1p.iters) > 2).sum()) > 64
