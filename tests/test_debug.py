"""Sanitizer / debug mode (SURVEY.md §5.2): checkify NaN + OOB + contract
checks around the portable query path."""

import jax.numpy as jnp
import numpy as np
import pytest

from gjkepa_tpu import GJKEPAConfig, gjkepa_batch
from gjkepa_tpu.debug import checked_gjkepa_batch
from tests.conftest import cube, random_hull


def _batch(rng, b=8):
    p1 = np.stack([random_hull(rng, 10, center=rng.normal(size=3) * 0.5)
                   for _ in range(b)])
    p2 = np.stack([random_hull(rng, 10, center=rng.normal(size=3) * 0.5)
                   for _ in range(b)])
    return jnp.asarray(p1), jnp.asarray(p2)


def test_clean_inputs_pass_and_match_unchecked(rng):
    p1, p2 = _batch(rng)
    cfg = GJKEPAConfig()
    r = checked_gjkepa_batch(p1, p2, cfg=cfg)   # must not raise
    ru = gjkepa_batch(p1, p2, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(r.hit), np.asarray(ru.hit))
    np.testing.assert_array_equal(np.asarray(r.depth), np.asarray(ru.depth))


def test_nan_input_raises(rng):
    p1, p2 = _batch(rng)
    p1 = p1.at[3, 2, 1].set(jnp.nan)
    with pytest.raises(Exception, match="nan|NaN|non-finite"):
        checked_gjkepa_batch(p1, p2, cfg=GJKEPAConfig())


def test_inf_input_raises():
    p1 = jnp.asarray(np.stack([cube(), cube()]))
    p2 = jnp.asarray(np.stack([cube([0.5, 0, 0]), cube([0.25, 0, 0])]))
    p2 = p2.at[1, 0, 0].set(jnp.inf)
    with pytest.raises(Exception):
        checked_gjkepa_batch(p1, p2, cfg=GJKEPAConfig())
