"""Decay math tests (reference: decay.rs unit tests)."""

import math

import numpy as np

from shodh_tpu.constants import (
    DECAY_CROSSOVER_DAYS,
    DECAY_LAMBDA_CONSOLIDATION,
    POWERLAW_BETA,
    POWERLAW_BETA_POTENTIATED,
)
from shodh_tpu.engine.decay import (
    hybrid_decay_factor,
    hybrid_decay_factor_jnp,
    recency_factor_hours,
    tier_decay_factor,
)


def test_no_decay_at_zero_or_negative():
    assert hybrid_decay_factor(0.0) == 1.0
    assert hybrid_decay_factor(-1.0) == 1.0
    assert hybrid_decay_factor(5.0, time_scale=0.0) == 1.0


def test_exponential_phase():
    f1 = hybrid_decay_factor(1.0)
    assert math.isclose(f1, math.exp(-DECAY_LAMBDA_CONSOLIDATION))
    assert hybrid_decay_factor(2.0) < f1


def test_powerlaw_phase_continuity():
    # continuous at the crossover
    eps = 1e-9
    before = hybrid_decay_factor(DECAY_CROSSOVER_DAYS - eps)
    after = hybrid_decay_factor(DECAY_CROSSOVER_DAYS + eps)
    assert math.isclose(before, after, rel_tol=1e-6)


def test_potentiated_decays_slower():
    for d in (1.0, 5.0, 30.0):
        assert hybrid_decay_factor(d, potentiated=True) > hybrid_decay_factor(d)


def test_jnp_matches_scalar():
    import jax.numpy as jnp

    days = np.array([0.0, 0.5, 1.0, 2.9, 3.0, 10.0, 100.0])
    lam_scale = np.ones_like(days)
    beta = np.full_like(days, POWERLAW_BETA)
    got = np.asarray(hybrid_decay_factor_jnp(jnp.asarray(days), lam_scale, beta))
    want = np.array([hybrid_decay_factor(d) for d in days])
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # potentiated path
    got_p = np.asarray(
        hybrid_decay_factor_jnp(
            jnp.asarray(days), lam_scale * 0.5, np.full_like(days, POWERLAW_BETA_POTENTIATED)
        )
    )
    want_p = np.array([hybrid_decay_factor(d, potentiated=True) for d in days])
    np.testing.assert_allclose(got_p, want_p, rtol=1e-5)


def test_tier_decay():
    # L1 decays fast and expires at 48h
    f, prune = tier_decay_factor(10.0, tier=0)
    assert 0.0 < f < 1.0 and not prune
    _, prune = tier_decay_factor(49.0, tier=0)
    assert prune
    # L3 is near-permanent over a month
    f3, prune3 = tier_decay_factor(24.0 * 30, tier=2)
    assert f3 > 0.97 and not prune3
    # LTP protection slows decay
    f_ltp, _ = tier_decay_factor(24.0, tier=1, ltp_decay_factor=0.1)
    f_none, _ = tier_decay_factor(24.0, tier=1, ltp_decay_factor=1.0)
    assert f_ltp > f_none


def test_recency_factor():
    assert math.isclose(recency_factor_hours(0.0), 0.5)
    assert recency_factor_hours(100.0) < 0.5
