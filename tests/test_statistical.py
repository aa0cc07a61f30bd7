"""Statistical / property tests of the stochastic engine."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.models.retirement import arithmetic_to_log_params
from monte_carlo_retirement_tpu.ops.shocks import monthly_shocks, stream_keys
from tests.conftest import make_config


def test_mean_realised_annual_return_matches_config():
    """Mean compounded annual gross return ~= configured arithmetic mean."""
    mean, vol = 0.12, 0.15
    mu, sigma = arithmetic_to_log_params(mean, vol)
    rng = np.random.default_rng(0)
    z = rng.standard_normal(50_000)
    annual = np.exp(mu + sigma * z)
    assert abs(float(annual.mean()) - (1 + mean)) < 0.005

    z_m = rng.standard_normal(12 * 20_000)
    monthly = np.exp(mu / 12 + sigma / math.sqrt(12) * z_m)
    yearly = monthly.reshape(-1, 12).prod(axis=1)
    assert abs(float(yearly.mean()) - (1 + mean)) < 0.01


def test_engine_mean_growth_matches_config():
    """End-to-end: E[final] ~= initial * (1+mean)^years with no flows/taxes."""
    mean = 0.08
    cfg = make_config(
        initial_balance=100_000.0,
        monthly_expenses=0.0,
        retirement_years=10,
        allocation_inv1_pct=1.0,
        inv1_returns_mean=mean,
        inv1_returns_volatility=0.15,
        inv2_premium_over_inflation_mean=0.0,
        inv2_premium_over_inflation_volatility=0.0,
        inflation_rate_mean=0.0,
        inflation_rate_volatility=0.0,
        seed=5,
    )
    res = Engine(cfg).run(0, 4000)
    expected = 100_000.0 * (1 + mean) ** 10
    realized = float(res.final_balance.mean())
    assert abs(realized / expected - 1.0) < 0.05


def test_perfect_equity_inflation_correlation_is_preserved():
    """rho = +/-1 must be exact, not a silent fallback to zero."""
    search, _ = stream_keys(4)
    for rho, sign in ((1.0, 1.0), (-1.0, -1.0)):
        z_eq, z_inf, _ = monthly_shocks(
            search, jnp.int32(3), 128, jnp.float64(rho), jnp.float64
        )
        np.testing.assert_allclose(np.asarray(z_inf), sign * np.asarray(z_eq))


def test_shocks_are_crn_stable_across_batch_sizes():
    """Row p's draws are identical for any batch size (counter-based RNG)."""
    search, final = stream_keys(42)
    a = monthly_shocks(search, jnp.int32(7), 8, jnp.float64(0.3), jnp.float64)
    b = monthly_shocks(search, jnp.int32(7), 64, jnp.float64(0.3), jnp.float64)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y)[:8])
    # Search and final streams are independent (different draws)
    c = monthly_shocks(final, jnp.int32(7), 8, jnp.float64(0.3), jnp.float64)
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_success_probability_non_decreasing_in_working_months():
    """More working months must not reduce success probability under CRN.

    Mirrors the reference's own monotonicity test
    (tests/test_simulation_correctness.py:55-81). Strictly, per-path
    monotonicity is not a theorem — extending work shifts the retirement
    window onto fresh absolute-month shocks — so this doubles as a pin on
    the RNG stream layout: if a deliberate layout change flips one ladder
    comparison here, re-seat the seed rather than weaken the assertion."""
    cfg = make_config(
        initial_balance=100_000.0,
        monthly_contribution=3_000.0,
        monthly_expenses=5_000.0,
        retirement_years=30,
        inv1_returns_mean=0.10,
        inv1_returns_volatility=0.12,
        inflation_rate_mean=0.04,
        inflation_rate_volatility=0.015,
        seed=123,
    )
    eng = Engine(cfg)
    months = list(range(0, 61, 6))
    probs = eng.probe(months, 80, stream="search")
    for i in range(1, len(probs)):
        assert probs[i] + 1e-9 >= probs[i - 1], (
            f"Probability fell from {probs[i-1]:.2f}% at {months[i-1]} months "
            f"to {probs[i]:.2f}% at {months[i]} months: {probs}"
        )


def test_probe_matches_full_run_success_probability():
    """The search probe and the full run agree on the same stream."""
    cfg = make_config(
        initial_balance=150_000.0,
        monthly_contribution=2_000.0,
        monthly_expenses=3_000.0,
        retirement_years=15,
        seed=77,
    )
    eng = Engine(cfg)
    probs = eng.probe([24], 64, stream="search")
    res = eng.run(24, 64, stream="search")
    assert probs[0] == pytest.approx(res.success_probability, abs=1e-6)


def test_seed_reproducibility_and_stream_independence():
    cfg = make_config(seed=99, retirement_years=5)
    a = Engine(cfg).run(12, 32, stream="final")
    b = Engine(cfg).run(12, 32, stream="final")
    np.testing.assert_allclose(a.final_balance, b.final_balance)
    c = Engine(cfg).run(12, 32, stream="search")
    assert not np.allclose(a.final_balance, c.final_balance)


def test_seed_beyond_prngkey_range_is_accepted():
    """The reference's SeedSequence accepts arbitrarily large ints, so a
    config carrying one must work here too — stream_keys folds the FULL
    seed entropy through numpy's SeedSequence (it does NOT truncate mod
    2**63, which would collide s with s + 2**63) instead of overflowing
    jax.random.PRNGKey."""
    big = 2**63 + 12345
    cfg = make_config(seed=big, retirement_years=2)
    outs = Engine(cfg).run(0, 32, stream="final")
    assert np.isfinite(np.asarray(outs.final_balance)).all()
    # Deterministic: the same huge seed reproduces.
    outs2 = Engine(make_config(seed=big, retirement_years=2)).run(
        0, 32, stream="final"
    )
    np.testing.assert_allclose(outs.final_balance, outs2.final_balance)
    # Full entropy: seeds that collide mod 2**63 still get distinct streams.
    outs3 = Engine(make_config(seed=12345, retirement_years=2)).run(
        0, 32, stream="final"
    )
    assert not np.allclose(outs.final_balance, outs3.final_balance)


def test_device_summaries_match_numpy_reference():
    """On-device percentile/summary reductions equal their NumPy/pandas
    counterparts on the same per-path outputs."""
    import pandas as pd

    from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
    from monte_carlo_retirement_tpu.models.retirement import SimParams
    from monte_carlo_retirement_tpu.ops.stats import summarize

    cfg = make_config(retirement_years=6, seed=31, monthly_expenses=2_500.0)
    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(31)
    outs = simulate_paths(
        params, jnp.int32(18), key, n_paths=128, t_scan=90,
        retirement_years=6, traj_len=9, dtype=jnp.float64,
    )
    sample_idx = jnp.arange(5, dtype=jnp.int32)
    summary = summarize(outs, sample_idx)

    final = np.asarray(outs.final_balance)
    np.testing.assert_allclose(
        np.asarray(summary.final_balance_percentiles),
        np.percentile(final, [1, 5, 10, 25, 50, 75, 90, 95, 99]),
        rtol=1e-12,
    )
    traj = np.asarray(outs.trajectory)
    np.testing.assert_allclose(
        np.asarray(summary.trajectory_percentiles),
        np.percentile(traj, [5, 10, 25, 50, 75, 90, 95], axis=0),
        rtol=1e-12,
    )
    wr = np.asarray(outs.withdrawal_rates)
    wr_df = pd.DataFrame(wr.T)
    expected = wr_df.quantile([0.05, 0.25, 0.5, 0.75, 0.95], axis=1).to_numpy()
    got = np.asarray(summary.wr_percentiles)
    # NaN structure must match exactly (a finite garbage value for an empty
    # year would otherwise slip through the masked comparison below).
    np.testing.assert_array_equal(np.isnan(got), np.isnan(expected))
    mask = ~np.isnan(expected)
    np.testing.assert_allclose(got[mask], expected[mask], rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(summary.wr_observation_counts),
        (~np.isnan(wr)).sum(axis=0),
    )
    assert float(summary.success_probability) == pytest.approx(
        np.asarray(outs.success).mean() * 100.0
    )
