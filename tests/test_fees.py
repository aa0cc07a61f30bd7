"""Expense ratios (config.inv{1,2}_expense_ratio_annual — extension, no
reference analog; the reference's returns carry no fees,
backend/simulation.py:14-29).

The fee is an exact drift shift host-side (mu += log1p(-ratio)); the kernels
never see it. Contracts pinned here:
  * Default 0.0 leaves the drift leaves bit-identical (log1p(-0) == 0).
  * Zero-vol closed form: final balance compounds at (1+mean)(1-fee) - 1.
  * The oracle implements the same drag (random fees join the fuzz via
    test_fuzz_parity's generator only for crash scenarios; pinned directly
    here on a stochastic differential).
  * AD: d mean-final / d fee is finite and negative, and AD == FD within
    tolerance (the fee enters smoothly through the drift).
  * FD sensitivity and the optimizer accept the fields; success is
    monotonically non-increasing in the fee.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_retirement_tpu.config import Config
from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.ops.shocks import stream_keys
from tests.conftest import DETERMINISTIC, base_config_dict, make_config
from tests.oracle import simulate_path_oracle


def test_zero_fee_is_bitwise_default():
    plain = SimParams.from_config(make_config(), dtype=jnp.float64)
    feed = SimParams.from_config(
        make_config(inv1_expense_ratio_annual=0.0,
                    inv2_expense_ratio_annual=0.0),
        dtype=jnp.float64,
    )
    np.testing.assert_array_equal(np.asarray(plain.mu1), np.asarray(feed.mu1))
    np.testing.assert_array_equal(
        np.asarray(plain.mu_prem), np.asarray(feed.mu_prem)
    )
    with pytest.raises(Exception, match="inv1_expense_ratio_annual"):
        Config(**base_config_dict(inv1_expense_ratio_annual=1.0))


def test_zero_vol_fee_closed_form():
    """Deterministic: 100% asset 1, mean 6%, fee 1% => the balance compounds
    at exactly (1.06 * 0.99)^(1/12) per month."""
    fee = 0.01
    cfg = make_config(**{
        **DETERMINISTIC,
        "initial_balance": 100_000.0,
        "monthly_expenses": 0.0,
        "retirement_years": 5,
        "allocation_inv1_pct": 1.0,
        "inv1_returns_mean": 0.06,
        "inv1_expense_ratio_annual": fee,
    })
    res = Engine(cfg).run(0, 2)
    expect = 100_000.0 * (1.06 * (1.0 - fee)) ** 5
    np.testing.assert_allclose(res.final_balance, expect, rtol=1e-9)
    # Asset 2: inflation x premium x (1-fee2).
    cfg2 = make_config(**{
        **DETERMINISTIC,
        "initial_balance": 100_000.0,
        "monthly_expenses": 0.0,
        "retirement_years": 5,
        "allocation_inv1_pct": 0.0,
        "inflation_rate_mean": 0.02,
        "inv2_premium_over_inflation_mean": 0.03,
        "inv2_expense_ratio_annual": 0.005,
    })
    res2 = Engine(cfg2).run(0, 2)
    expect2 = 100_000.0 * (1.02 * 1.03 * 0.995) ** 5
    np.testing.assert_allclose(res2.final_balance, expect2, rtol=1e-9)


def test_fee_oracle_differential_stochastic():
    import jax

    cfg = make_config(
        retirement_years=4,
        seed=88,
        inv1_returns_volatility=0.17,
        inv1_expense_ratio_annual=0.0075,
        inv2_expense_ratio_annual=0.002,
        inv1_use_realized_gains_tax_system=True,
        inv1_realized_gains_tax_rate=0.15,
        inflation_rate_volatility=0.02,
    )
    W, R, n = 14, 4, 8
    T = W + 12 * R
    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(88)
    outs = simulate_paths(
        params, jnp.int32(W), key, n_paths=n, t_scan=T,
        retirement_years=R, traj_len=0, dtype=jnp.float64,
    )
    shocks = np.stack([
        np.asarray(jax.random.normal(
            jax.random.fold_in(key, m), (n, 3), dtype=jnp.float64))
        for m in range(1, T + 1)
    ])
    for p in range(n):
        expected = simulate_path_oracle(cfg, W, shocks[:, p, :])
        assert bool(np.asarray(outs.success)[p]) == expected["success"]
        assert np.asarray(outs.final_balance)[p] == pytest.approx(
            expected["final_balance"], rel=1e-8, abs=1e-6
        )


def test_fee_sensitivity_ad_matches_fd_and_is_negative():
    from monte_carlo_retirement_tpu.engine.sensitivity import (
        sensitivity_ad,
        sensitivity_fd,
    )

    cfg = make_config(
        retirement_years=6,
        initial_balance=300_000.0,
        monthly_expenses=1_500.0,
        inv1_returns_volatility=0.15,
        inv1_expense_ratio_annual=0.005,
        num_simulations_main=128,
    )
    out = sensitivity_ad(
        cfg, working_months=12, params=["inv1_expense_ratio_annual"],
        num_paths=256,
    )
    g_ad = out["d_mean_final"]["inv1_expense_ratio_annual"]
    assert np.isfinite(g_ad) and g_ad < 0.0
    rows = sensitivity_fd(
        cfg, working_months=12, params=["inv1_expense_ratio_annual"],
        num_paths=256,
    )
    g_fd = rows[0].d_mean_final
    # CRN FD and AD measure the same smooth derivative.
    assert g_fd == pytest.approx(g_ad, rel=0.05)


def test_fee_lowers_success_monotonically():
    common = dict(
        initial_balance=450_000.0,
        monthly_expenses=2_200.0,
        retirement_years=25,
        inv1_returns_mean=0.07,
        inv1_returns_volatility=0.15,
        inflation_rate_mean=0.03,
        inflation_rate_volatility=0.012,
        seed=31,
    )
    probs = [
        Engine(make_config(inv1_expense_ratio_annual=f,
                           inv2_expense_ratio_annual=f, **common))
        .run(0, 500).success_probability
        for f in (0.0, 0.01, 0.02)
    ]
    # CRN across fees (same seed => same base draws): strictly ordered.
    assert probs[0] > probs[1] > probs[2]


def test_fee_optimizer_accepts_field():
    from monte_carlo_retirement_tpu.engine.optimize import optimize_params

    cfg = make_config(retirement_years=6, num_simulations_main=64)
    res = optimize_params(
        cfg, working_months=0,
        params=["inv1_expense_ratio_annual"],
        bounds=[(0.0, 0.02)],
        points=3, rounds=1, num_paths=64,
    )
    assert 0.0 <= res.best.values[0] <= 0.02
