"""Randomized differential testing: compiled engine vs the NumPy oracle.

Random scenarios (taxes, streams, correlations, partial years) are run
through the scan kernel (float64) and through tests/oracle.py with the same
shock draws; per-path outcomes must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.ops.shocks import mortality_uniform, stream_keys
from monte_carlo_retirement_tpu.timing import expected_trajectory_length
from tests.conftest import make_config
from tests.oracle import simulate_path_oracle
from tests.test_crashes import _jump_draws_np

N_PATHS = 16


def _random_config(rng: np.random.Generator, extensions: bool = True):
    """Random scenario. ``extensions=False`` (the reference head-to-head
    suite) drops the glide/guardrail extension fields the reference cannot
    simulate — the rng draws still happen, so both suites explore the same
    base-scenario sequence."""
    n_streams = int(rng.integers(0, 3))
    streams = []
    for s in range(n_streams):
        streams.append(
            {
                "name": f"s{s}",
                "monthly_amount_today": float(rng.uniform(0, 3000)),
                "start_at_age": float(rng.uniform(40, 70)),
                "duration_years": (
                    None if rng.random() < 0.5 else int(rng.integers(0, 15))
                ),
                "inflation_indexed": bool(rng.random() < 0.5),
                "tax_rate": float(rng.uniform(0, 0.4)),
            }
        )
    use_real1 = bool(rng.random() < 0.5)
    use_real2 = bool(rng.random() < 0.5)
    glide = None if rng.random() < 0.5 else float(rng.uniform(0, 1))
    guardrails = (
        None if rng.random() < 0.67 else {
            "upper_wr_pct": float(rng.uniform(4.0, 12.0)),
            "lower_wr_pct": float(rng.uniform(0.5, 3.5)),
            "adjustment_pct": float(rng.uniform(5.0, 20.0)),
            "floor_pct": float(rng.uniform(30.0, 80.0)),
            "cap_pct": float(rng.uniform(120.0, 250.0)),
        }
    )
    crashes = (
        None if rng.random() < 0.67 else {
            "frequency_per_year": float(rng.uniform(0.1, 4.0)),
            "mean_drop_pct": float(rng.uniform(5.0, 50.0)),
            "size_volatility": float(rng.uniform(0.0, 0.6)),
            "inv2_beta": float(rng.uniform(0.0, 1.0)),
        }
    )
    current_age = float(rng.uniform(30, 55))
    # Longevity in a third of the scenarios, with modes biased low relative
    # to the (short fuzz) horizon so in-horizon deaths actually occur.
    longevity = (
        None if rng.random() < 0.67 else {
            "mode_age": float(current_age + rng.uniform(-3.0, 15.0)),
            "dispersion_years": float(rng.uniform(2.0, 15.0)),
            "max_age": float(current_age + rng.uniform(16.0, 50.0)),
        }
    )
    fee1 = 0.0 if rng.random() < 0.5 else float(rng.uniform(0.0, 0.02))
    fee2 = 0.0 if rng.random() < 0.5 else float(rng.uniform(0.0, 0.02))
    if not extensions:
        glide = None
        guardrails = None
        crashes = None
        longevity = None
        fee1 = fee2 = 0.0
    return make_config(
        inv1_expense_ratio_annual=fee1,
        inv2_expense_ratio_annual=fee2,
        initial_balance=float(rng.uniform(0, 400_000)),
        monthly_contribution=float(rng.uniform(0, 6000)),
        contribution_growth_rate_annual=float(rng.uniform(0, 0.06)),
        monthly_expenses=float(rng.uniform(500, 6000)),
        current_age=current_age,
        retirement_years=int(rng.integers(1, 7)),
        allocation_inv1_pct=float(rng.uniform(0, 1)),
        # Extensions (oracle suites only; dropped for reference
        # head-to-heads): glide in half the scenarios, guardrails in a
        # third, with bands around plausible WRs so both triggers fire.
        allocation_inv1_final_pct=glide,
        spending_guardrails=guardrails,
        market_crashes=crashes,
        longevity=longevity,
        inv1_returns_mean=float(rng.uniform(-0.05, 0.15)),
        inv1_returns_volatility=float(rng.uniform(0, 0.25)),
        inv1_annual_tax_on_gains_rate=float(rng.uniform(0, 0.4)),
        inv1_realized_gains_tax_rate=float(rng.uniform(0, 0.3)),
        inv1_use_realized_gains_tax_system=use_real1,
        inv2_premium_over_inflation_mean=float(rng.uniform(-0.02, 0.08)),
        inv2_premium_over_inflation_volatility=float(rng.uniform(0, 0.05)),
        inv2_annual_tax_on_gains_rate=float(rng.uniform(0, 0.4)),
        inv2_realized_gains_tax_rate=float(rng.uniform(0, 0.3)),
        inv2_use_realized_gains_tax_system=use_real2,
        inflation_rate_mean=float(rng.uniform(-0.01, 0.09)),
        inflation_rate_volatility=float(rng.uniform(0, 0.04)),
        equity_inflation_correlation=float(rng.uniform(-1, 1)),
        other_income_streams=streams,
        seed=int(rng.integers(0, 2**31)),
    )


def run_differential_case(case_seed: int) -> None:
    """One engine-vs-oracle differential over a random scenario (all
    extensions in the mix). Raises AssertionError on the first per-path
    disagreement. Shared by the CI cases below and the standalone
    re-certification campaign (scripts/oracle_fuzz_campaign.py)."""
    rng = np.random.default_rng(case_seed)
    cfg = _random_config(rng)
    working_months = int(rng.integers(0, 40))
    R = cfg.retirement_years
    T = working_months + 12 * R

    params = SimParams.from_config(cfg, dtype=jnp.float64)
    jumps = cfg.market_crashes is not None
    mortality = cfg.longevity is not None
    _, key = stream_keys(cfg.seed)
    outs = simulate_paths(
        params,
        jnp.int32(working_months),
        key,
        n_paths=N_PATHS,
        t_scan=T,
        retirement_years=R,
        traj_len=0,
        dtype=jnp.float64,
        jumps=jumps,
        mortality=mortality,
    )

    # The exact same raw draws the kernel consumed, per path.
    shocks = np.stack(
        [
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, m), (N_PATHS, 3), dtype=jnp.float64
                )
            )
            for m in range(1, T + 1)
        ]
    )  # (T, N_PATHS, 3)

    jd = _jump_draws_np(key, T, N_PATHS) if jumps else None
    mu = (
        np.asarray(mortality_uniform(key, N_PATHS, jnp.float64))
        if mortality else None
    )
    succ = np.asarray(outs.success)
    final = np.asarray(outs.final_balance)
    for p in range(N_PATHS):
        expected = simulate_path_oracle(
            cfg, working_months, shocks[:, p, :],
            jump_shocks=None if jd is None else jd[:, p, :],
            mort_u=None if mu is None else float(mu[p]),
        )
        assert bool(succ[p]) == expected["success"], (
            f"seed {case_seed} path {p}: engine={bool(succ[p])} "
            f"oracle={expected['success']} (W={working_months})"
        )
        assert final[p] == pytest.approx(
            expected["final_balance"], rel=1e-8, abs=1e-6
        ), f"seed {case_seed} path {p}"


@pytest.mark.parametrize("case", range(10))
def test_engine_matches_oracle_on_random_scenarios(case):
    run_differential_case(1000 + case)


@pytest.mark.parametrize("case", range(8))
def test_engine_full_outputs_match_oracle(case):
    """Deeper check of the summary fields on a few scenarios."""
    rng = np.random.default_rng(2000 + case)
    cfg = _random_config(rng)
    working_months = int(rng.integers(0, 30))
    R = cfg.retirement_years
    T = working_months + 12 * R

    params = SimParams.from_config(cfg, dtype=jnp.float64)
    jumps = cfg.market_crashes is not None
    mortality = cfg.longevity is not None
    _, key = stream_keys(cfg.seed)
    L = expected_trajectory_length(working_months, R)
    outs = simulate_paths(
        params,
        jnp.int32(working_months),
        key,
        n_paths=N_PATHS,
        t_scan=T,
        retirement_years=R,
        traj_len=L,
        dtype=jnp.float64,
        jumps=jumps,
        mortality=mortality,
    )
    shocks = np.stack(
        [
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, m), (N_PATHS, 3), dtype=jnp.float64
                )
            )
            for m in range(1, T + 1)
        ]
    )
    jd = _jump_draws_np(key, T, N_PATHS) if jumps else None
    mu = (
        np.asarray(mortality_uniform(key, N_PATHS, jnp.float64))
        if mortality else None
    )
    for p in range(N_PATHS):
        expected = simulate_path_oracle(
            cfg, working_months, shocks[:, p, :],
            jump_shocks=None if jd is None else jd[:, p, :],
            mort_u=None if mu is None else float(mu[p]),
        )
        assert np.asarray(outs.start_balance)[p] == pytest.approx(
            expected["start_balance"], rel=1e-9, abs=1e-6
        )
        assert np.asarray(outs.inflation_at_retirement)[p] == pytest.approx(
            expected["inflation_at_retirement"], rel=1e-12
        )
        ytr_engine = float(np.asarray(outs.years_to_ruin)[p])
        if np.isnan(ytr_engine):
            assert np.isnan(expected["years_to_ruin"])
        else:
            assert ytr_engine == pytest.approx(expected["years_to_ruin"])
        assert np.asarray(outs.first_year_gross)[p] == pytest.approx(
            expected["first_year_gross"], rel=1e-8, abs=1e-6
        )
        assert np.asarray(outs.first_year_real_gross)[p] == pytest.approx(
            expected["first_year_real_gross"], rel=1e-8, abs=1e-6
        )
        # Yearly series: nominal trajectory, price levels, withdrawal rates.
        traj = np.asarray(outs.trajectory)[p][:L]
        np.testing.assert_allclose(
            traj, np.asarray(expected["trajectory"]), rtol=1e-8, atol=1e-6,
            err_msg=f"case {case} path {p} trajectory",
        )
        wr_engine = np.asarray(outs.withdrawal_rates)[p]
        wr_oracle = np.asarray(expected["withdrawal_rates"])
        np.testing.assert_array_equal(
            np.isnan(wr_engine), np.isnan(wr_oracle),
            err_msg=f"case {case} path {p} wr NaN pattern",
        )
        valid = ~np.isnan(wr_oracle)
        np.testing.assert_allclose(
            wr_engine[valid], wr_oracle[valid], rtol=1e-8, atol=1e-9,
            err_msg=f"case {case} path {p} withdrawal rates",
        )
        # Price levels only matter where the trajectory is recorded; compare
        # the real (deflated) series instead, which is what the API exports.
        price = np.asarray(outs.price_levels)[p][:L]
        real_engine = np.where(price > 1e-6, traj / np.maximum(price, 1e-6), 0.0)
        price_o = np.asarray(expected["price_levels"])
        traj_o = np.asarray(expected["trajectory"])
        real_oracle = np.where(price_o > 1e-6, traj_o / np.maximum(price_o, 1e-6), 0.0)
        np.testing.assert_allclose(
            real_engine, real_oracle, rtol=1e-8, atol=1e-6,
            err_msg=f"case {case} path {p} real trajectory",
        )


@pytest.mark.parametrize(
    "overrides,working_months",
    [
        (dict(allocation_inv1_pct=0.0), 7),     # single-asset (inv2 only)
        (dict(allocation_inv1_pct=1.0), 25),    # single-asset (inv1 only)
        (dict(initial_balance=0.0, monthly_contribution=0.0), 0),  # empty
        (dict(equity_inflation_correlation=-1.0,
              inflation_rate_mean=-0.005), 13), # deflation + perfect anticorr
    ],
)
def test_engine_matches_oracle_on_edge_scenarios(overrides, working_months):
    cfg = make_config(
        retirement_years=3,
        seed=4242,
        monthly_expenses=1_800.0,
        inv1_use_realized_gains_tax_system=True,
        inv1_realized_gains_tax_rate=0.15,
        inv2_annual_tax_on_gains_rate=0.2,
        inv2_use_realized_gains_tax_system=False,
        **overrides,
    )
    R = cfg.retirement_years
    T = working_months + 12 * R
    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(cfg.seed)
    outs = simulate_paths(
        params, jnp.int32(working_months), key,
        n_paths=N_PATHS, t_scan=T, retirement_years=R, traj_len=0,
        dtype=jnp.float64,
    )
    shocks = np.stack(
        [
            np.asarray(jax.random.normal(
                jax.random.fold_in(key, m), (N_PATHS, 3), dtype=jnp.float64))
            for m in range(1, T + 1)
        ]
    )
    for p in range(N_PATHS):
        expected = simulate_path_oracle(cfg, working_months, shocks[:, p, :])
        assert bool(np.asarray(outs.success)[p]) == expected["success"]
        assert np.asarray(outs.final_balance)[p] == pytest.approx(
            expected["final_balance"], rel=1e-8, abs=1e-6
        )
