"""Closed-form deterministic path tests (zero-volatility scenarios).

These reproduce the reference test suite's engine contracts
(reference: tests/test_simulation_correctness.py) against the compiled
scan kernel.
"""


import pytest

from monte_carlo_retirement_tpu.constants import SMALL_EPSILON
from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.engine.simulator import (
    RetirementMonteCarloSimulator,
    median_first_year_withdrawal_rate,
)
from monte_carlo_retirement_tpu.timing import trajectory_time_points
from tests.conftest import DETERMINISTIC, make_config


def test_partial_year_inflation_accrual():
    """With zero vol, inflation at retirement equals (1+mean)^(months/12)."""
    mean = 0.06
    cfg = make_config(
        **{**DETERMINISTIC, "inflation_rate_mean": mean},
        monthly_expenses=0.0,
        retirement_years=1,
        seed=7,
    )
    result = Engine(cfg).run_path(13)
    expected = (1.0 + mean) ** (13 / 12)
    assert result["Inflation At Retirement"] == pytest.approx(expected, abs=1e-9)
    points = trajectory_time_points(13, cfg.retirement_years)
    assert points == pytest.approx([0.0, 1.0, 13 / 12, 25 / 12])
    assert len(points) == len(result["Trajectory"])


def test_partial_year_trajectory_keeps_equal_retirement_balance():
    """Equal values at distinct timestamps must not shift retirement samples."""
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=100_000.0,
        monthly_expenses=1_000.0,
        retirement_years=1,
    )
    result = Engine(cfg).run_path(13)
    assert result["Trajectory"] == pytest.approx(
        [100_000.0, 100_000.0, 100_000.0, 88_000.0]
    )
    assert result["RealTrajectory"] == pytest.approx(result["Trajectory"])


def test_allocation_weights_conserve_every_dollar():
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=100_000.0,
        allocation_inv1_pct=0.333333,
        monthly_expenses=0.0,
        retirement_years=1,
    )
    result = Engine(cfg).run_path(0)
    assert result["Start Balance"] == pytest.approx(100_000.0)
    assert result["Trajectory"][0] == pytest.approx(100_000.0)


def test_years_to_ruin_and_real_trajectory():
    """$5k at $2k/mo fails mid-month-3; real == nominal at zero inflation."""
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=5_000.0,
        monthly_expenses=2_000.0,
        retirement_years=10,
        seed=9,
    )
    sim = RetirementMonteCarloSimulator(cfg)
    result = sim._run_single_simulation_path(0, path_seed=1)
    assert result["Success"] is False
    assert result["YearsToRuin"] == pytest.approx(3 / 12)
    assert len(result["RealTrajectory"]) == len(result["Trajectory"])
    for nom, real in zip(result["Trajectory"], result["RealTrajectory"]):
        assert real == pytest.approx(nom, abs=1e-6)

    summary, traj, _, _, real_traj, _, wr_counts = sim.run_monte_carlo_simulations(0, 20)
    assert (~summary["Success"]).all()
    assert summary["YearsToRuin"].notna().all()
    assert traj is not None and real_traj is not None
    assert len(real_traj) == len(traj)
    assert wr_counts == [0] * cfg.retirement_years


def test_failed_path_trajectory_padding_and_ruin_value():
    """Failed paths record the at-failure balance for the failure year and
    pad the remaining retirement years with zero."""
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=5_000.0,
        monthly_expenses=2_000.0,
        retirement_years=4,
        seed=9,
    )
    result = Engine(cfg).run_path(0)
    traj = result["Trajectory"]
    assert len(traj) == 5  # 1 + 0 working years + 4 retirement years
    assert traj[0] == pytest.approx(5_000.0)
    assert traj[1] == pytest.approx(0.0, abs=1e-6)  # died in year 0
    assert traj[2:] == pytest.approx([0.0, 0.0, 0.0])
    # First-year withdrawals are still captured in the failed year
    assert result["First Year Gross Withdrawal"] == pytest.approx(5_000.0)


def test_withdrawal_rate_with_zero_inflation():
    """Zero inflation, no income: SWR == annual expenses / start balance."""
    monthly_expenses, initial = 1_000.0, 200_000.0
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=initial,
        monthly_expenses=monthly_expenses,
        retirement_years=5,
        seed=1,
        num_simulations_main=20,
    )
    sim = RetirementMonteCarloSimulator(cfg)
    sim.use_final_seeds()
    summary, _, _, _, _, _, _ = sim.run_monte_carlo_simulations(0, 20)

    annual = monthly_expenses * 12
    expected = (annual / initial) * 100.0
    swr = median_first_year_withdrawal_rate(summary)
    assert swr == pytest.approx(expected, abs=0.5)
    for _, row in summary.iterrows():
        if row["Start Balance"] > SMALL_EPSILON:
            assert abs(row["First Year Gross Withdrawal"] - annual) < 1.0


def test_withdrawal_rate_trajectory_matches_first_year():
    """Year-0 real WR equals First Year Gross Withdrawal / Start Balance."""
    cfg = make_config(
        **DETERMINISTIC,
        initial_balance=200_000.0,
        monthly_expenses=1_000.0,
        retirement_years=5,
        seed=1,
    )
    sim = RetirementMonteCarloSimulator(cfg)
    result = sim._run_single_simulation_path(0, path_seed=1)
    wr = result["WithdrawalRateTrajectory"]
    assert len(wr) == 5
    expected = (
        result["First Year Gross Withdrawal"] / result["Start Balance"]
    ) * 100.0
    assert wr[0] == pytest.approx(expected, abs=1e-6)
    assert wr[1] == pytest.approx(wr[0], abs=1e-6)

    summary, _, _, wr_pct, _, _, wr_counts = sim.run_monte_carlo_simulations(0, 10)
    assert wr_pct is not None and not wr_pct.empty
    assert wr_counts == [10] * cfg.retirement_years
    assert abs(wr_pct.iloc[0][0.50] - expected) < 0.5
    swr = median_first_year_withdrawal_rate(summary)
    assert abs(swr - wr_pct.iloc[0][0.50]) < 0.5


def test_real_withdrawal_rate_flat_with_deterministic_inflation():
    """Constant real spending keeps the real WR flat while inflation compounds."""
    cfg = make_config(
        **{**DETERMINISTIC, "inflation_rate_mean": 0.06, "inv1_returns_mean": 0.06},
        initial_balance=240_000.0,
        monthly_expenses=1_000.0,
        retirement_years=8,
        seed=2,
    )
    result = Engine(cfg).run_path(0)
    assert result["Success"] is True
    wr = result["WithdrawalRateTrajectory"]
    for rate in wr:
        assert rate == pytest.approx(wr[0], abs=1e-4)
    assert wr[0] == pytest.approx(5.0, abs=0.05)


def test_income_stream_starts_at_eligibility_age():
    """Pension eligible at 65 pays nothing before age 65."""
    cfg = make_config(
        **DETERMINISTIC,
        current_age=40.0,
        initial_balance=80_000.0,
        monthly_expenses=1_000.0,
        retirement_years=10,
        other_income_streams=[
            {
                "name": "Pension",
                "monthly_amount_today": 1000.0,
                "start_at_age": 65.0,
                "duration_years": None,
                "inflation_indexed": True,
                "tax_rate": 0.0,
            }
        ],
        seed=1,
    )
    result = Engine(cfg).run_path(240)  # retire at 60, pension at 65
    # $80k covers ages 60-65 (60 months x $1k + $20k spare); pension covers after.
    assert result["Success"] is True
    assert result["Final Balance"] > 0

    cfg_no = cfg.model_copy(update={"other_income_streams": []})
    result_no = Engine(cfg_no).run_path(240)
    assert result["Final Balance"] > result_no["Final Balance"]


def test_income_stream_fractional_age_starts_on_correct_month():
    """A pension at age 60.5 starts in retirement month 7, not a year boundary."""
    cfg = make_config(
        **DETERMINISTIC,
        current_age=60.0,
        initial_balance=6_000.0,  # exactly funds the first six months
        monthly_expenses=1_000.0,
        retirement_years=2,
        other_income_streams=[
            {
                "name": "Midyear pension",
                "monthly_amount_today": 1_000.0,
                "start_at_age": 60.5,
                "duration_years": None,
                "inflation_indexed": True,
                "tax_rate": 0.0,
            }
        ],
        seed=3,
    )
    result = Engine(cfg).run_path(0)
    assert result["Success"] is True
    assert result["Final Balance"] == pytest.approx(0.0, abs=1e-6)
    assert result["First Year Gross Withdrawal"] == pytest.approx(6_000.0)


def test_pension_covers_after_portfolio_depleted():
    """Success is 'funded all spending', not 'Final Balance > 0'."""
    cfg = make_config(
        **DETERMINISTIC,
        current_age=60.0,
        initial_balance=12_000.0,
        monthly_expenses=1_000.0,
        retirement_years=10,
        other_income_streams=[
            {
                "name": "Pension",
                "monthly_amount_today": 1_000.0,
                "start_at_age": 61.0,
                "duration_years": None,
                "inflation_indexed": True,
                "tax_rate": 0.0,
            }
        ],
        seed=1,
    )
    sim = RetirementMonteCarloSimulator(cfg)
    result = sim._run_single_simulation_path(0, path_seed=1)
    assert result["Success"] is True
    assert result["Final Balance"] == pytest.approx(0.0, abs=1e-6)

    cfg_no = cfg.model_copy(update={"other_income_streams": []})
    result_no = RetirementMonteCarloSimulator(cfg_no)._run_single_simulation_path(
        0, path_seed=1
    )
    assert result_no["Success"] is False

    sim.use_final_seeds()
    summary, _, _, _, _, _, _ = sim.run_monte_carlo_simulations(0, 5)
    assert sim._success_probability(summary) == pytest.approx(100.0)
    assert (summary["Final Balance"] <= SMALL_EPSILON).all()


def test_non_indexed_stream_freezes_nominal_at_start():
    """A non-indexed stream pays a fixed nominal from its start date."""
    infl = 0.06
    cfg = make_config(
        **{**DETERMINISTIC, "inflation_rate_mean": infl},
        current_age=60.0,
        initial_balance=1_000_000.0,
        monthly_expenses=0.0,
        retirement_years=3,
        other_income_streams=[
            {
                "name": "Fixed annuity",
                "monthly_amount_today": 1_000.0,
                "start_at_age": 61.0,
                "duration_years": 1,
                "inflation_indexed": False,
                "tax_rate": 0.0,
            }
        ],
        seed=3,
    )
    # With zero expenses, income doesn't change balances; this only checks
    # the engine runs with non-indexed streams and never fails.
    result = Engine(cfg).run_path(0)
    assert result["Success"] is True


def test_annual_tax_excludes_internal_rebalancing_transfers():
    """A zero-return asset owes no annual tax on transfers received."""
    common = dict(
        initial_balance=100_000.0,
        monthly_contribution=0.0,
        monthly_expenses=0.0,
        retirement_years=1,
        allocation_inv1_pct=0.50,
        inv1_returns_mean=0.0,
        inv1_returns_volatility=0.0,
        inv1_use_realized_gains_tax_system=False,
        inv1_realized_gains_tax_rate=0.0,
        inv2_premium_over_inflation_mean=1.0,
        inv2_premium_over_inflation_volatility=0.0,
        inv2_use_realized_gains_tax_system=True,
        inv2_realized_gains_tax_rate=0.0,
        inflation_rate_mean=0.0,
        inflation_rate_volatility=0.0,
        seed=11,
    )
    no_tax = make_config(**common, inv1_annual_tax_on_gains_rate=0.0)
    full_tax = make_config(**common, inv1_annual_tax_on_gains_rate=1.0)

    r_no = Engine(no_tax).run_path(12)
    r_full = Engine(full_tax).run_path(12)
    # Inv1 earned 0%; the monthly transfers into it came from Inv2 gains and
    # must not be taxed as Inv1 gains.
    assert r_full["Start Balance"] == pytest.approx(r_no["Start Balance"], rel=1e-10)
    assert r_full["Final Balance"] == pytest.approx(r_no["Final Balance"], rel=1e-10)


def test_retirement_does_not_split_annual_tax_period():
    """A partial working year stays in the same absolute 12-month tax period."""
    cfg = make_config(
        initial_balance=100.0,
        monthly_contribution=0.0,
        monthly_expenses=0.0,
        retirement_years=1,
        allocation_inv1_pct=1.0,
        inv1_returns_mean=0.12,
        inv1_returns_volatility=0.0,
        inv1_use_realized_gains_tax_system=False,
        inv1_annual_tax_on_gains_rate=0.50,
        inv2_premium_over_inflation_mean=0.0,
        inv2_premium_over_inflation_volatility=0.0,
        inv2_use_realized_gains_tax_system=False,
        inv2_annual_tax_on_gains_rate=0.0,
        inflation_rate_mean=0.0,
        inflation_rate_volatility=0.0,
        seed=12,
    )
    result = Engine(cfg).run_path(13)
    monthly_gross = 1.12 ** (1 / 12)
    after_month_12_tax = 112.0 - (112.0 - 100.0) * 0.50
    assert result["Start Balance"] == pytest.approx(
        after_month_12_tax * monthly_gross, rel=1e-10
    )


def test_final_partial_tax_period_settles_terminal_wealth():
    """Terminal wealth is net of the accrued liability of a trailing partial
    tax year (W=13, R=1 ends at absolute month 25)."""
    cfg = make_config(
        initial_balance=100.0,
        monthly_contribution=0.0,
        monthly_expenses=0.0,
        retirement_years=1,
        allocation_inv1_pct=1.0,
        inv1_returns_mean=0.12,
        inv1_returns_volatility=0.0,
        inv1_use_realized_gains_tax_system=False,
        inv1_annual_tax_on_gains_rate=0.50,
        inv2_premium_over_inflation_mean=0.0,
        inv2_premium_over_inflation_volatility=0.0,
        inv2_use_realized_gains_tax_system=False,
        inv2_annual_tax_on_gains_rate=0.0,
        inflation_rate_mean=0.0,
        inflation_rate_volatility=0.0,
        seed=12,
    )
    result = Engine(cfg).run_path(13)
    g = 1.12 ** (1 / 12)
    # Months 1-12: grow to 112, tax 6 -> 106 (basis: 100 - 100*(6/112)).
    bal_12 = 106.0
    basis_12 = 100.0 - 100.0 * (6.0 / 112.0)
    # Months 13-24: grow to 106*1.12; tax at m=24 on accrued market gain.
    bal_24_pre = bal_12 * 1.12
    gain = bal_24_pre - bal_12
    tax_24 = gain * 0.50
    bal_24 = bal_24_pre - tax_24
    # Month 25: one more month of growth, then the final settle taxes the
    # single month's accrued gain.
    bal_25_pre = bal_24 * g
    settle_tax = (bal_25_pre - bal_24) * 0.50
    expected_final = bal_25_pre - settle_tax
    assert result["Final Balance"] == pytest.approx(expected_final, rel=1e-9)
    # The last trajectory sample reflects the settled value.
    assert result["Trajectory"][-1] == pytest.approx(expected_final, rel=1e-9)
