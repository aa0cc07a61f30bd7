"""Reduced (device-binned) serving path == pandas path, byte for byte.

The capped serving response can be assembled two ways: host-side from raw
per-path arrays (the reference's path) or from device-reduced aggregates
(ops/stats.serving_bins + hosts/payload._build_result_reduced). These tests
pin the two to identical wire output, and the binning helpers to the numpy
reference functions on adversarial data.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import make_config
from monte_carlo_retirement_tpu.engine.kernel import PathOutputs
from monte_carlo_retirement_tpu.engine.runner import HostBins
from monte_carlo_retirement_tpu.engine.simulator import (
    RetirementMonteCarloSimulator,
)
from monte_carlo_retirement_tpu.hosts.payload import (
    _binned_finals_from_device,
    _build_result_pandas,
    _ruin_counts_from_device,
    bin_successful_finals,
    bin_years_to_ruin,
    build_result,
)
from monte_carlo_retirement_tpu.hosts.schemas import SimulationResponse
from monte_carlo_retirement_tpu.ops.stats import serving_bins


def _bins_from_arrays(finals, success, ytr, r_years):
    """Run the on-device reduction on synthetic per-path arrays."""
    n = len(finals)
    outs = PathOutputs(
        success=jnp.asarray(success),
        final_balance=jnp.asarray(finals, dtype=jnp.float64),
        start_balance=jnp.full((n,), 100.0),
        years_to_ruin=jnp.asarray(ytr, dtype=jnp.float64),
        first_year_gross=jnp.full((n,), 1.0),
        first_year_real_gross=jnp.full((n,), 1.0),
        inflation_at_retirement=jnp.ones((n,)),
        trajectory=jnp.ones((n, 3)),
        price_levels=jnp.ones((n, 3)),
        withdrawal_rates=jnp.full((n, r_years), 1.0),
    )
    dev = serving_bins(outs)
    return HostBins(
        success_count=int(dev.success_count),
        finals_min_successful=float(dev.finals_min_successful),
        finals_max_successful=float(dev.finals_max_successful),
        finals_hist_counts=np.asarray(dev.finals_hist_counts),
        finals_median_successful=float(dev.finals_median_successful),
        ruin_counts=np.asarray(dev.ruin_counts),
        ruin_max=float(dev.ruin_max),
        failure_count=int(dev.failure_count),
    )


@pytest.mark.parametrize("case", ["random", "all_fail", "all_succeed",
                                  "constant", "integer_ruin_max"])
def test_device_bins_match_numpy_binning(case):
    rng = np.random.default_rng(hash(case) % 2**32)
    n, r_years = 300, 6
    if case == "all_fail":
        success = np.zeros(n, dtype=bool)
    elif case == "all_succeed":
        success = np.ones(n, dtype=bool)
    else:
        success = rng.random(n) < 0.7
    if case == "constant":
        finals = np.full(n, 12345.6789)
    else:
        finals = np.where(success, rng.uniform(0, 5e6, n), 0.0)
    ytr = np.full(n, np.nan)
    if case == "integer_ruin_max":
        fail_idx = np.flatnonzero(~success)
        vals = rng.uniform(0, r_years - 1, len(fail_idx))
        if len(fail_idx) >= 2:
            vals[0] = 4.0  # exact-integer maximum exercises the clamp
            vals[1:] = np.minimum(vals[1:], 3.9)
        ytr[fail_idx] = vals
    else:
        ytr[~success] = rng.uniform(0, r_years, (~success).sum())

    bins = _bins_from_arrays(finals, success, ytr, r_years)

    want_hist = bin_successful_finals(finals, success)
    got_hist = _binned_finals_from_device(bins, n)
    assert got_hist == want_hist

    failed = ytr[~np.isnan(ytr)]
    assert _ruin_counts_from_device(bins) == bin_years_to_ruin(failed)


_EQUALITY_SCENARIOS = {
    "plain": dict(
        num_simulations_main=64, retirement_years=8, seed=77,
        monthly_expenses=2_600.0,
    ),
    "streams_partial_year": dict(
        num_simulations_main=48, retirement_years=6, seed=13,
        monthly_expenses=3_100.0, current_age=44.3,
        other_income_streams=[
            {"name": "pension", "monthly_amount_today": 900.0,
             "start_at_age": 50, "inflation_indexed": True,
             "tax_rate": 0.1},
            {"name": "rent", "monthly_amount_today": 400.0,
             "start_at_age": 47, "duration_years": 4,
             "inflation_indexed": False, "tax_rate": 0.0},
        ],
    ),
    "realized_gains_tax": dict(
        num_simulations_main=56, retirement_years=7, seed=5,
        monthly_expenses=2_900.0,
        inv1_use_realized_gains_tax_system=True,
        inv1_realized_gains_tax_rate=0.2,
        inv2_use_realized_gains_tax_system=True,
        inv2_realized_gains_tax_rate=0.1,
    ),
    "annual_tax_heavy_failures": dict(
        num_simulations_main=64, retirement_years=9, seed=31,
        initial_balance=260_000.0, monthly_expenses=3_400.0,
        inv1_annual_tax_on_gains_rate=0.25,
        inv2_annual_tax_on_gains_rate=0.15,
        equity_inflation_correlation=-0.4,
    ),
}


@pytest.mark.parametrize("name", sorted(_EQUALITY_SCENARIOS))
@pytest.mark.parametrize("months", [0, 24, 31])
def test_reduced_build_result_equals_pandas_path(monkeypatch, name, months):
    """End to end on the real engine: the reduced assembly and the pandas
    assembly of the same capped run produce the same response dict —
    across tax systems, income streams, partial years and ruin-heavy
    scenarios."""
    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10")
    config = make_config(**_EQUALITY_SCENARIOS[name])
    sim = RetirementMonteCarloSimulator(config)
    sim.use_final_seeds()
    reduced = build_result(config, sim, required_w_months=months)
    SimulationResponse.model_validate(reduced)

    sim2 = RetirementMonteCarloSimulator(config)
    sim2.use_final_seeds()
    pandas_capped = _build_result_pandas(
        config, sim2, months, search_curve=None, capped=True
    )
    SimulationResponse.model_validate(pandas_capped)

    assert reduced == pandas_capped


def test_reduced_path_used_only_when_capped(monkeypatch):
    """Below the cap the response must keep raw arrays (reference format)."""
    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10000")
    config = make_config(num_simulations_main=16, retirement_years=3, seed=5)
    sim = RetirementMonteCarloSimulator(config)
    sim.use_final_seeds()
    result = build_result(config, sim, required_w_months=12)
    assert len(result["histogram"]["final_balances"]) == 16
    assert "binned" not in result["histogram"]


def test_include_raw_forces_reference_wire_format(monkeypatch):
    """include_raw=True overrides the cap: raw per-path arrays at any path
    count (reference React SPA compatibility); include_raw=False forces the
    bounded binned form even below the cap."""
    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10")
    config = make_config(num_simulations_main=32, retirement_years=3, seed=6)
    sim = RetirementMonteCarloSimulator(config)
    sim.use_final_seeds()
    raw = build_result(config, sim, required_w_months=12, include_raw=True)
    assert len(raw["histogram"]["final_balances"]) == 32
    assert raw["ruin_histogram"]["year_counts"] is None

    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10000")
    sim2 = RetirementMonteCarloSimulator(config)
    sim2.use_final_seeds()
    binned = build_result(config, sim2, required_w_months=12, include_raw=False)
    assert binned["histogram"]["final_balances"] == []
    assert binned["histogram"]["binned"] is not None or (
        binned["histogram"]["binned"] is None
        and binned["summary"]["success_probability"] == 0.0
    )


def test_reduced_median_nan_to_zero():
    """No successful paths: median_final_balance_successful must serialize
    as 0.0 (reference semantics), not NaN."""
    config = make_config(
        num_simulations_main=32, retirement_years=6, seed=9,
        initial_balance=1_000.0, monthly_expenses=50_000.0,
        monthly_contribution=0.0,
    )
    sim = RetirementMonteCarloSimulator(config)
    sim.use_final_seeds()
    result = build_result(config, sim, required_w_months=0, include_raw=False)
    assert result["summary"]["success_probability"] == 0.0
    assert result["summary"]["median_final_balance_successful"] == 0.0
    assert result["histogram"]["binned"] is None
    assert result["ruin_histogram"]["failure_count"] == 32
    assert not math.isnan(result["summary"]["median_start_balance"])
