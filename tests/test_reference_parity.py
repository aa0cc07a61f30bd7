"""Automated parity against the ACTUAL reference implementation.

The reference engine (/root/reference/backend, pure Python/NumPy) is imported
directly — with a stub for its `loguru` dependency — and run side-by-side
with this framework on the shipped scenario files:

  * exact trajectory-grid equality,
  * exact single-path equality on zero-volatility scenarios (the full
    semantic stack: taxes, rebalance, streams, ruin, partial years),
  * success-probability agreement within Monte Carlo error on config.json
    and jorge.json (the two engines use different RNGs — NumPy Philox vs
    threefry — so stochastic parity is statistical, not bitwise),
  * working-months search agreement on jorge.json.

These replace the manual spot checks previously recorded in docs/PARITY.md.
Reference entry points: backend/simulation.py:952-1128 (batch runner),
:1138-1343 (search), :99-123 (trajectory grid), :476-950 (single path).
"""

from __future__ import annotations

import json
import math
import os
import sys
import types

import numpy as np
import pytest

from monte_carlo_retirement_tpu.config import Config
from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.engine.simulator import (
    RetirementMonteCarloSimulator,
)
from monte_carlo_retirement_tpu.timing import trajectory_time_points
from tests.conftest import (
    DETERMINISTIC,
    binomial_sigma_pct as _binomial_sigma_pct,
    fake_success_frame,
    make_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BACKEND = "/root/reference/backend"
SEED = 2026


@pytest.fixture(scope="module")
def ref():
    """Import the reference engine with a silent loguru stand-in."""
    if not os.path.isdir(REF_BACKEND):
        pytest.skip("reference checkout not available")
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Silent:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Silent()
        sys.modules["loguru"] = loguru
    if REF_BACKEND not in sys.path:
        sys.path.append(REF_BACKEND)  # append: never shadow repo modules
    import config as ref_config  # noqa: F401  (reference module)
    import simulation as ref_simulation

    return ref_simulation, ref_config


def _scenario(name: str, **overrides) -> dict:
    data = json.load(open(os.path.join(REPO, name)))
    data["seed"] = SEED
    data["num_processes"] = 1
    data.update(overrides)
    return data


# ---------------------------------------------------------------------------
# Exact parity
# ---------------------------------------------------------------------------

def test_trajectory_grid_equals_reference(ref):
    ref_sim, _ = ref
    for months, years in [(0, 10), (13, 50), (233, 50), (75, 40), (12, 1)]:
        ours = trajectory_time_points(months, years)
        theirs = ref_sim.trajectory_time_points(months, years)
        assert len(ours) == len(theirs)
        np.testing.assert_allclose(ours, theirs, rtol=0, atol=1e-12)


_ZERO_VOL_CASES = {
    # Realized-gains taxes + rebalance + an inflation-indexed pension that
    # starts mid-retirement, with a partial working year (13 months).
    "realized_tax_stream": dict(
        working_months=13,
        overrides=dict(
            initial_balance=400_000.0,
            monthly_contribution=3_000.0,
            contribution_growth_rate_annual=0.03,
            monthly_expenses=3_500.0,
            current_age=55.0,
            retirement_years=10,
            allocation_inv1_pct=0.6,
            inv1_returns_mean=0.07,
            inv1_realized_gains_tax_rate=0.15,
            inv1_use_realized_gains_tax_system=True,
            inv2_premium_over_inflation_mean=0.01,
            inv2_realized_gains_tax_rate=0.10,
            inv2_use_realized_gains_tax_system=True,
            inflation_rate_mean=0.03,
            other_income_streams=[
                dict(
                    name="pension",
                    monthly_amount_today=1_200.0,
                    start_at_age=60.0,
                    duration_years=None,
                    inflation_indexed=True,
                    tax_rate=0.2,
                )
            ],
        ),
    ),
    # Annual mark-to-market taxes and a ruin mid-retirement (years-to-ruin
    # semantics + trajectory padding).
    "annual_tax_ruin": dict(
        working_months=0,
        overrides=dict(
            initial_balance=120_000.0,
            monthly_contribution=0.0,
            monthly_expenses=2_500.0,
            current_age=60.0,
            retirement_years=8,
            allocation_inv1_pct=0.5,
            inv1_returns_mean=0.04,
            inv1_annual_tax_on_gains_rate=0.25,
            inv1_use_realized_gains_tax_system=False,
            inv2_premium_over_inflation_mean=0.0,
            inv2_annual_tax_on_gains_rate=0.25,
            inv2_use_realized_gains_tax_system=False,
            inflation_rate_mean=0.02,
        ),
    ),
    # Nominal-locked stream + fractional start age (month-index rounding).
    "nominal_stream_fractional": dict(
        working_months=7,
        overrides=dict(
            initial_balance=250_000.0,
            monthly_contribution=1_000.0,
            monthly_expenses=2_000.0,
            current_age=60.0,
            retirement_years=6,
            allocation_inv1_pct=0.7,
            inv1_returns_mean=0.05,
            inflation_rate_mean=0.04,
            other_income_streams=[
                dict(
                    name="annuity",
                    monthly_amount_today=800.0,
                    start_at_age=61.2,
                    duration_years=3,
                    inflation_indexed=False,
                    tax_rate=0.1,
                )
            ],
        ),
    ),
}


@pytest.mark.parametrize("case", sorted(_ZERO_VOL_CASES))
def test_zero_vol_single_path_equals_reference(ref, case):
    """With all volatilities zero the path is deterministic, so the two
    engines must agree to float64 round-off on every reported field."""
    ref_sim_mod, ref_cfg_mod = ref
    spec = _ZERO_VOL_CASES[case]
    overrides = dict(DETERMINISTIC)
    overrides.update(spec["overrides"])
    base = make_config(**overrides).model_dump(by_alias=True)
    base["seed"] = SEED
    base["num_processes"] = 1

    theirs_sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**base)
    )
    theirs_sim.use_final_seeds()
    theirs = theirs_sim._run_single_simulation_path(
        spec["working_months"], theirs_sim._path_seeds(1)[0]
    )

    ours = Engine(Config(**base)).run_path(spec["working_months"])

    assert ours["Success"] == theirs["Success"]
    np.testing.assert_allclose(
        ours["Final Balance"], theirs["Final Balance"], rtol=1e-8, atol=1e-6
    )
    np.testing.assert_allclose(
        ours["YearsToRuin"], theirs["YearsToRuin"], rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        ours["First Year Gross Withdrawal"],
        theirs["First Year Gross Withdrawal"],
        rtol=1e-8,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        ours["First Year Real Gross Withdrawal"],
        theirs["First Year Real Gross Withdrawal"],
        rtol=1e-8,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        ours["Trajectory"], theirs["Trajectory"], rtol=1e-8, atol=1e-6
    )
    np.testing.assert_allclose(
        ours["RealTrajectory"], theirs["RealTrajectory"], rtol=1e-8, atol=1e-6
    )


# ---------------------------------------------------------------------------
# Statistical parity (different RNGs — agreement within Monte Carlo error)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "scenario,months,ref_paths,our_paths",
    [("config.json", 233, 1200, 10_000), ("jorge.json", 75, 1200, 10_000)],
)
def test_success_probability_parity(ref, scenario, months, ref_paths, our_paths):
    ref_sim_mod, ref_cfg_mod = ref
    data = _scenario(scenario)

    theirs_sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**data)
    )
    theirs_sim.use_final_seeds()
    df, *_ = theirs_sim.run_monte_carlo_simulations(months, ref_paths)
    p_ref = theirs_sim._success_probability(df)

    res = Engine(Config(**data)).run(months, our_paths, stream="final")
    p_ours = float(np.mean(np.asarray(res.success))) * 100.0

    sigma = math.hypot(
        _binomial_sigma_pct(p_ref, ref_paths),
        _binomial_sigma_pct(p_ours, our_paths),
    )
    # 4-sigma two-engine bound (plus a small absolute floor for the p->1 edge
    # where the binomial sigma underestimates).
    tol = max(4.0 * sigma, 0.35)
    assert abs(p_ref - p_ours) <= tol, (
        f"{scenario}@{months}: reference {p_ref:.2f}% vs ours {p_ours:.2f}% "
        f"(tol {tol:.2f}%)"
    )


def test_search_months_parity_jorge(ref):
    """Both searches on jorge.json (100 paths/probe) must land in the same
    statistical neighbourhood. The reference's own verification margin at
    n=100 is 15 percentage points, so month answers can legitimately differ;
    we bound the disagreement by two ladder steps."""
    ref_sim_mod, ref_cfg_mod = ref
    data = _scenario("jorge.json")

    theirs_sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**data)
    )
    m_ref, p_ref, _curve = theirs_sim.find_minimum_working_months(verbose=False)

    sim = RetirementMonteCarloSimulator(Config(**data))
    m_ours, p_ours, _curve2 = sim.find_minimum_working_months(verbose=False)

    assert m_ref > 0 and m_ours > 0
    assert abs(m_ref - m_ours) <= 24, (m_ref, p_ref, m_ours, p_ours)
    # Both answers meet the target minus the reference's own 3-sigma margin.
    target = data["target_probability"]
    margin = min(100.0, 150.0 / math.sqrt(data["num_simulations_search"]))
    assert p_ref >= target - margin
    assert p_ours >= target - margin


def _import_reference_build_result():
    """Import the reference server module with stubs for its web deps
    (fastapi/uvicorn/starlette aren't installed; only _build_result and the
    pydantic response models are needed)."""
    if "fastapi" not in sys.modules:
        fastapi = types.ModuleType("fastapi")

        class _FakeApp:
            def __init__(self, *a, **k):
                pass

            def add_middleware(self, *a, **k):
                pass

            def _deco(self, *a, **k):
                return lambda fn: fn

            get = post = put = delete = _deco

        class _HTTPException(Exception):
            def __init__(self, status_code=500, detail=""):
                super().__init__(detail)
                self.status_code = status_code
                self.detail = detail

        fastapi.FastAPI = _FakeApp
        fastapi.HTTPException = _HTTPException
        cors = types.ModuleType("fastapi.middleware.cors")
        cors.CORSMiddleware = object
        middleware = types.ModuleType("fastapi.middleware")
        middleware.cors = cors
        fastapi.middleware = middleware
        sys.modules["fastapi"] = fastapi
        sys.modules["fastapi.middleware"] = middleware
        sys.modules["fastapi.middleware.cors"] = cors
        uvicorn = types.ModuleType("uvicorn")
        uvicorn.run = lambda *a, **k: None
        sys.modules["uvicorn"] = uvicorn
        starlette_resp = types.ModuleType("starlette.responses")

        class _SR:  # StreamingResponse stand-in
            def __init__(self, *a, **k):
                pass

        starlette_resp.StreamingResponse = _SR
        starlette = types.ModuleType("starlette")
        starlette.responses = starlette_resp
        sys.modules["starlette"] = starlette
        sys.modules["starlette.responses"] = starlette_resp
    import importlib

    return importlib.import_module("server")


def test_response_assembly_matches_reference_exactly(ref):
    """Feed the SAME fake engine output through the reference server's
    _build_result and this framework's build_result: the wire payloads must
    be deeply equal (modulo this framework's optional large-run extension
    keys, which are None/absent below the payload cap)."""
    del ref  # ensures the loguru stub + reference path are installed
    import pandas as pd

    from monte_carlo_retirement_tpu.hosts.payload import build_result

    ref_server = _import_reference_build_result()

    summary = pd.DataFrame(
        {
            "Start Balance": [250_000.0, 250_000.0, 250_000.0, 250_000.0],
            "Final Balance": [0.0, 812_345.678, 25_000.5, 1_234_567.89],
            "Success": [True, True, False, True],
            "YearsToRuin": [float("nan"), float("nan"), 3.25, float("nan")],
            "First Year Gross Withdrawal": [0.0, 12_000.0, 11_500.0, 12_500.0],
            "First Year Real Gross Withdrawal": [0.0, 11_800.0, 11_300.0, 12_100.0],
            "Inflation At Retirement": [1.0, 1.02, 1.01, 1.03],
        }
    )
    years = [0.0, 1.0, 13 / 12, 13 / 12 + 1, 13 / 12 + 2]
    pct_cols = [0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95]
    rng = np.random.default_rng(3)
    traj = pd.DataFrame(
        np.sort(rng.uniform(0, 1e6, (len(years), 7)), axis=1), columns=pct_cols
    )
    real = traj * 0.9
    wr = pd.DataFrame(
        np.sort(rng.uniform(1, 9, (2, 5)), axis=1),
        columns=[0.05, 0.25, 0.50, 0.75, 0.95],
    )
    wr.iloc[1, 0] = float("nan")
    samples = [[1.0, 2.0, 3.0, 4.0, 5.0]] * 3
    counts = [4, 3]

    class FakeSimulator:
        def run_monte_carlo_simulations(self, **_kwargs):
            return summary, traj, samples, wr, real, samples, counts

    curve = [
        {"working_months": 12, "working_years": 1.0, "probability": 55.0},
        {"working_months": 13, "working_years": 1.1, "probability": 97.5},
        {"working_months": 12, "working_years": 1.0, "probability": 56.0},
    ]

    overrides = dict(
        num_simulations_main=4,
        retirement_years=2,
        current_age=58.0,
        other_income_streams=[
            dict(
                name="pension",
                monthly_amount_today=900.0,
                start_at_age=60.0,
                duration_years=None,
                inflation_indexed=True,
                tax_rate=0.1,
            )
        ],
    )
    ours_cfg = make_config(**overrides)
    import config as ref_config_mod

    theirs_cfg = ref_config_mod.Config(**ours_cfg.model_dump(by_alias=True))

    ours = build_result(ours_cfg, FakeSimulator(), 13, search_curve=curve)
    theirs = ref_server._build_result(theirs_cfg, FakeSimulator(), 13, curve)

    # Drop this framework's large-run extension key (None below the cap).
    assert ours["ruin_histogram"].pop("year_counts") is None
    # Drop the additive estimate-uncertainty extension (binomial one-sigma
    # over the fake run's 4 paths) — the reference summary omits it.
    sigma = ours["summary"].pop("success_probability_sigma")
    assert sigma == pytest.approx(((3 / 4) * (1 / 4) / 4) ** 0.5 * 100.0,
                                  abs=5e-3)

    def norm(x):
        if isinstance(x, dict):
            return {k: norm(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [norm(v) for v in x]
        if isinstance(x, float):
            return round(x, 9)
        return x

    assert norm(ours) == norm(theirs)


# ---------------------------------------------------------------------------
# Injected-shock exact parity: the STOCHASTIC month stack head-to-head
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", range(8))
def test_injected_shocks_exact_vs_reference(ref, case):
    """Feed the reference engine the scan kernel's exact raw normal draws
    (monkeypatched ``_draw_shock_path``) and compare every per-path output
    field. Unlike the zero-volatility cases this exercises the full
    stochastic month stack — correlated shocks, capacity-limited
    withdrawals, ruin timing, trajectory padding, withdrawal-rate NaN
    semantics — directly against the reference with no oracle in between;
    tolerances cover only float64 op-ordering differences.
    Reference: backend/simulation.py:452-474 (shock draw), :476-950 (path).
    """
    import jax
    import jax.numpy as jnp

    from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
    from monte_carlo_retirement_tpu.models.retirement import SimParams
    from monte_carlo_retirement_tpu.ops.shocks import stream_keys
    from monte_carlo_retirement_tpu.timing import expected_trajectory_length
    from tests.test_fuzz_parity import _random_config

    ref_sim_mod, ref_cfg_mod = ref
    rng = np.random.default_rng(7000 + case)
    # Reference-compatible scenarios only: the reference cannot simulate the
    # glide/guardrail extensions (it ignores the unknown fields entirely).
    cfg = _random_config(rng, extensions=False)
    working_months = int(rng.integers(0, 40))
    R = cfg.retirement_years
    T = working_months + 12 * R
    n_paths = 8

    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(cfg.seed)
    L = expected_trajectory_length(working_months, R)
    outs = simulate_paths(
        params,
        jnp.int32(working_months),
        key,
        n_paths=n_paths,
        t_scan=T,
        retirement_years=R,
        traj_len=L,
        dtype=jnp.float64,
    )
    # The exact same raw draws the kernel consumed: (T, n_paths, 3) of
    # independent normals (z_equity, z_independent, z_premium).
    raw = np.stack(
        [
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, m), (n_paths, 3),
                    dtype=jnp.float64,
                )
            )
            for m in range(1, T + 1)
        ]
    )

    base = cfg.model_dump(by_alias=True)
    base["num_processes"] = 1
    sim = ref_sim_mod.RetirementMonteCarloSimulator(ref_cfg_mod.Config(**base))
    rho = float(cfg.equity_inflation_correlation)
    rho_c = math.sqrt(max(0.0, 1.0 - rho * rho))

    for p in range(n_paths):
        z = raw[:, p, :]

        def draw(n_months, path_seed, z=z):
            # Same correlation construction the reference applies on draw
            # (simulation.py:458-466), on OUR raw normals.
            assert n_months <= T
            z_eq = z[:n_months, 0]
            z_inf = rho * z_eq + rho_c * z[:n_months, 1]
            return np.column_stack((z_eq, z_inf, z[:n_months, 2]))

        sim._draw_shock_path = draw
        theirs = sim._run_single_simulation_path(working_months, 0)
        msg = f"case {case} path {p} (W={working_months}, R={R})"

        assert bool(np.asarray(outs.success)[p]) == theirs["Success"], msg
        np.testing.assert_allclose(
            max(0.0, float(np.asarray(outs.final_balance)[p])),
            theirs["Final Balance"], rtol=1e-8, atol=1e-6, err_msg=msg,
        )
        np.testing.assert_allclose(
            float(np.asarray(outs.start_balance)[p]),
            theirs["Start Balance"], rtol=1e-8, atol=1e-6, err_msg=msg,
        )
        np.testing.assert_allclose(
            float(np.asarray(outs.inflation_at_retirement)[p]),
            theirs["Inflation At Retirement"], rtol=1e-10, err_msg=msg,
        )
        ytr_ours = float(np.asarray(outs.years_to_ruin)[p])
        if math.isnan(theirs["YearsToRuin"]):
            assert math.isnan(ytr_ours), msg
        else:
            np.testing.assert_allclose(
                ytr_ours, theirs["YearsToRuin"], rtol=0, atol=1e-9,
                err_msg=msg,
            )
        np.testing.assert_allclose(
            float(np.asarray(outs.first_year_gross)[p]),
            theirs["First Year Gross Withdrawal"], rtol=1e-8, atol=1e-6,
            err_msg=msg,
        )
        np.testing.assert_allclose(
            float(np.asarray(outs.first_year_real_gross)[p]),
            theirs["First Year Real Gross Withdrawal"], rtol=1e-8, atol=1e-6,
            err_msg=msg,
        )

        assert len(theirs["Trajectory"]) == L, msg
        traj = np.asarray(outs.trajectory)[p][:L]
        np.testing.assert_allclose(
            traj, theirs["Trajectory"], rtol=1e-8, atol=1e-6, err_msg=msg,
        )
        np.testing.assert_allclose(
            np.where(
                np.asarray(outs.price_levels)[p][:L] > 1e-6,
                traj / np.maximum(np.asarray(outs.price_levels)[p][:L], 1e-6),
                0.0,
            ),
            theirs["RealTrajectory"], rtol=1e-8, atol=1e-6, err_msg=msg,
        )

        wr_ours = np.asarray(outs.withdrawal_rates)[p]
        wr_theirs = np.asarray(theirs["WithdrawalRateTrajectory"], dtype=float)
        assert wr_theirs.shape == wr_ours.shape, msg
        np.testing.assert_array_equal(
            np.isnan(wr_ours), np.isnan(wr_theirs), err_msg=msg + " wr NaNs"
        )
        valid = ~np.isnan(wr_theirs)
        np.testing.assert_allclose(
            wr_ours[valid], wr_theirs[valid], rtol=1e-7, atol=1e-8,
            err_msg=msg,
        )


# ---------------------------------------------------------------------------
# Search-algorithm differential: same deterministic curve -> same answer
# ---------------------------------------------------------------------------

def _quantized_monotone_curve(rng, start, target, n_sims):
    """A random nondecreasing prob(month) curve with a threshold m*, values
    quantized to the k/n grid both engines observe (success counts out of
    ``n_sims`` paths), and kept >=1pp clear of the target so quantization
    can never flip a month across it."""
    m_star = start + int(rng.integers(1, 300))
    n_plateaus = int(rng.integers(1, 5))
    below_edges = np.sort(rng.integers(start, m_star, size=n_plateaus))
    below_vals = np.sort(rng.uniform(0.0, target - 1.0, size=n_plateaus + 1))
    above_rate = rng.uniform(0.0, 0.05)
    above_base = rng.uniform(target + 1.0, min(target + 5.0, 100.0))

    def prob(m):
        if m >= m_star:
            p = min(100.0, above_base + above_rate * (m - m_star))
        else:
            p = below_vals[np.searchsorted(below_edges, m, side="right")]
        return round(p * n_sims / 100.0) / n_sims * 100.0

    return m_star, prob


@pytest.mark.parametrize("case", range(10))
def test_search_answer_equals_reference_on_monotone_curves(ref, case):
    """Drive the reference's bracket->bisect->verify search and this repo's
    ladder->verify search with the SAME deterministic monotone probability
    curve (injected through each engine's fake-simulator seam) and require
    the identical answer: on a monotone curve both algorithms provably sweep
    the full transition region, so both must return the exact threshold.
    Reference: backend/simulation.py:1138-1343 (search), the fake-engine
    seam mirrors the reference's own test pattern
    (tests/test_simulation_correctness.py:259-293)."""
    import pandas as pd

    from monte_carlo_retirement_tpu.search.driver import (
        find_minimum_working_months as our_search,
    )

    ref_sim_mod, ref_cfg_mod = ref
    rng = np.random.default_rng(8100 + case)
    start = int(rng.integers(0, 60))
    target = float(rng.uniform(50.0, 97.0))
    n_sims = 400
    m_star, prob = _quantized_monotone_curve(rng, start, target, n_sims)

    base = make_config(
        target_probability=target,
        starting_working_months_search=start,
        num_simulations_search=n_sims,
        seed=1,
    ).model_dump(by_alias=True)
    base["num_processes"] = 1
    theirs_sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**base)
    )

    def fake_run(working_months, num_simulations):
        k = round(prob(working_months) * num_simulations / 100.0)
        return fake_success_frame(k, num_simulations)

    theirs_sim.run_monte_carlo_simulations = fake_run
    m_ref, p_ref, _ = theirs_sim.find_minimum_working_months(verbose=False)

    m_ours, p_ours, _ = our_search(
        lambda months: [prob(m) for m in months],
        starting_working_months=start,
        target_probability_pct=target,
        sim_count=n_sims,
        verbose=False,
    )

    assert m_ref == m_star, f"case {case}: reference found {m_ref} != {m_star}"
    assert m_ours == m_star, f"case {case}: ours found {m_ours} != {m_star}"
    assert p_ours == pytest.approx(p_ref)


def test_search_unreachable_equals_reference(ref):
    """Both searches return the -1 sentinel (with the best probability seen)
    when the target is unreachable within the +70-year cap."""
    import pandas as pd

    from monte_carlo_retirement_tpu.search.driver import (
        find_minimum_working_months as our_search,
    )

    ref_sim_mod, ref_cfg_mod = ref
    prob = lambda m: 40.0 + min(9.0, m / 100.0)

    base = make_config(
        target_probability=95.0,
        starting_working_months_search=0,
        num_simulations_search=100,
        seed=1,
    ).model_dump(by_alias=True)
    base["num_processes"] = 1
    theirs_sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**base)
    )

    def fake_run(working_months, num_simulations):
        k = round(prob(working_months) * num_simulations / 100.0)
        return fake_success_frame(k, num_simulations)

    theirs_sim.run_monte_carlo_simulations = fake_run
    m_ref, p_ref, _ = theirs_sim.find_minimum_working_months(verbose=False)
    m_ours, p_ours, _ = our_search(
        lambda months: [prob(m) for m in months],
        starting_working_months=0,
        target_probability_pct=95.0,
        sim_count=100,
        verbose=False,
    )
    assert m_ref == -1 and m_ours == -1
    # "Best probability seen" is the max over each engine's own tested
    # months; the tested sets differ slightly near the +70y cap (our ladder
    # probes the cap month itself), so bound rather than equate it.
    assert p_ref < 95.0 and p_ours < 95.0
    assert abs(p_ours - p_ref) < 1.0


def test_funding_predicate_conditioning_regime(ref):
    """Pin the fuzz-campaign discovery (long trial 457, docs/PARITY.md
    §Funding-predicate conditioning): at ~$1e13 balances the reference's
    ABSOLUTE-epsilon funding predicates (simulation.py:429, :788) compare
    one-ulp round-off against 1e-6, so ruin TIMING is arithmetic-order
    chaos by its own semantics. The engines must still agree exactly on
    everything the predicate does not poison: the whole accumulation
    trajectory and the retirement-start state. Both report failure; the
    year they flag is deliberately NOT pinned (it flips with codegen/
    op-order), which is exactly why the fuzz harness skips paths above
    its $1e9 conditioning bound.
    """
    import math

    import jax
    import jax.numpy as jnp

    from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
    from monte_carlo_retirement_tpu.models.retirement import SimParams
    from monte_carlo_retirement_tpu.ops.shocks import stream_keys
    from monte_carlo_retirement_tpu.timing import expected_trajectory_length

    ref_sim_mod, ref_cfg_mod = ref
    # The exact trial-457 scenario (fuzz seed 54772, --long): 70 working
    # years of ~19% returns and ~15% inflation compound to a $16T start.
    cfg = make_config(
        initial_balance=1742277.67551259,
        monthly_contribution=5602.910923481522,
        contribution_growth_rate_annual=0.002312411474798033,
        monthly_expenses=8080.62264111494,
        current_age=69.6332689119508,
        retirement_years=11,
        allocation_inv1_pct=0.043214052778261514,
        inv1_returns_mean=0.19173717002537935,
        inv1_returns_volatility=0.011263527128595852,
        inv1_annual_tax_on_gains_rate=0.0028930873951657386,
        inv1_realized_gains_tax_rate=0.48370835685498503,
        inv1_use_realized_gains_tax_system=True,
        inv2_premium_over_inflation_mean=0.13894755370130002,
        inv2_premium_over_inflation_volatility=0.0,
        inv2_annual_tax_on_gains_rate=0.15444230320398217,
        inv2_realized_gains_tax_rate=0.40206134969964163,
        inv2_use_realized_gains_tax_system=False,
        inflation_rate_mean=0.14620175879936925,
        inflation_rate_volatility=0.0,
        equity_inflation_correlation=0.0,
        other_income_streams=[{
            "name": "s0",
            "monthly_amount_today": 0.0,
            "start_at_age": 66.05397466502797,
            "duration_years": 23,
            "inflation_indexed": True,
            "tax_rate": 0.46485204220037923,
        }],
        seed=68982147,
    )
    working_months, R, n_paths, p = 840, 11, 8, 4
    T = working_months + 12 * R

    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(cfg.seed)
    L = expected_trajectory_length(working_months, R)
    outs = simulate_paths(
        params, jnp.int32(working_months), key,
        n_paths=n_paths, t_scan=T, retirement_years=R, traj_len=L,
        dtype=jnp.float64,
    )
    raw = np.stack([
        np.asarray(jax.random.normal(
            jax.random.fold_in(key, m), (n_paths, 3), dtype=jnp.float64,
        ))
        for m in range(1, T + 1)
    ])

    base = cfg.model_dump(by_alias=True)
    base["num_processes"] = 1
    sim = ref_sim_mod.RetirementMonteCarloSimulator(
        ref_cfg_mod.Config(**base)
    )
    rho = float(cfg.equity_inflation_correlation)
    rho_c = math.sqrt(max(0.0, 1.0 - rho * rho))
    z = raw[:, p, :]

    def draw(n_months, path_seed, z=z):
        z_eq = z[:n_months, 0]
        return np.column_stack(
            (z_eq, rho * z_eq + rho_c * z[:n_months, 1], z[:n_months, 2])
        )

    sim._draw_shock_path = draw
    theirs = sim._run_single_simulation_path(working_months, 0)

    # The scenario genuinely sits above the harness's conditioning bound.
    start_ours = float(np.asarray(outs.start_balance)[p])
    assert start_ours > 1e12

    # In-domain agreement: retirement-start state + the full accumulation
    # trajectory (indices 0..70 = the 70 working years) match to f64
    # op-ordering round-off even at $1e13 scale.
    np.testing.assert_allclose(
        start_ours, theirs["Start Balance"], rtol=1e-10
    )
    np.testing.assert_allclose(
        float(np.asarray(outs.inflation_at_retirement)[p]),
        theirs["Inflation At Retirement"], rtol=1e-10,
    )
    traj_ours = np.asarray(outs.trajectory)[p]
    traj_ref = np.asarray(theirs["Trajectory"], dtype=float)
    n_working_years = 70  # full working years before the retirement point
    np.testing.assert_allclose(
        traj_ours[: n_working_years + 1], traj_ref[: n_working_years + 1],
        rtol=1e-8,
    )

    # Beyond the predicate's validity domain both engines flag failure —
    # the timing is round-off chaos and is NOT asserted.
    assert bool(np.asarray(outs.success)[p]) is False
    assert theirs["Success"] is False
    assert float(np.asarray(outs.years_to_ruin)[p]) <= R
    assert theirs["YearsToRuin"] <= R
