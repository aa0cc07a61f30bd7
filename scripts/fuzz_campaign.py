"""Extended differential fuzz campaign vs the ACTUAL reference engine.

Runs the injected-shock exact differential (the same head-to-head harness as
tests/test_reference_parity.py::test_injected_shocks_exact_vs_reference) over
a much WIDER randomized scenario space and many more trials than CI affords:
the reference engine consumes the scan kernel's exact raw normal draws, and
every per-path output field must agree to float64 op-ordering round-off.

Wider than the CI test in: working months (up to 10 years), retirement years
(up to 15), stream count (up to 4), parameter extremes (zero balances, zero
expenses, +-1 correlation, 60% tax rates, negative means).

Usage:  python scripts/fuzz_campaign.py [--trials N] [--seed S] [--long]
        (--long swaps in multi-decade working-month horizons up to the
        search cap region; slower per trial)
Exit status 0 = every trial agreed; 1 = at least one mismatch (printed).

Reference: /root/reference/backend/simulation.py:452-474 (shock draw),
:476-950 (single path).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from monte_carlo_retirement_tpu.engine.kernel import simulate_paths  # noqa: E402
from monte_carlo_retirement_tpu.engine.runner import (  # noqa: E402
    enable_persistent_compilation_cache,
)
from monte_carlo_retirement_tpu.models.retirement import SimParams  # noqa: E402
from monte_carlo_retirement_tpu.ops.shocks import stream_keys  # noqa: E402
from monte_carlo_retirement_tpu.timing import (  # noqa: E402
    expected_trajectory_length,
)
from tests.conftest import make_config  # noqa: E402

REF_BACKEND = "/root/reference/backend"

# Discrete W/R grids bound the number of distinct compiled shapes while the
# traced SimParams leaves explore the continuous space freely.
W_CHOICES = [0, 1, 5, 12, 13, 26, 40, 61, 90, 120]
W_CHOICES_LONG = [180, 240, 360, 481, 600, 725, 840]  # search-cap region
R_CHOICES = [1, 2, 4, 7, 11, 15]
N_PATHS = 8

# Funding-failure conditioning bound. The reference's failure predicates
# compare "cash delivered < cash needed − SMALL_EPSILON" with an ABSOLUTE
# 1e-6 epsilon (simulation.py:429, :788); delivered nets carry ~1 ulp of
# round-off of the withdrawal/tax-bill magnitude, so once a path's dollar
# amounts exceed ~1e10 the predicate compares pure f64 noise against the
# epsilon and its outcome (and hence ruin TIMING) is arithmetic-order
# chaos, not semantics — both engines flag ruin, one ulp apart (found by
# trial 457 of the 2026-08-18 long campaign: a $16T portfolio whose
# $1.1e10 annual tax bill settled 1.9e-6 short in the reference). Exact
# differential comparison is only meaningful below that scale; paths
# whose balances cross this bound are counted and skipped (1e9 leaves a
# ~4x margin: 1 ulp of 1e9 is 2.2e-7 < 1e-6).
PREDICATE_SCALE_BOUND = 1e9


def load_reference():
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Silent:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Silent()
        sys.modules["loguru"] = loguru
    if REF_BACKEND not in sys.path:
        sys.path.append(REF_BACKEND)
    import config as ref_config
    import simulation as ref_simulation

    return ref_simulation, ref_config


def random_config_wide(rng: np.random.Generator):
    """Randomized scenario over a wider space than tests/test_fuzz_parity."""
    n_streams = int(rng.integers(0, 5))
    streams = []
    for s in range(n_streams):
        streams.append(
            {
                "name": f"s{s}",
                # include exact zero (pruned) and large amounts
                "monthly_amount_today": float(
                    rng.choice([0.0, rng.uniform(0, 12_000)])
                ),
                "start_at_age": float(rng.uniform(30, 80)),
                "duration_years": (
                    None if rng.random() < 0.4 else int(rng.integers(0, 30))
                ),
                "inflation_indexed": bool(rng.random() < 0.5),
                "tax_rate": float(rng.uniform(0, 0.6)),
            }
        )
    rho = float(rng.choice([-1.0, 1.0, 0.0, rng.uniform(-1, 1)]))
    return make_config(
        initial_balance=float(rng.choice([0.0, rng.uniform(0, 2_000_000)])),
        monthly_contribution=float(rng.choice([0.0, rng.uniform(0, 15_000)])),
        contribution_growth_rate_annual=float(rng.uniform(0, 0.12)),
        monthly_expenses=float(rng.choice([0.0, rng.uniform(200, 12_000)])),
        current_age=float(rng.uniform(25, 70)),
        retirement_years=int(rng.choice(R_CHOICES)),
        allocation_inv1_pct=float(rng.choice([0.0, 1.0, rng.uniform(0, 1)])),
        # NOTE: deliberately NO allocation_inv1_final_pct here — this
        # campaign certifies per-path parity against the ACTUAL reference
        # engine, which has no glide (it ignores the unknown field, so a
        # glide config would diverge by design). Glide's randomized
        # differential lives in tests/test_fuzz_parity.py against the
        # glide-aware oracle instead.
        inv1_returns_mean=float(rng.uniform(-0.15, 0.25)),
        inv1_returns_volatility=float(rng.choice([0.0, rng.uniform(0, 0.5)])),
        inv1_annual_tax_on_gains_rate=float(rng.uniform(0, 0.6)),
        inv1_realized_gains_tax_rate=float(rng.uniform(0, 0.5)),
        inv1_use_realized_gains_tax_system=bool(rng.random() < 0.5),
        inv2_premium_over_inflation_mean=float(rng.uniform(-0.05, 0.15)),
        inv2_premium_over_inflation_volatility=float(
            rng.choice([0.0, rng.uniform(0, 0.1)])
        ),
        inv2_annual_tax_on_gains_rate=float(rng.uniform(0, 0.6)),
        inv2_realized_gains_tax_rate=float(rng.uniform(0, 0.5)),
        inv2_use_realized_gains_tax_system=bool(rng.random() < 0.5),
        inflation_rate_mean=float(rng.uniform(-0.03, 0.15)),
        inflation_rate_volatility=float(rng.choice([0.0, rng.uniform(0, 0.08)])),
        equity_inflation_correlation=rho,
        other_income_streams=streams,
        seed=int(rng.integers(0, 2**31)),
    )


def compare_path(outs, p, theirs, L, msg):
    """Every per-path field of ours vs the reference's result dict."""
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
            ytr_ours, theirs["YearsToRuin"], rtol=0, atol=1e-9, err_msg=msg
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
        traj, theirs["Trajectory"], rtol=1e-8, atol=1e-6, err_msg=msg
    )
    price = np.maximum(np.asarray(outs.price_levels)[p][:L], 1e-6)
    np.testing.assert_allclose(
        np.where(np.asarray(outs.price_levels)[p][:L] > 1e-6, traj / price, 0.0),
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
        wr_ours[valid], wr_theirs[valid], rtol=1e-7, atol=1e-8, err_msg=msg
    )


def run_trial(ref_sim_mod, ref_cfg_mod, rng, trial, w_choices=W_CHOICES):
    cfg = random_config_wide(rng)
    working_months = int(rng.choice(w_choices))
    R = cfg.retirement_years
    T = working_months + 12 * R

    params = SimParams.from_config(cfg, dtype=jnp.float64)
    _, key = stream_keys(cfg.seed)
    L = expected_trajectory_length(working_months, R)
    outs = simulate_paths(
        params, jnp.int32(working_months), key,
        n_paths=N_PATHS, t_scan=T, retirement_years=R, traj_len=L,
        dtype=jnp.float64,
    )
    raw = np.stack(
        [
            np.asarray(
                jax.random.normal(
                    jax.random.fold_in(key, m), (N_PATHS, 3), dtype=jnp.float64
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

    skipped = 0
    for p in range(N_PATHS):
        # Conditioning guard: above PREDICATE_SCALE_BOUND the reference's
        # absolute-epsilon funding predicates are noise-driven (see the
        # constant's comment) and exact ruin-timing agreement is ill-posed.
        path_scale = max(
            float(np.max(np.asarray(outs.trajectory)[p])),
            float(np.asarray(outs.start_balance)[p]),
        )
        if path_scale > PREDICATE_SCALE_BOUND:
            skipped += 1
            continue
        z = raw[:, p, :]

        def draw(n_months, path_seed, z=z):
            assert n_months <= T
            z_eq = z[:n_months, 0]
            z_inf = rho * z_eq + rho_c * z[:n_months, 1]
            return np.column_stack((z_eq, z_inf, z[:n_months, 2]))

        sim._draw_shock_path = draw
        theirs = sim._run_single_simulation_path(working_months, 0)
        compare_path(
            outs, p, theirs, L,
            f"trial {trial} path {p} (W={working_months}, R={R}, "
            f"seed={cfg.seed})",
        )
    return skipped


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed", type=int, default=90_000)
    ap.add_argument("--long", action="store_true")
    args = ap.parse_args()
    w_choices = W_CHOICES_LONG if args.long else W_CHOICES

    # Without this, the periodic jax.clear_caches() below would force full
    # recompiles instead of seconds-long persistent-cache loads.
    enable_persistent_compilation_cache()
    ref_sim_mod, ref_cfg_mod = load_reference()
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    failures = 0
    skipped_paths = 0
    for trial in range(args.trials):
        try:
            skipped_paths += run_trial(
                ref_sim_mod, ref_cfg_mod, rng, trial, w_choices
            )
        except Exception as exc:  # keep fuzzing; report at the end
            failures += 1
            print(f"FAIL trial {trial}: {exc}", flush=True)
        if (trial + 1) % 10 == 0:
            print(
                f"  {trial + 1}/{args.trials} trials, {failures} failures, "
                f"{skipped_paths} ill-conditioned paths skipped, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )
        if (trial + 1) % 25 == 0:
            # Every distinct (T, traj_len, streams) combo keeps a live CPU
            # executable; hundreds of them exhaust the process's mmap budget
            # (LLVM 'Cannot allocate memory' with free RAM). Drop them —
            # recompiles hit the persistent cache.
            jax.clear_caches()
    status = "CLEAN" if failures == 0 else f"{failures} FAILURES"
    print(
        f"fuzz campaign: {args.trials} trials x {N_PATHS} paths, {status} "
        f"({skipped_paths} paths above the ~$1e9 funding-predicate "
        f"conditioning bound skipped) ({time.time() - t0:.0f}s)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
