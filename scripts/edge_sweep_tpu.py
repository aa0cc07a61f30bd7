"""Edge-scenario sweep of the f32 Pallas path on the real TPU.

The CPU test suite pins these semantics in float64 on the XLA scan kernel;
this script drives the same extremes through the float32 Pallas kernels on
device — zero volatility, rho = +-1, zero balances, ruinous expenses,
enormous balances, late/immediate streams, partial working years — and
asserts every output is finite and the headline numbers are sane.

Run: python scripts/edge_sweep_tpu.py   (requires the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.runner import (
    Engine,
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = load_config_from_json(os.path.join(ROOT, "config.json"))
BASE["seed"] = 7
BASE["retirement_years"] = 10  # small horizon: every case compiles once

EDGES = {
    "zero-vol deterministic": dict(
        inv1_returns_volatility=0.0, inv2_premium_over_inflation_volatility=0.0,
        inflation_rate_volatility=0.0,
    ),
    "rho=+1": dict(equity_inflation_correlation=1.0,
                   inv1_returns_volatility=0.2),
    "rho=-1": dict(equity_inflation_correlation=-1.0,
                   inv1_returns_volatility=0.2),
    "zero balance, pension-funded": dict(
        initial_balance=0.0, monthly_contribution=0.0,
        other_income_streams=[dict(
            name="pension", monthly_amount_today=10_000.0, start_at_age=40.0,
            duration_years=None, inflation_indexed=True, tax_rate=0.0)],
    ),
    "ruinous expenses": dict(monthly_expenses=500_000.0),
    "huge balance": dict(initial_balance=1e12, monthly_expenses=1e6),
    "all-in one asset": dict(allocation_inv1_pct=1.0),
    "max vol": dict(inv1_returns_volatility=1.0,
                    inflation_rate_volatility=0.05),
    "late stream + cap": dict(other_income_streams=[dict(
        name="late", monthly_amount_today=3_000.0, start_at_age=88.0,
        duration_years=1, inflation_indexed=False, tax_rate=0.5)]),
    "annual mark-to-market": dict(
        inv1_use_realized_gains_tax_system=False,
        inv1_annual_tax_on_gains_rate=0.4,
        inv2_use_realized_gains_tax_system=False,
        inv2_annual_tax_on_gains_rate=0.4,
    ),
}

failures = []
for name, overrides in EDGES.items():
    raw = dict(BASE)
    raw.update(overrides)
    eng = Engine(Config(**raw), dtype=jnp.float32)
    # probe (search path) at a partial working year + full-stats run
    probs = eng.probe([0, 7, 24], 4096, stream="search")
    res = eng.run(7, 4096, stream="final")
    checks = {
        "probe finite": all(np.isfinite(p) for p in probs),
        "probe in [0,100]": all(0.0 <= p <= 100.0 for p in probs),
        "success finite": np.isfinite(res.success_probability),
        "final balances finite": bool(np.isfinite(res.final_balance).all()),
        "trajectory finite": bool(
            np.isfinite(res.trajectory_percentiles).all()
        ),
        "swr finite or nan": bool(
            np.isfinite(res.swr) or np.isnan(res.swr)
        ),
    }
    bad = [k for k, ok in checks.items() if not ok]
    status = "OK " if not bad else "FAIL"
    print(f"{status} {name:32s} probes={['%.1f' % p for p in probs]} "
          f"success={res.success_probability:.1f}%")
    if bad:
        failures.append((name, bad))

if failures:
    print("\nFAILURES:", failures)
    sys.exit(1)
print("\nall edge scenarios clean on the f32 Pallas device path")
