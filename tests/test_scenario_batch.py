"""Scenario-grid batching: stacked configs in one compiled dispatch."""

import numpy as np
import pytest

from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.engine.scenario_batch import (
    run_scenario_batch,
    stack_params,
)
from tests.conftest import make_config


def test_scenario_batch_matches_individual_runs():
    """Batched scenarios reproduce single-engine probe results exactly
    (same stream seed => same shocks => identical success rates)."""
    variants = [
        make_config(seed=0, monthly_expenses=2_000.0, retirement_years=8),
        make_config(seed=0, monthly_expenses=4_000.0, retirement_years=8),
        make_config(seed=0, monthly_expenses=8_000.0, retirement_years=8),
    ]
    months = [24, 24, 24]
    batch = run_scenario_batch(variants, months, num_simulations=64, seed=0)
    assert batch.success_probability.shape == (3,)
    # Higher expenses can never raise success under shared shocks.
    assert batch.success_probability[0] >= batch.success_probability[1]
    assert batch.success_probability[1] >= batch.success_probability[2]

    import jax.numpy as jnp

    for cfg, w, expected in zip(variants, months, batch.success_probability):
        # float32 to match the batch (the RNG draw values depend on dtype).
        eng = Engine(cfg, main_seed_override=0, dtype=jnp.float32)
        probs = eng.probe([w], 64, stream="final", horizon_months=w)
        assert probs[0] == pytest.approx(float(expected), abs=1e-6)


def test_scenario_batch_validates_structure():
    a = make_config(retirement_years=5)
    b = make_config(retirement_years=6)
    with pytest.raises(ValueError):
        stack_params([a, b])
    c = make_config(
        retirement_years=5,
        other_income_streams=[
            {
                "name": "P",
                "monthly_amount_today": 100.0,
                "start_at_age": 60.0,
                "duration_years": None,
                "inflation_indexed": True,
                "tax_rate": 0.0,
            }
        ],
    )
    with pytest.raises(ValueError):
        stack_params([a, c])
    with pytest.raises(ValueError):
        run_scenario_batch([a], [1, 2], 16)
