"""Config schema validation + pure timing-helper contracts."""

import math

import pytest

from monte_carlo_retirement_tpu.config import Config, ConfigurationError, load_config_from_json
from monte_carlo_retirement_tpu.models.retirement import arithmetic_to_log_params
from monte_carlo_retirement_tpu.timing import (
    age_at_retirement_year,
    expected_trajectory_length,
    retirement_age,
    stream_payment_start_age,
    stream_payment_start_month_index,
    trajectory_time_points,
)
from tests.conftest import make_config


def test_config_rejects_impossible_means_and_empty_search():
    with pytest.raises(ValueError):
        make_config(inv1_returns_mean=-1.0)
    with pytest.raises(ValueError):
        make_config(inflation_rate_mean=-1.0)
    with pytest.raises(ValueError):
        make_config(inv2_premium_over_inflation_mean=-1.0)
    with pytest.raises(ValueError):
        make_config(num_simulations_search=0)
    with pytest.raises(ValueError):
        make_config(seed=-1)
    with pytest.raises(ValueError):
        make_config(allocation_inv1_pct=1.5)
    with pytest.raises(ValueError):
        make_config(retirement_years=0)


def test_engine_rejects_negative_seed_override():
    from monte_carlo_retirement_tpu.engine.runner import Engine

    with pytest.raises(ValueError):
        Engine(make_config(seed=0), main_seed_override=-1)


def test_scenario_alias_and_allocation_complement():
    cfg = make_config(allocation_inv1_pct=0.333333)
    assert cfg.Nickname == "test"
    assert cfg.allocation_inv1_pct + cfg.allocation_inv2_pct == pytest.approx(1.0)
    by_name = Config(**{**cfg.model_dump(by_alias=False)})
    assert by_name.Nickname == "test"


def test_load_config_errors(tmp_path):
    with pytest.raises(ConfigurationError):
        load_config_from_json(str(tmp_path / "missing.json"))
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(ConfigurationError):
        load_config_from_json(str(bad))


def test_arithmetic_to_log_params_moments():
    mu, sigma = arithmetic_to_log_params(0.12, 0.15)
    # E[exp(mu + sigma Z)] = exp(mu + sigma^2/2) must equal 1.12
    assert math.exp(mu + sigma * sigma / 2) == pytest.approx(1.12, rel=1e-12)
    mu0, sigma0 = arithmetic_to_log_params(0.05, 0.0)
    assert sigma0 == 0.0
    assert mu0 == pytest.approx(math.log(1.05))
    with pytest.raises(ValueError):
        arithmetic_to_log_params(-1.0, 0.1)
    with pytest.raises(ValueError):
        arithmetic_to_log_params(0.05, -0.1)


def test_trajectory_time_points_partial_year():
    points = trajectory_time_points(13, 1)
    assert points == pytest.approx([0.0, 1.0, 13 / 12, 25 / 12])
    assert expected_trajectory_length(13, 1) == 4
    # Full years only: no duplicate retirement sample
    assert trajectory_time_points(24, 2) == pytest.approx([0.0, 1.0, 2.0, 3.0, 4.0])
    # Immediate retirement
    assert trajectory_time_points(0, 2) == pytest.approx([0.0, 1.0, 2.0])


def test_income_stream_start_month_math():
    current_age = 40.0
    working_months = 240  # retire at 60
    assert retirement_age(current_age, working_months) == pytest.approx(60.0)
    assert stream_payment_start_age(current_age, working_months, 65.0) == pytest.approx(65.0)
    assert age_at_retirement_year(current_age, working_months, 5) == pytest.approx(65.0)
    assert stream_payment_start_month_index(current_age, working_months, 65.0) == 60
    # Eligible before retirement -> starts at retirement
    assert stream_payment_start_age(current_age, working_months, 55.0) == pytest.approx(60.0)
    assert stream_payment_start_month_index(current_age, working_months, 55.0) == 0
    # Fractional age rounds up to the next monthly payment date
    assert stream_payment_start_month_index(60.0, 0, 60.51) == 7
