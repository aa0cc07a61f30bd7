"""Host-layer surface tests: CLI flow, plotting output, failure semantics."""

import json
import os


from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.simulator import RetirementMonteCarloSimulator
from monte_carlo_retirement_tpu.hosts.plotting import (
    plot_portfolio_trajectories,
    plot_simulation_results,
)
from tests.conftest import base_config_dict, make_config


def test_bundled_configs_load_and_validate():
    for name in ("config.json", "jorge.json"):
        path = os.path.join(os.path.dirname(os.path.dirname(__file__)), name)
        cfg = Config(**load_config_from_json(path))
        assert cfg.retirement_years > 0
        assert 0.0 <= cfg.allocation_inv1_pct <= 1.0


def test_plots_render_to_png(tmp_path):
    cfg = make_config(num_simulations_main=16, retirement_years=3, seed=4)
    sim = RetirementMonteCarloSimulator(cfg)
    sim.use_final_seeds()
    summary, traj, samples, _, _, _, _ = sim.run_monte_carlo_simulations(13, 16)

    hist = tmp_path / "hist.png"
    plot_simulation_results(
        summary,
        cfg,
        {
            "required_working_months": 13,
            "final_success_probability": 90.0,
            "median_start_retirement_balance": 1.0,
            "median_final_balance": 1.0,
            "SWR": 4.0,
        },
        str(hist),
    )
    assert hist.exists() and hist.stat().st_size > 10_000

    traj_png = tmp_path / "traj.png"
    plot_portfolio_trajectories(traj, samples, 13, cfg, str(traj_png))
    assert traj_png.exists() and traj_png.stat().st_size > 10_000


def test_plot_skips_on_missing_data(tmp_path):
    cfg = make_config()
    out = tmp_path / "missing.png"
    plot_portfolio_trajectories(None, None, 12, cfg, str(out))
    assert not out.exists()


def test_cli_runs_end_to_end(tmp_path, monkeypatch, capsys):
    """Full CLI flow on a small scenario: search, final run, two PNGs."""
    import sys

    from monte_carlo_retirement_tpu.hosts import cli

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="cli test",
        initial_balance=50_000.0,
        monthly_contribution=4_000.0,
        monthly_expenses=3_000.0,
        retirement_years=5,
        num_simulations_search=16,
        num_simulations_main=32,
        target_probability=80.0,
        seed=3,
    )))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["cli", str(cfg_path)])
    cli.main()
    pngs = list(tmp_path.glob("ret_proj_cli_test_*.png"))
    assert len(pngs) == 2
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    assert len(logs) == 1
    assert "Final Simulation Results" in logs[0].read_text()


def test_cli_aborts_cleanly_when_target_unreachable(tmp_path, monkeypatch):
    import sys

    from monte_carlo_retirement_tpu.hosts import cli

    cfg_path = tmp_path / "impossible.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="impossible",
        initial_balance=0.0,
        monthly_contribution=0.0,
        monthly_expenses=50_000.0,
        retirement_years=5,
        num_simulations_search=8,
        num_simulations_main=8,
        target_probability=99.0,
        seed=3,
    )))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["cli", str(cfg_path)])
    cli.main()  # must not raise; logs the abort
    assert not list(tmp_path.glob("*.png"))


def test_search_curve_failure_is_http_400_semantics():
    """The facade raises the same -1 sentinel the hosts map to HTTP 400."""
    cfg = make_config(
        initial_balance=0.0,
        monthly_contribution=0.0,
        monthly_expenses=50_000.0,
        retirement_years=5,
        num_simulations_search=8,
        target_probability=99.0,
        seed=3,
    )
    sim = RetirementMonteCarloSimulator(cfg)
    months, prob, curve = sim.find_minimum_working_months(verbose=False)
    assert months == -1
    assert prob < 99.0
    assert len(curve) > 0


def test_cli_json_out_and_override(tmp_path, monkeypatch):
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from monte_carlo_retirement_tpu.hosts.schemas import SimulationResponse

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="json out",
        retirement_years=3,
        num_simulations_main=16,
        monthly_expenses=500.0,
        seed=6,
    )))
    out_path = tmp_path / "result.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path), "--override", "13", "--json-out", str(out_path)],
    )
    from monte_carlo_retirement_tpu.engine.simulator import (
        RetirementMonteCarloSimulator,
    )

    calls = {"n": 0}
    original = RetirementMonteCarloSimulator.run_monte_carlo_simulations

    def counted(self, *a, **k):
        calls["n"] += 1
        return original(self, *a, **k)

    monkeypatch.setattr(
        RetirementMonteCarloSimulator, "run_monte_carlo_simulations", counted
    )
    cli.main()
    payload = json.loads(out_path.read_text())
    parsed = SimulationResponse.model_validate(payload)
    assert parsed.summary.required_working_months == 13
    # --json-out must reuse the final batch, not re-run it for the payload.
    assert calls["n"] == 1


def test_cli_grid_mode(tmp_path, monkeypatch):
    """--grid: one batched sweep from a request file, table logged, JSON
    payload written and schema-valid."""
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from monte_carlo_retirement_tpu.hosts.grid import GridResponse

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="grid cli", retirement_years=3, num_simulations_main=32,
        seed=8,
    )))
    grid_path = tmp_path / "grid.json"
    grid_path.write_text(json.dumps({
        "variants": [
            {"name": "base", "overrides": {}},
            {"name": "frugal", "overrides": {"monthly_expenses": 1_000.0}},
        ],
        "working_months": 6,
    }))
    out_path = tmp_path / "grid_result.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path), "--grid", str(grid_path),
         "--json-out", str(out_path)],
    )
    cli.main()
    payload = GridResponse.model_validate(json.loads(out_path.read_text()))
    assert payload.total_scenarios == 2 and payload.num_paths == 32
    assert payload.rows[1].success_probability >= payload.rows[0].success_probability
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    assert logs and "Scenario grid: 2 variants" in logs[0].read_text()
    assert not list(tmp_path.glob("*.png"))  # grid mode plots nothing


def test_cli_grid_mode_bad_request(tmp_path, monkeypatch):
    import sys

    from monte_carlo_retirement_tpu.hosts import cli

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(seed=8)))
    grid_path = tmp_path / "grid.json"
    grid_path.write_text(json.dumps({
        "variants": [{"overrides": {"monthly_expenses": -1}}],
        "working_months": 0,
    }))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv", ["cli", str(cfg_path), "--grid", str(grid_path)],
    )
    cli.main()  # must not raise; logs the validation error
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    assert logs and "Invalid grid request" in logs[0].read_text()
