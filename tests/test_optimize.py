"""Optimizer: batched grid refinement over one config parameter.

No reference analog (the reference evaluates one config per request,
backend/simulation.py:952-1128); these tests pin the refinement against an
injected deterministic objective (the reference's fake-engine search-test
pattern, test_simulation_correctness.py:259-332), the CRN consistency of
real evaluations, and both host surfaces.
"""

import json

import numpy as np
import pytest

from monte_carlo_retirement_tpu.engine import optimize as O
from monte_carlo_retirement_tpu.engine.scenario_batch import (
    GRID_FINAL_PERCENTILES,
    ScenarioBatchResult,
)
from tests.conftest import base_config_dict, make_config

W = 24
N = 512
SEED = 11


def _cfg(**overrides):
    base = dict(
        seed=SEED,
        retirement_years=5,
        monthly_expenses=3_500.0,
        inv1_returns_volatility=0.18,
        num_simulations_main=N,
    )
    base.update(overrides)
    return make_config(**base)


def _fake_grid(objective_fn, median_fn=None):
    """A run_scenario_grid stand-in computing a known deterministic
    objective of the probed parameter value."""

    def runner(variants, months, n, seed=0, backend=None, mesh=None,
               progress_callback=None, chunk_size=None):
        xs = np.array([v.allocation_inv1_pct for v in variants])
        obj = np.array([objective_fn(x) for x in xs], dtype=float)
        med = (np.array([median_fn(x) for x in xs], dtype=float)
               if median_fn else obj * 1e4)
        return ScenarioBatchResult(
            success_probability=obj,
            median_final_balance=med,
            mean_final_balance=med * 1.1,
            success_sigma=np.full(len(xs), 0.5),
            final_balance_percentiles=np.tile(
                med[:, None], (1, len(GRID_FINAL_PERCENTILES))
            ),
        )

    return runner


def test_refinement_converges_on_injected_peak(monkeypatch):
    """Three rounds x 9 points: round-r grid spacing is (2/8)^(r-1)/8, so
    the returned argmax sits within half the round-3 spacing of the true
    interior optimum and the final bracket spans two round-3 cells."""
    peak = 0.37
    monkeypatch.setattr(
        O, "run_scenario_grid",
        _fake_grid(lambda x: 100.0 - (x - peak) ** 2 * 100.0),
    )
    res = O.optimize_param(
        _cfg(), W, "allocation_inv1_pct", points=9, rounds=3,
    )
    assert res.evaluations == 27
    spacing_r3 = (2.0 / 8.0) ** 2 / 8.0  # 1/128
    assert abs(res.best.value - peak) <= spacing_r3 / 2 * 1.01
    assert res.interval[0] <= peak <= res.interval[1]
    assert res.interval[1] - res.interval[0] <= 2 * spacing_r3 * 1.01
    # curve is the ROUND-1 coarse sweep over the full interval
    assert len(res.curve) == 9
    assert res.curve[0].value == 0.0 and res.curve[-1].value == 1.0


def test_even_points_never_regress_past_a_found_peak(monkeypatch):
    """With an EVEN point count the zoom grid need not re-sample the
    previous argmax; the returned best must still be the best point ever
    evaluated (global tracking), not the last round's inferior grid."""
    peak = 1.0 / 3.0  # exactly on the round-1 grid {0, 1/3, 2/3, 1}
    obj = lambda x: 100.0 - abs(x - peak) * 90.0  # noqa: E731 - narrow peak
    monkeypatch.setattr(O, "run_scenario_grid", _fake_grid(obj))
    res = O.optimize_param(
        _cfg(), W, "allocation_inv1_pct", points=4, rounds=3,
    )
    # round 2 grid linspace(0, 2/3, 4) = {0, 2/9, 4/9, 2/3} misses 1/3
    assert res.best.value == pytest.approx(peak)
    assert res.best.success_probability == pytest.approx(100.0)
    assert res.interval[0] <= peak <= res.interval[1]


def test_plateau_ties_break_by_median(monkeypatch):
    """Success saturates at 100% on plateaus; the argmax must prefer the
    highest median final balance among exact ties (CRN-deterministic)."""
    monkeypatch.setattr(
        O, "run_scenario_grid",
        _fake_grid(
            lambda x: 100.0 if x >= 0.5 else 50.0,
            median_fn=lambda x: 1e6 * (2.0 - x),  # decreasing: prefer 0.5
        ),
    )
    res = O.optimize_param(
        _cfg(), W, "allocation_inv1_pct", points=5, rounds=1,
    )
    assert res.best.success_probability == 100.0
    assert res.best.value == 0.5
    assert res.objective == "success_probability"


def test_validation_errors():
    cfg = _cfg()
    with pytest.raises(ValueError, match="Unknown parameter"):
        O.optimize_param(cfg, W, "nope")
    with pytest.raises(ValueError, match="Unknown objective"):
        O.optimize_param(cfg, W, "allocation_inv1_pct", objective="nope")
    with pytest.raises(ValueError, match="no upper bound"):
        O.optimize_param(cfg, W, "monthly_contribution")  # unbounded field
    with pytest.raises(ValueError, match="must be increasing"):
        O.optimize_param(cfg, W, "allocation_inv1_pct", lo=0.8, hi=0.2)
    with pytest.raises(ValueError, match="inside the config bounds"):
        O.optimize_param(cfg, W, "allocation_inv1_pct", lo=-0.5, hi=0.5)
    with pytest.raises(ValueError, match="points"):
        O.optimize_param(cfg, W, "allocation_inv1_pct", points=2)


def test_real_evaluation_crn_matches_direct_grid():
    """A single-round sweep's curve must equal a direct scenario-grid run
    of the same variants bit-for-bit (same CRN stream, same engine)."""
    from monte_carlo_retirement_tpu.engine.scenario_batch import (
        run_scenario_grid,
    )

    cfg = _cfg()
    res = O.optimize_param(
        cfg, W, "allocation_inv1_pct", num_paths=N, seed=SEED,
        points=5, rounds=1,
    )
    xs = [p.value for p in res.curve]
    assert xs == pytest.approx(list(np.linspace(0.0, 1.0, 5)))
    from monte_carlo_retirement_tpu.config import Config

    base = cfg.model_dump()
    base.pop("allocation_inv2_pct", None)
    direct = run_scenario_grid(
        [Config(**{**base, "allocation_inv1_pct": x}) for x in xs],
        [W] * 5, N, seed=SEED,
    )
    for i, p in enumerate(res.curve):
        assert p.success_probability == pytest.approx(
            float(direct.success_probability[i]), abs=1e-9
        )
        assert p.median_final_balance == pytest.approx(
            float(direct.median_final_balance[i]), rel=1e-7
        )


def test_optimize_endpoint_end_to_end():
    import asyncio

    async def scenario():
        from aiohttp.test_utils import TestClient, TestServer

        from monte_carlo_retirement_tpu.hosts.optimize import (
            OptimizeResponse,
        )
        from monte_carlo_retirement_tpu.hosts.server import create_app

        client = TestClient(TestServer(create_app()))
        await client.start_server()
        try:
            base = base_config_dict(
                num_simulations_main=64, retirement_years=3, seed=5
            )
            body = {
                "config": base,
                "working_months": 12,
                "param": "allocation_inv1_pct",
                "points": 5,
                "rounds": 2,
            }
            resp = await client.post("/api/optimize", json=body)
            assert resp.status == 200, await resp.text()
            data = await resp.json()
            OptimizeResponse.model_validate(data)
            assert data["param"] == "allocation_inv1_pct"
            assert data["evaluations"] == 10
            assert 0.0 <= data["best"]["value"] <= 1.0
            assert len(data["curve"]) == 5
            # objective_value mirrors the requested objective's field
            assert data["best"]["objective_value"] == pytest.approx(
                data["best"]["success_probability"], abs=1e-3
            )

            # A risk-averse percentile objective serves end-to-end
            resp = await client.post(
                "/api/optimize",
                json={**body, "objective": "p5_final_balance", "rounds": 1},
            )
            assert resp.status == 200, await resp.text()
            p5data = await resp.json()
            OptimizeResponse.model_validate(p5data)
            assert p5data["objective"] == "p5_final_balance"
            assert all("objective_value" in p for p in p5data["curve"])

            # Unknown parameter -> 422
            resp = await client.post(
                "/api/optimize", json={**body, "param": "nope"}
            )
            assert resp.status == 422
            assert "nope" in await resp.text()

            # Unbounded field without hi -> 422
            resp = await client.post(
                "/api/optimize",
                json={**body, "param": "monthly_contribution"},
            )
            assert resp.status == 422
            assert "upper bound" in await resp.text()

            # Invalid base config -> 422
            resp = await client.post(
                "/api/optimize",
                json={**body, "config": {**base, "monthly_expenses": -1}},
            )
            assert resp.status == 422

            # SSE variant: phase + optimize_round events + one result
            resp = await client.post("/api/optimize/stream", json=body)
            assert resp.status == 200
            text = (await resp.read()).decode()
            events = [json.loads(line[len("data: "):])
                      for line in text.split("\n\n")
                      if line.startswith("data: ")]
            kinds = [e["type"] for e in events]
            assert kinds[0] == "phase"
            assert kinds.count("optimize_round") == 2
            assert kinds[-1] == "result"
            OptimizeResponse.model_validate(events[-1]["data"])
        finally:
            await client.close()

    asyncio.run(scenario())


def test_cli_optimize_mode(tmp_path, monkeypatch):
    """--optimize: refinement from the CLI at an override month count,
    result logged, JSON payload written and schema-valid."""
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from monte_carlo_retirement_tpu.hosts.optimize import OptimizeResponse

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="opt cli", retirement_years=3, num_simulations_main=64,
        seed=9,
    )))
    out_path = tmp_path / "opt_result.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path), "--optimize", "allocation_inv1_pct:0.2:0.9",
         "--override", "12", "--json-out", str(out_path)],
    )
    cli.main()
    payload = OptimizeResponse.model_validate(
        json.loads(out_path.read_text())
    )
    assert payload.param == "allocation_inv1_pct"
    assert 0.2 <= payload.best.value <= 0.9
    assert payload.curve[0].value == 0.2 and payload.curve[-1].value == 0.9
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    text = logs[0].read_text()
    assert "Optimize: success_probability over 'allocation_inv1_pct'" in text
    assert "optimize round 3/3" in text


def test_downside_objective_uses_percentile_column(monkeypatch):
    """p5_final_balance optimizes the 5th-percentile final balance: with
    an injected result where p5 DISAGREES with success/median, the argmax
    must follow the percentile column, and every reported point carries
    the requested objective's value."""

    def runner(variants, months, n, seed=0, backend=None, mesh=None,
               progress_callback=None, chunk_size=None):
        xs = np.array([v.allocation_inv1_pct for v in variants])
        success = 100.0 - xs * 10.0  # decreasing: would pick x=0
        med = np.full(len(xs), 1e6)  # flat: no tie-break signal
        p5 = 1e5 + xs * 1e5  # increasing: p5 picks x=1
        pcts = np.tile(med[:, None], (1, len(GRID_FINAL_PERCENTILES)))
        pcts[:, 0] = p5
        return ScenarioBatchResult(
            success_probability=success,
            median_final_balance=med,
            mean_final_balance=med,
            success_sigma=np.full(len(xs), 0.5),
            final_balance_percentiles=pcts,
        )

    monkeypatch.setattr(O, "run_scenario_grid", runner)
    res = O.optimize_param(
        _cfg(), W, "allocation_inv1_pct", points=5, rounds=1,
        objective="p5_final_balance",
    )
    assert res.objective == "p5_final_balance"
    assert res.best.value == 1.0
    assert res.best.objective_value == pytest.approx(2e5)
    for p in res.curve:
        assert p.objective_value == pytest.approx(1e5 + p.value * 1e5)


def _fake_grid_2d(objective_fn):
    """run_scenario_grid stand-in reading TWO probed fields per variant."""

    def runner(variants, months, n, seed=0, backend=None, mesh=None,
               progress_callback=None, chunk_size=None):
        xs = np.array([v.allocation_inv1_pct for v in variants])
        ys = np.array([v.equity_inflation_correlation for v in variants])
        obj = np.array(
            [objective_fn(x, y) for x, y in zip(xs, ys)], dtype=float
        )
        med = obj * 1e4
        return ScenarioBatchResult(
            success_probability=obj,
            median_final_balance=med,
            mean_final_balance=med * 1.1,
            success_sigma=np.full(len(xs), 0.5),
            final_balance_percentiles=np.tile(
                med[:, None], (1, len(GRID_FINAL_PERCENTILES))
            ),
        )

    return runner


JOINT = ["allocation_inv1_pct", "equity_inflation_correlation"]


def test_joint_refinement_converges_on_injected_2d_peak(monkeypatch):
    """Three rounds x 5x5 points over a separable concave surface: each
    round's argmax cell is the nearest grid point per axis, so the answer
    lands within half the round-3 spacing of the true peak on BOTH axes
    and both refined brackets contain it."""
    peak = (0.37, -0.22)
    monkeypatch.setattr(
        O, "run_scenario_grid",
        _fake_grid_2d(
            lambda x, y: 100.0
            - 100.0 * (x - peak[0]) ** 2
            - 50.0 * (y - peak[1]) ** 2
        ),
    )
    events = []
    res = O.optimize_params(
        _cfg(), W, JOINT, points=5, rounds=3,
        progress_callback=events.append,
    )
    assert res.evaluations == 75 and res.points_per_axis == 5
    assert res.params == tuple(JOINT)
    # C-order surface over the full bounds: the SECOND axis varies fastest
    assert res.surface[0].values == (0.0, -1.0)
    assert res.surface[1].values == (0.0, -0.5)
    assert res.surface[-1].values == (1.0, 1.0)
    assert len(res.surface) == 25
    for d, (rng, pk) in enumerate([(1.0, peak[0]), (2.0, peak[1])]):
        spacing_r3 = rng * (2.0 / 4.0) ** 2 / 4.0
        assert abs(res.best.values[d] - pk) <= spacing_r3 / 2 * 1.01
        assert res.intervals[d][0] <= pk <= res.intervals[d][1]
        # The bracket updates only on STRICT improvement: a later round
        # that re-samples the incumbent exactly ties and keeps the earlier
        # bracket, so the guaranteed width bound is the ROUND-2 spacing.
        spacing_r2 = rng * (2.0 / 4.0) / 4.0
        assert res.intervals[d][1] - res.intervals[d][0] \
            <= 2 * spacing_r2 * 1.01
    # joint progress events carry per-axis payloads and NO legacy keys
    rounds = [e for e in events if e["type"] == "optimize_round"]
    assert len(rounds) == 3
    assert all(len(e["best_values"]) == 2 and len(e["intervals"]) == 2
               for e in rounds)
    assert all("best_value" not in e and "interval" not in e
               for e in rounds)


def test_joint_validation_errors():
    cfg = _cfg()
    with pytest.raises(ValueError, match="1 or 2 parameters"):
        O.optimize_params(cfg, W, JOINT + ["monthly_expenses"])
    with pytest.raises(ValueError, match="Duplicate"):
        O.optimize_params(cfg, W, [JOINT[0], JOINT[0]])
    with pytest.raises(ValueError, match="rows per round"):
        O.optimize_params(cfg, W, JOINT, points=17)
    with pytest.raises(ValueError, match="bounds must align"):
        O.optimize_params(cfg, W, [JOINT[0]], bounds=[None, None])
    with pytest.raises(ValueError, match="no upper bound"):
        O.optimize_params(cfg, W, ["monthly_expenses", JOINT[0]])


def test_joint_real_evaluation_crn_matches_direct_grid():
    """A single-round 3x3 product sweep must equal a direct scenario-grid
    run of the same variants in the same (C-order) row order."""
    from monte_carlo_retirement_tpu.config import Config
    from monte_carlo_retirement_tpu.engine.scenario_batch import (
        run_scenario_grid,
    )

    cfg = _cfg()
    res = O.optimize_params(
        cfg, W, JOINT, num_paths=N, seed=SEED, points=3, rounds=1,
    )
    rows = [(x, y)
            for x in np.linspace(0.0, 1.0, 3)
            for y in np.linspace(-1.0, 1.0, 3)]
    base = cfg.model_dump()
    base.pop("allocation_inv2_pct", None)
    direct = run_scenario_grid(
        [Config(**{**base, JOINT[0]: x, JOINT[1]: y}) for x, y in rows],
        [W] * len(rows), N, seed=SEED,
    )
    assert len(res.surface) == 9
    for i, p in enumerate(res.surface):
        assert p.values == pytest.approx(rows[i])
        assert p.success_probability == pytest.approx(
            float(direct.success_probability[i]), abs=1e-9
        )
        assert p.median_final_balance == pytest.approx(
            float(direct.median_final_balance[i]), rel=1e-7
        )


def test_optimize_joint_endpoint_end_to_end():
    import asyncio

    async def scenario():
        from aiohttp.test_utils import TestClient, TestServer

        from monte_carlo_retirement_tpu.hosts.optimize import (
            OptimizeJointResponse,
        )
        from monte_carlo_retirement_tpu.hosts.server import create_app

        client = TestClient(TestServer(create_app()))
        await client.start_server()
        try:
            base = base_config_dict(
                num_simulations_main=64, retirement_years=3, seed=5
            )
            body = {
                "config": base,
                "working_months": 12,
                "params": [
                    {"name": JOINT[0]},
                    {"name": JOINT[1], "lo": -0.5, "hi": 0.5},
                ],
                "points": 3,
                "rounds": 2,
            }
            resp = await client.post("/api/optimize", json=body)
            assert resp.status == 200, await resp.text()
            data = await resp.json()
            OptimizeJointResponse.model_validate(data)
            assert data["params"] == JOINT
            assert data["evaluations"] == 18
            assert len(data["surface"]) == 9
            assert data["points_per_axis"] == 3
            assert 0.0 <= data["best"]["values"][0] <= 1.0
            assert -0.5 <= data["best"]["values"][1] <= 0.5
            # per-axis bound respected in the round-1 surface too
            assert data["surface"][0]["values"] == [0.0, -0.5]
            assert data["surface"][-1]["values"] == [1.0, 0.5]

            # Both request forms at once -> 422
            resp = await client.post(
                "/api/optimize", json={**body, "param": JOINT[0]}
            )
            assert resp.status == 422
            assert "exactly one" in await resp.text()

            # Neither form -> 422
            neither = {k: v for k, v in body.items() if k != "params"}
            resp = await client.post("/api/optimize", json=neither)
            assert resp.status == 422

            # Top-level lo/hi belong to the single-field form -> 422
            resp = await client.post(
                "/api/optimize", json={**body, "lo": 0.1}
            )
            assert resp.status == 422
            assert "single-field" in await resp.text()

            # Joint row cap: 17^2 = 289 > 257 -> 422
            resp = await client.post(
                "/api/optimize", json={**body, "points": 17}
            )
            assert resp.status == 422
            assert "rows per round" in await resp.text()

            # Duplicate names -> 422
            resp = await client.post(
                "/api/optimize",
                json={**body, "params": [{"name": JOINT[0]}] * 2},
            )
            assert resp.status == 422
            assert "Duplicate" in await resp.text()

            # SSE variant: joint optimize_round events carry best_values
            resp = await client.post("/api/optimize/stream", json=body)
            assert resp.status == 200
            text = (await resp.read()).decode()
            events = [json.loads(line[len("data: "):])
                      for line in text.split("\n\n")
                      if line.startswith("data: ")]
            kinds = [e["type"] for e in events]
            assert kinds[0] == "phase"
            rounds = [e for e in events if e["type"] == "optimize_round"]
            assert len(rounds) == 2
            assert all(len(e["best_values"]) == 2 for e in rounds)
            assert kinds[-1] == "result"
            OptimizeJointResponse.model_validate(events[-1]["data"])

            # A SINGLE-entry params list keeps the 1-D default of 17
            # points — the phase message must agree with the actual run.
            single = {
                "config": base, "working_months": 12, "rounds": 1,
                "params": [{"name": JOINT[0]}],
            }
            resp = await client.post("/api/optimize/stream", json=single)
            assert resp.status == 200
            text = (await resp.read()).decode()
            events = [json.loads(line[len("data: "):])
                      for line in text.split("\n\n")
                      if line.startswith("data: ")]
            assert "17 points/axis" in events[0]["message"]
            data = events[-1]["data"]
            OptimizeJointResponse.model_validate(data)
            assert data["evaluations"] == 17
            assert data["points_per_axis"] == 17
        finally:
            await client.close()

    asyncio.run(scenario())


def test_cli_optimize_joint_mode(tmp_path, monkeypatch):
    """--optimize with two comma-separated specs: joint product-grid
    refinement from the CLI, joint payload written and schema-valid."""
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from monte_carlo_retirement_tpu.hosts.optimize import (
        OptimizeJointResponse,
    )

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="opt joint cli", retirement_years=3,
        num_simulations_main=64, seed=9,
    )))
    out_path = tmp_path / "opt_joint.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path), "--optimize",
         f"{JOINT[0]}:0.2:0.9,{JOINT[1]}:-0.5:0.5",
         "--opt-points", "3", "--opt-rounds", "2",
         "--override", "12", "--json-out", str(out_path)],
    )
    cli.main()
    payload = OptimizeJointResponse.model_validate(
        json.loads(out_path.read_text())
    )
    assert payload.params == JOINT
    assert payload.evaluations == 18
    assert 0.2 <= payload.best.values[0] <= 0.9
    assert -0.5 <= payload.best.values[1] <= 0.5
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    text = logs[0].read_text()
    assert (f"Optimize: success_probability over "
            f"'{JOINT[0]} x {JOINT[1]}'") in text
    assert "optimize round 2/2" in text
    assert "round-1 surface (3 x 3" in text


def test_cli_optimize_flag_conflicts(monkeypatch):
    import sys

    from monte_carlo_retirement_tpu.hosts import cli

    monkeypatch.setattr(
        sys, "argv",
        ["cli", "x.json", "--sensitivity", "--optimize", "allocation_inv1_pct"],
    )
    with pytest.raises(SystemExit):
        cli.main()

    # --opt-points / --opt-rounds / --opt-objective need --optimize
    monkeypatch.setattr(sys, "argv", ["cli", "x.json", "--opt-points", "5"])
    with pytest.raises(SystemExit):
        cli.main()
    monkeypatch.setattr(sys, "argv", ["cli", "x.json", "--opt-rounds", "2"])
    with pytest.raises(SystemExit):
        cli.main()
    monkeypatch.setattr(
        sys, "argv", ["cli", "x.json", "--opt-objective", "mean_final_balance"]
    )
    with pytest.raises(SystemExit):
        cli.main()
