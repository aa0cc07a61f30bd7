"""Sensitivity analysis: FD-over-CRN-grid and AD-through-the-kernel.

The feature has no reference analog (the reference engine runs one config
at a time, backend/simulation.py:952-1128); these tests pin its internal
consistency instead: the FD probes must agree with single-engine runs
bit-for-bit (CRN), the AD gradients must match finite differences of the
very same metric, and boundary parameters must degrade to one-sided
probes.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monte_carlo_retirement_tpu.engine.runner import Engine
from monte_carlo_retirement_tpu.engine.sensitivity import (
    DEFAULT_PARAMS,
    SENSITIVITY_PARAMS,
    _log_params_ad,
    sensitivity_ad,
    sensitivity_fd,
    validate_params,
)
from monte_carlo_retirement_tpu.models.retirement import arithmetic_to_log_params
from tests.conftest import make_config

# Shared scale so every test reuses the same compiled executables:
# horizon = 120 working + 10y retirement = 240 months.
W = 120
N = 2000
R_YEARS = 10
SEED = 77


def _cfg(**overrides):
    base = dict(
        seed=SEED,
        retirement_years=R_YEARS,
        monthly_expenses=4_000.0,
        inv1_returns_volatility=0.15,
        num_simulations_main=N,
    )
    base.update(overrides)
    return make_config(**base)


def test_default_params_are_supported():
    assert validate_params(None) == DEFAULT_PARAMS
    for name in DEFAULT_PARAMS:
        assert name in SENSITIVITY_PARAMS


def test_validate_params_rejects_unknown_and_duplicates():
    with pytest.raises(ValueError, match="Unknown"):
        validate_params(["monthly_expenses", "nope"])
    with pytest.raises(ValueError, match="Duplicate"):
        validate_params(["monthly_expenses", "monthly_expenses"])


def test_fd_signs_and_crn_base_consistency():
    """Expenses must hurt, returns must help; and the FD base row must equal
    a single-engine probe on the same stream bit-for-bit (CRN plumbing)."""
    cfg = _cfg()
    rows = sensitivity_fd(
        cfg, W, num_paths=N, seed=SEED,
        params=["monthly_expenses", "inv1_returns_mean"],
    )
    by_name = {r.param: r for r in rows}
    exp = by_name["monthly_expenses"]
    ret = by_name["inv1_returns_mean"]
    assert 0.0 < exp.success_base < 100.0  # scenario is in the sensitive band
    assert exp.d_success <= 0.0
    assert ret.d_success >= 0.0
    assert exp.success_plus <= exp.success_minus  # monotone in expenses
    # CRN: the grid's base row IS the engine's own final-stream probe.
    # (The grid engine runs float32 everywhere; build the probe engine at
    # the same dtype so the RNG bit streams coincide.)
    eng = Engine(cfg, main_seed_override=SEED, dtype=jnp.float32)
    probe = eng.probe([W], N, stream="final")[0]
    assert exp.success_base == pytest.approx(probe, abs=1e-9)


def test_fd_derivative_matches_manual_two_point_difference():
    """sensitivity_fd must equal the obvious two-config difference on the
    same grid engine (same seeds, same steps)."""
    from monte_carlo_retirement_tpu.engine.scenario_batch import (
        run_scenario_batch,
    )

    cfg = _cfg()
    rel_step = 0.02
    rows = sensitivity_fd(
        cfg, W, num_paths=N, seed=SEED, params=["monthly_expenses"],
        rel_step=rel_step,
    )
    (row,) = rows
    v = cfg.monthly_expenses
    h = rel_step * v
    assert row.step_plus == pytest.approx(h)
    assert row.step_minus == pytest.approx(h)
    manual = run_scenario_batch(
        [_cfg(monthly_expenses=v + h), _cfg(monthly_expenses=v - h)],
        [W, W], N, seed=SEED, t_scan=W + 12 * R_YEARS,
    )
    d_manual = (
        manual.success_probability[0] - manual.success_probability[1]
    ) / (2 * h)
    assert row.d_success == pytest.approx(float(d_manual), abs=1e-9)
    d_mean_manual = (
        manual.mean_final_balance[0] - manual.mean_final_balance[1]
    ) / (2 * h)
    assert row.d_mean_final == pytest.approx(float(d_mean_manual), rel=1e-7)
    # downside column: d (5th-percentile final) from the same grid rows
    d_p5_manual = (
        manual.final_balance_percentiles[0, 0]
        - manual.final_balance_percentiles[1, 0]
    ) / (2 * h)
    assert row.d_p5_final == pytest.approx(float(d_p5_manual), rel=1e-7)


def test_boundary_parameters_probe_one_sided():
    """At a bound the probe must not step outside it: correlation pinned at
    -1 only probes upward; allocation pinned at 1 only probes downward."""
    cfg = _cfg(equity_inflation_correlation=-1.0)
    (row,) = sensitivity_fd(
        cfg, W, num_paths=N, seed=SEED,
        params=["equity_inflation_correlation"],
    )
    assert row.step_minus == 0.0 and row.step_plus > 0.0
    assert row.success_minus == row.success_base  # base doubles as the probe
    assert row.d_success == pytest.approx(
        (row.success_plus - row.success_base) / row.step_plus
    )

    cfg2 = _cfg(allocation_inv1_pct=1.0)
    (row2,) = sensitivity_fd(
        cfg2, W, num_paths=N, seed=SEED, params=["allocation_inv1_pct"]
    )
    assert row2.step_plus == 0.0 and row2.step_minus > 0.0


def test_ad_matches_fd_on_mean_final():
    """jacfwd through the scan kernel must agree with a CRN central
    difference of the same mean-final metric (piecewise-smoothness leaves
    only the O(h) switching-path mass between them)."""
    cfg = _cfg()
    names = ["monthly_expenses", "inv1_returns_mean"]
    ad = sensitivity_ad(cfg, W, num_paths=N, seed=SEED, params=names)
    rows = sensitivity_fd(
        cfg, W, num_paths=N, seed=SEED, params=names, rel_step=0.002,
        abs_step=0.0005,
    )
    by_name = {r.param: r for r in rows}
    for name in names:
        fd = by_name[name].d_mean_final
        grad = ad["d_mean_final"][name]
        assert math.isfinite(grad)
        assert grad == pytest.approx(fd, rel=0.05), (name, grad, fd)
    # Signs are economics, not luck.
    assert ad["d_mean_final"]["monthly_expenses"] < 0
    assert ad["d_mean_final"]["inv1_returns_mean"] > 0


def test_ad_allocation_gradient_covers_retirement_phase():
    """Regression (code-review find): on a NON-glide config the retirement
    phase reads the alloc1_final leaf, which mirrors alloc1 — the AD theta
    must move BOTH leaves or the decumulation phase is silently insensitive
    to the allocation (observed ~3000x-low gradients). Pinned against the
    CRN finite difference at working_months=0 (all-retirement horizon)."""
    cfg = _cfg()
    assert cfg.allocation_inv1_final_pct is None
    names = ["allocation_inv1_pct"]
    ad = sensitivity_ad(cfg, 0, num_paths=N, seed=SEED, params=names)
    rows = sensitivity_fd(
        cfg, 0, num_paths=N, seed=SEED, params=names, abs_step=0.002
    )
    grad = ad["d_mean_final"]["allocation_inv1_pct"]
    fd = rows[0].d_mean_final
    assert math.isfinite(grad) and abs(fd) > 0
    assert grad == pytest.approx(fd, rel=0.1), (grad, fd)


def test_log_params_ad_matches_host_conversion():
    """The differentiable lognormal conversion equals the host-side one,
    including the vol=0 degenerate case, and its gradient is finite there
    (d sigma / d vol -> 1/gross as vol -> 0)."""
    for mean, vol in [(0.08, 0.15), (0.0, 0.0), (0.02, 0.0), (-0.5, 0.3)]:
        mu_h, sigma_h = arithmetic_to_log_params(mean, vol)
        mu_d, sigma_d = _log_params_ad(jnp.float64(mean), jnp.float64(vol))
        assert float(mu_d) == pytest.approx(mu_h, abs=1e-12)
        assert float(sigma_d) == pytest.approx(sigma_h, abs=1e-12)

    grad = jax.grad(lambda v: _log_params_ad(jnp.float64(0.08), v)[1])(
        jnp.float64(0.0)
    )
    assert float(grad) == pytest.approx(1.0 / 1.08, rel=1e-6)


def test_host_assembly_orders_rows_and_rounds():
    """run_sensitivity_request: tornado ordering, significant-digit
    rounding, and the optional AD cross-check column."""
    from monte_carlo_retirement_tpu.hosts.sensitivity import (
        SensitivityRequest,
        SensitivityResponse,
        run_sensitivity_request,
    )
    from tests.conftest import base_config_dict

    base = base_config_dict(
        seed=SEED, retirement_years=R_YEARS, monthly_expenses=4_000.0,
        inv1_returns_volatility=0.15, num_simulations_main=N,
    )
    req = SensitivityRequest(
        config=base,
        working_months=W,
        params=["monthly_expenses", "equity_inflation_correlation"],
        num_paths=512,
        include_ad=True,
        ad_num_paths=512,
    )
    result = run_sensitivity_request(req)
    SensitivityResponse.model_validate(result)
    mags = [abs(r["success_per_step"]) for r in result["rows"]]
    assert mags == sorted(mags, reverse=True)
    assert result["num_paths"] == 512
    for row in result["rows"]:
        assert "ad_d_mean_final" in row
    assert "mean_final_balance_ad" in result


def test_sensitivity_endpoint_end_to_end():
    import asyncio
    import json as _json

    from tests.conftest import base_config_dict

    async def scenario():
        from aiohttp.test_utils import TestClient, TestServer

        from monte_carlo_retirement_tpu.hosts.sensitivity import (
            SensitivityResponse,
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
                "params": ["monthly_expenses", "inv1_returns_mean"],
            }
            resp = await client.post("/api/sensitivity", json=body)
            assert resp.status == 200, await resp.text()
            data = await resp.json()
            SensitivityResponse.model_validate(data)
            assert {r["param"] for r in data["rows"]} == set(body["params"])
            assert data["num_paths"] == 64

            # Unknown parameter -> 422
            bad = {**body, "params": ["not_a_field"]}
            resp = await client.post("/api/sensitivity", json=bad)
            assert resp.status == 422
            assert "not_a_field" in await resp.text()

            # Invalid base config -> 422
            bad_cfg = {**body, "config": {**base, "monthly_expenses": -1}}
            resp = await client.post("/api/sensitivity", json=bad_cfg)
            assert resp.status == 422

            # Non-object body -> 422
            resp = await client.post(
                "/api/sensitivity",
                data=_json.dumps([1, 2]),
                headers={"content-type": "application/json"},
            )
            assert resp.status == 422
        finally:
            await client.close()

    asyncio.run(scenario())


def test_sensitivity_stream_events():
    """POST /api/sensitivity/stream — the SSE variant the dashboard panel
    consumes: phase preamble, grid_chunk progress per device dispatch of
    the probe rows (chunk size forced tiny via the grid cell budget), then
    exactly one schema-valid result; 422s answer before any stream."""
    import asyncio
    import json as _json

    from tests.conftest import base_config_dict

    async def scenario():
        from aiohttp.test_utils import TestClient, TestServer

        from monte_carlo_retirement_tpu.hosts.sensitivity import (
            SensitivityResponse,
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
                "params": ["monthly_expenses", "inv1_returns_mean"],
            }
            # Force multiple row-chunks: the budget is cells = rows x paths
            # per dispatch, so 128 cells at 64 paths = 2 rows per chunk ->
            # 3 chunked dispatches for the 5 probe rows.
            os.environ["MCRT_GRID_CELL_BUDGET"] = "128"
            try:
                resp = await client.post("/api/sensitivity/stream", json=body)
                assert resp.status == 200
                text = (await resp.read()).decode()
            finally:
                del os.environ["MCRT_GRID_CELL_BUDGET"]
            events = [
                _json.loads(line.removeprefix("data: "))
                for line in text.splitlines()
                if line.startswith("data: ")
            ]
            types = [e["type"] for e in events]
            assert types[0] == "phase"
            chunks = [e for e in events if e["type"] == "grid_chunk"]
            assert len(chunks) >= 2  # real per-dispatch progress
            assert chunks[-1]["done"] == chunks[-1]["total"]
            assert types[-1] == "result"
            assert types.count("result") == 1
            data = events[-1]["data"]
            SensitivityResponse.model_validate(data)
            assert {r["param"] for r in data["rows"]} == set(body["params"])

            # The stream matches the plain POST's rows exactly (same CRN).
            resp = await client.post("/api/sensitivity", json=body)
            assert resp.status == 200
            assert (await resp.json())["rows"] == data["rows"]

            # Unknown parameter -> 422 before any stream begins.
            bad = {**body, "params": ["not_a_field"]}
            resp = await client.post("/api/sensitivity/stream", json=bad)
            assert resp.status == 422
            assert "not_a_field" in await resp.text()
        finally:
            await client.close()

    asyncio.run(scenario())


def test_quiet_warnings_nested_restores_level_once():
    """The warning-suppression context is reference-counted: overlapping
    (nested/threaded) uses must restore the original level exactly when the
    LAST user exits, not pin the logger at ERROR forever."""
    import logging

    from monte_carlo_retirement_tpu.engine.sensitivity import (
        _quiet_config_warnings,
    )

    cfg_log = logging.getLogger("mcrt.config")
    prev = cfg_log.level
    try:
        cfg_log.setLevel(logging.INFO)
        with _quiet_config_warnings():
            assert cfg_log.level == logging.ERROR
            with _quiet_config_warnings():
                assert cfg_log.level == logging.ERROR
            # inner exit must NOT restore yet (the outer user still needs quiet)
            assert cfg_log.level == logging.ERROR
        assert cfg_log.level == logging.INFO
    finally:
        cfg_log.setLevel(prev)


def test_ad_jit_cache_reuses_compiled_program():
    """A second sensitivity_ad call with the same trace-shaping arguments
    must hit the jit cache (no retrace of jacfwd through the scan); a seed
    change must also reuse it (the RNG key is a traced argument)."""
    from monte_carlo_retirement_tpu.engine import sensitivity as S

    cfg = _cfg()
    names = ["monthly_expenses"]
    S._AD_JIT_CACHE.clear()
    r1 = S.sensitivity_ad(cfg, W, num_paths=256, seed=SEED, params=names)
    assert len(S._AD_JIT_CACHE) == 1
    fn = next(iter(S._AD_JIT_CACHE.values()))
    r2 = S.sensitivity_ad(cfg, W, num_paths=256, seed=SEED + 1, params=names)
    assert len(S._AD_JIT_CACHE) == 1
    assert next(iter(S._AD_JIT_CACHE.values())) is fn
    # determinism sanity: same seed reproduces, different seed differs
    r3 = S.sensitivity_ad(cfg, W, num_paths=256, seed=SEED, params=names)
    assert r3 == r1
    assert r2["mean_final_balance"] != r1["mean_final_balance"]


def test_cli_grid_and_sensitivity_flags_conflict(tmp_path, monkeypatch):
    import json
    import sys

    from monte_carlo_retirement_tpu.hosts import cli

    monkeypatch.setattr(
        sys, "argv",
        ["cli", "x.json", "--grid", "g.json", "--sensitivity"],
    )
    with pytest.raises(SystemExit):
        cli.main()


def test_cli_sensitivity_mode(tmp_path, monkeypatch):
    """--sensitivity: derivative table from the CLI at an override month
    count, table logged, JSON payload written and schema-valid."""
    import json
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from monte_carlo_retirement_tpu.hosts.sensitivity import (
        SensitivityResponse,
    )
    from tests.conftest import base_config_dict

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(
        scenario="sens cli", retirement_years=3, num_simulations_main=64,
        seed=9,
    )))
    out_path = tmp_path / "sens_result.json"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path),
         "--sensitivity", "monthly_expenses,inv1_returns_mean",
         "--override", "12", "--json-out", str(out_path)],
    )
    cli.main()
    payload = SensitivityResponse.model_validate(
        json.loads(out_path.read_text())
    )
    assert {r.param for r in payload.rows} == {
        "monthly_expenses", "inv1_returns_mean"
    }
    assert payload.working_months == 12 and payload.num_paths == 64
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    assert logs and "Sensitivity: 2 parameters" in logs[0].read_text()
    assert not list(tmp_path.glob("*.png"))  # sensitivity mode plots nothing


def test_cli_sensitivity_mode_bad_param(tmp_path, monkeypatch):
    import json
    import sys

    from monte_carlo_retirement_tpu.hosts import cli
    from tests.conftest import base_config_dict

    cfg_path = tmp_path / "scenario.json"
    cfg_path.write_text(json.dumps(base_config_dict(seed=9)))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["cli", str(cfg_path), "--sensitivity", "not_a_field",
         "--override", "12"],
    )
    cli.main()  # must not raise; logs the validation error
    logs = list(tmp_path.glob("ret_proj_log_*.log"))
    assert logs and "Invalid sensitivity request" in logs[0].read_text()


def test_fd_full_default_set_runs():
    """The whole default tornado set in one call: rows align with the
    requested params and every derivative is finite."""
    cfg = _cfg()
    rows = sensitivity_fd(cfg, W, num_paths=256, seed=SEED)
    assert [r.param for r in rows] == DEFAULT_PARAMS
    for r in rows:
        assert math.isfinite(r.d_success)
        assert math.isfinite(r.d_median_final)
        assert math.isfinite(r.d_mean_final)
        assert r.success_sigma > 0.0
        assert r.practical_step > 0.0
