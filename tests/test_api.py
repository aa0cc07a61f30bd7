"""API-layer tests: payload assembly, schema validation, HTTP + SSE."""

import asyncio
import json

import pandas as pd
import pytest

from monte_carlo_retirement_tpu.engine.simulator import RetirementMonteCarloSimulator
from monte_carlo_retirement_tpu.hosts.payload import build_result, dedupe_search_curve
from monte_carlo_retirement_tpu.hosts.schemas import SimulationResponse
from tests.conftest import make_config


def test_build_result_keeps_success_flags_and_zero_balance_median():
    """The histogram cohort must match the backend successful-path cohort,
    including successful income-only paths that finish at $0."""
    config = make_config(num_simulations_main=3, retirement_years=1)
    summary = pd.DataFrame(
        {
            "Start Balance": [100.0, 100.0, 100.0],
            "Final Balance": [0.0, 50.0, 25.0],
            "Success": [True, True, False],
            "YearsToRuin": [float("nan"), float("nan"), 0.5],
            "First Year Gross Withdrawal": [0.0, 10.0, 10.0],
            "First Year Real Gross Withdrawal": [0.0, 10.0, 10.0],
            "Inflation At Retirement": [1.0, 1.0, 1.0],
        }
    )

    class FakeSimulator:
        def run_monte_carlo_simulations(self, **_kwargs):
            return summary, None, None, None, None, None, None

    result = build_result(config, FakeSimulator(), required_w_months=0, search_curve=[])
    SimulationResponse.model_validate(result)

    assert result["summary"]["success_probability"] == pytest.approx(66.67)
    # Additive extension: the estimate's own binomial one-sigma error,
    # sqrt(p(1-p)/n)*100 over the run's path count (rounded to 3 decimals).
    assert result["summary"]["success_probability_sigma"] == pytest.approx(
        ((2 / 3) * (1 / 3) / 3) ** 0.5 * 100.0, abs=5e-3
    )
    assert result["summary"]["median_final_balance_successful"] == pytest.approx(25.0)
    assert result["histogram"]["final_balances"] == [0.0, 50.0, 25.0]
    assert result["histogram"]["success_flags"] == [True, True, False]
    assert result["ruin_histogram"]["failure_count"] == 1
    assert result["ruin_histogram"]["years_to_ruin"] == [0.5]


def test_build_result_preserves_exact_fractional_timeline():
    """API rounding must not shift 13-month retirement markers to 1.1 years."""
    config = make_config(
        num_simulations_main=2, retirement_years=1, monthly_expenses=0.0, seed=5
    )
    simulator = RetirementMonteCarloSimulator(config)
    result = build_result(
        config,
        simulator,
        required_w_months=13,
        search_curve=[
            {"working_months": 13, "working_years": 1.1, "probability": 100.0}
        ],
    )
    SimulationResponse.model_validate(result)

    retirement_year = 13 / 12
    assert result["trajectory"]["years"] == pytest.approx(
        [0.0, 1.0, retirement_year, retirement_year + 1]
    )
    assert result["withdrawal_rate"]["years"][0] == pytest.approx(retirement_year)
    assert result["reference_lines"][0]["year"] == pytest.approx(retirement_year)
    assert result["summary"]["working_period_is_estimate"] is True


def test_dedupe_search_curve_keeps_latest_sorted():
    points = [
        {"working_months": 24, "probability": 90.0},
        {"working_months": 12, "probability": 50.0},
        {"working_months": 24, "probability": 92.0},
    ]
    deduped = dedupe_search_curve(points)
    assert [p["working_months"] for p in deduped] == [12, 24]
    assert deduped[1]["probability"] == 92.0


def _client_fixture():
    from aiohttp.test_utils import TestClient, TestServer

    from monte_carlo_retirement_tpu.hosts.server import create_app

    return TestClient(TestServer(create_app()))


def _run(coro):
    return asyncio.run(coro)  # closes the loop; new_event_loop leaked fds


def test_health_validate_and_default_config_endpoints():
    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get("/api/health")
            assert resp.status == 200
            assert await resp.json() == {"status": "ok"}

            resp = await client.get("/api/config/default")
            assert resp.status == 200
            default = await resp.json()
            assert "initial_balance" in default

            cfg = make_config().model_dump(by_alias=True)
            resp = await client.post("/api/validate", json={"config": cfg})
            assert resp.status == 200
            body = await resp.json()
            assert body["valid"] is True and body["scenario"] == "test"

            resp = await client.post(
                "/api/validate", json={"config": {"scenario": "broken"}}
            )
            assert resp.status == 422
        finally:
            await client.close()

    _run(scenario())


def test_simulate_endpoint_with_override():
    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg = make_config(
                num_simulations_main=2, retirement_years=1, monthly_expenses=0.0,
                seed=8,
            ).model_dump(by_alias=True)
            resp = await client.post(
                "/api/simulate",
                json={"config": cfg, "working_months_override": 13},
            )
            assert resp.status == 200
            parsed = SimulationResponse.model_validate(await resp.json())
            assert parsed.summary.required_working_months == 13
            assert parsed.summary.working_period_is_estimate is False
        finally:
            await client.close()

    _run(scenario())


def test_streaming_endpoint_emits_schema_valid_result():
    """The SSE endpoint must deliver exactly one schema-valid result event."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg = make_config(
                num_simulations_main=2, retirement_years=1, monthly_expenses=0.0,
                seed=8,
            ).model_dump(by_alias=True)
            resp = await client.post(
                "/api/simulate/stream",
                json={"config": cfg, "working_months_override": 13},
            )
            assert resp.status == 200
            text = await resp.text()
        finally:
            await client.close()

        events = [
            json.loads(line.removeprefix("data: "))
            for line in text.splitlines()
            if line.startswith("data: ")
        ]
        result_events = [e for e in events if e.get("type") == "result"]
        assert len(result_events) == 1
        parsed = SimulationResponse.model_validate(result_events[0]["data"])
        assert parsed.summary.required_working_months == 13
        assert parsed.summary.working_period_is_estimate is False
        phases = [e for e in events if e.get("type") == "phase"]
        assert phases and phases[0]["phase"] == "final_sim"

    _run(scenario())


def test_streaming_endpoint_runs_search_and_emits_progress():
    """Without an override the SSE stream carries search progress events."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg = make_config(
                initial_balance=50_000.0,
                monthly_contribution=4_000.0,
                monthly_expenses=3_000.0,
                retirement_years=5,
                num_simulations_search=16,
                num_simulations_main=16,
                target_probability=80.0,
                seed=3,
            ).model_dump(by_alias=True)
            resp = await client.post("/api/simulate/stream", json={"config": cfg})
            assert resp.status == 200
            text = await resp.text()
        finally:
            await client.close()

        events = [
            json.loads(line.removeprefix("data: "))
            for line in text.splitlines()
            if line.startswith("data: ")
        ]
        kinds = [e["type"] for e in events]
        assert "search_iter" in kinds
        assert "search_complete" in kinds
        assert kinds[-1] == "result"
        result = [e for e in events if e["type"] == "result"][0]
        parsed = SimulationResponse.model_validate(result["data"])
        assert parsed.search_curve is not None
        assert parsed.summary.working_period_is_estimate is True

    _run(scenario())


def test_stream_client_disconnect_leaves_server_healthy():
    """Closing the SSE connection mid-stream must not wedge the server: the
    worker thread runs to completion in the background, and the server keeps
    answering subsequent requests normally."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg = make_config(
                initial_balance=50_000.0,
                monthly_contribution=4_000.0,
                monthly_expenses=3_000.0,
                retirement_years=5,
                num_simulations_search=16,
                num_simulations_main=16,
                target_probability=80.0,
                seed=3,
            ).model_dump(by_alias=True)
            resp = await client.post("/api/simulate/stream", json={"config": cfg})
            assert resp.status == 200
            # Read one chunk then abort the connection mid-search.
            await resp.content.read(16)
            resp.close()

            health = await client.get("/api/health")
            assert health.status == 200

            # A fresh request on the same server still completes end-to-end.
            resp2 = await client.post(
                "/api/simulate/stream",
                json={"config": cfg, "working_months_override": 13},
            )
            assert resp2.status == 200
            text = await resp2.text()
        finally:
            await client.close()

        events = [
            json.loads(line.removeprefix("data: "))
            for line in text.splitlines()
            if line.startswith("data: ")
        ]
        assert [e for e in events if e.get("type") == "result"]

    _run(scenario())


def test_build_result_caps_raw_arrays_above_threshold(monkeypatch):
    """Above MCRT_MAX_RAW_PATHS the payload must carry pre-binned aggregates
    instead of per-path arrays, with identical binning semantics to the
    dashboard's client-side histogram."""
    import numpy as np

    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10")
    n = 40
    rng = np.random.default_rng(0)
    finals = np.concatenate([rng.uniform(0, 100, n - 4), np.zeros(4)])
    success = np.concatenate([np.ones(n - 4, bool), np.zeros(4, bool)])
    ruin_years = [0.25, 0.25, 1.5, 3.0]
    ytr = np.full(n, np.nan)
    ytr[~success] = ruin_years
    config = make_config(num_simulations_main=n, retirement_years=5)
    summary = pd.DataFrame(
        {
            "Start Balance": np.full(n, 100.0),
            "Final Balance": finals,
            "Success": success,
            "YearsToRuin": ytr,
            "First Year Gross Withdrawal": np.full(n, 10.0),
            "First Year Real Gross Withdrawal": np.full(n, 10.0),
            "Inflation At Retirement": np.ones(n),
        }
    )

    class FakeSimulator:
        def run_monte_carlo_simulations(self, **_kwargs):
            return summary, None, None, None, None, None, None

    result = build_result(config, FakeSimulator(), required_w_months=0)
    SimulationResponse.model_validate(result)

    hist = result["histogram"]
    assert hist["final_balances"] == [] and hist["success_flags"] == []
    binned = hist["binned"]
    assert binned["success_count"] == n - 4
    assert binned["total_paths"] == n
    assert sum(binned["counts"]) == n - 4
    assert len(binned["bin_edges"]) == 61
    wins = np.sort(finals[success])
    assert binned["median"] == pytest.approx(wins[len(wins) // 2], abs=0.01)
    assert binned["bin_edges"][0] == pytest.approx(wins.min(), abs=0.01)
    assert binned["bin_edges"][-1] == pytest.approx(wins.max(), abs=0.01)

    ruin = result["ruin_histogram"]
    assert ruin["years_to_ruin"] == []
    assert ruin["failure_count"] == 4
    # Dashboard semantics: maxYear = ceil(max(3.0, 1)) = 3 bins; the 3.0
    # value clamps into the last bin [2, 3) — year0: 2, year1: 1, year2: 1.
    assert ruin["year_counts"] == [2, 1, 1]


def test_build_result_below_cap_keeps_reference_shape(monkeypatch):
    """Below the cap the wire format is byte-identical to the reference's."""
    monkeypatch.setenv("MCRT_MAX_RAW_PATHS", "10")
    config = make_config(num_simulations_main=3, retirement_years=1)
    summary = pd.DataFrame(
        {
            "Start Balance": [100.0, 100.0, 100.0],
            "Final Balance": [0.0, 50.0, 25.0],
            "Success": [True, True, False],
            "YearsToRuin": [float("nan"), float("nan"), 0.5],
            "First Year Gross Withdrawal": [0.0, 10.0, 10.0],
            "First Year Real Gross Withdrawal": [0.0, 10.0, 10.0],
            "Inflation At Retirement": [1.0, 1.0, 1.0],
        }
    )

    class FakeSimulator:
        def run_monte_carlo_simulations(self, **_kwargs):
            return summary, None, None, None, None, None, None

    result = build_result(config, FakeSimulator(), required_w_months=0)
    SimulationResponse.model_validate(result)
    assert result["histogram"]["final_balances"] == [0.0, 50.0, 25.0]
    assert "binned" not in result["histogram"]
    assert result["ruin_histogram"]["years_to_ruin"] == [0.5]
    assert result["ruin_histogram"]["year_counts"] is None


def test_analysis_meta_endpoint():
    """GET /api/analysis/meta — discovery of the analysis surfaces: field
    bounds (unbounded hi is null), objectives, the default tornado set."""
    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get("/api/analysis/meta")
            assert resp.status == 200
            meta = await resp.json()
            by_name = {p["name"]: p for p in meta["parameters"]}
            assert by_name["allocation_inv1_pct"] == {
                "name": "allocation_inv1_pct", "lo": 0.0, "hi": 1.0,
                "kind": "rate",
            }
            assert by_name["monthly_expenses"]["hi"] is None
            assert by_name["equity_inflation_correlation"]["lo"] == -1.0
            assert "p5_final_balance" in meta["objectives"]
            assert "success_probability" in meta["objectives"]
            assert "monthly_expenses" in meta["default_sensitivity_params"]
            assert meta["max_joint_rows"] == 257
        finally:
            await client.close()

    _run(scenario())


def test_concurrent_simulate_requests():
    """Two overlapping /api/simulate requests with different scenarios must
    both succeed with their own results — per-request engines, no shared
    mutable state (the reference re-created its simulator per request too)."""
    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg_a = make_config(
                num_simulations_main=4, retirement_years=1,
                monthly_expenses=0.0, seed=11,
            ).model_dump(by_alias=True)
            cfg_b = make_config(
                num_simulations_main=4, retirement_years=1,
                monthly_expenses=50_000.0, initial_balance=1_000.0, seed=12,
            ).model_dump(by_alias=True)
            resp_a, resp_b = await asyncio.gather(
                client.post(
                    "/api/simulate",
                    json={"config": cfg_a, "working_months_override": 12},
                ),
                client.post(
                    "/api/simulate",
                    json={"config": cfg_b, "working_months_override": 12},
                ),
            )
            assert resp_a.status == 200 and resp_b.status == 200
            a = SimulationResponse.model_validate(await resp_a.json())
            b = SimulationResponse.model_validate(await resp_b.json())
            assert a.summary.success_probability == 100.0  # zero expenses
            assert b.summary.success_probability == 0.0    # ruinous expenses
        finally:
            await client.close()

    _run(scenario())


def test_engine_pool_serialization_is_transparent(monkeypatch):
    """With MCRT_MAX_CONCURRENT_RUNS effectively 1 (a one-thread engine
    pool), overlapping requests queue for the device instead of
    dispatching together — and still both return their own correct
    results. Verifies engine work actually lands on the bounded pool."""
    import concurrent.futures

    from monte_carlo_retirement_tpu.hosts import server as server_mod

    acquired = []

    class _SpyPool(concurrent.futures.ThreadPoolExecutor):
        def submit(self, fn, *args, **kwargs):
            acquired.append(1)
            return super().submit(fn, *args, **kwargs)

    monkeypatch.setattr(
        server_mod, "_ENGINE_POOL",
        _SpyPool(max_workers=1, thread_name_prefix="mcrt-engine-test"),
    )

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg_a = make_config(
                num_simulations_main=4, retirement_years=1,
                monthly_expenses=0.0, seed=11,
            ).model_dump(by_alias=True)
            cfg_b = make_config(
                num_simulations_main=4, retirement_years=1,
                monthly_expenses=50_000.0, initial_balance=1_000.0, seed=12,
            ).model_dump(by_alias=True)
            resp_a, resp_b = await asyncio.gather(
                client.post(
                    "/api/simulate",
                    json={"config": cfg_a, "working_months_override": 12},
                ),
                client.post(
                    "/api/simulate",
                    json={"config": cfg_b, "working_months_override": 12},
                ),
            )
            assert resp_a.status == 200 and resp_b.status == 200
            a = SimulationResponse.model_validate(await resp_a.json())
            b = SimulationResponse.model_validate(await resp_b.json())
            assert a.summary.success_probability == 100.0
            assert b.summary.success_probability == 0.0
        finally:
            await client.close()

    _run(scenario())
    assert len(acquired) == 2  # both requests ran on the engine pool


def test_build_result_without_success_column_uses_balance_fallback():
    """Summary frames lacking a Success column (the reference's documented
    fallback, backend/server.py + simulation.py:1130-1136) must flow through
    the whole payload — including the histogram success flags — using the
    final-balance>eps mask rather than crashing."""
    config = make_config(num_simulations_main=3, retirement_years=1)
    summary = pd.DataFrame(
        {
            "Start Balance": [100.0, 100.0, 100.0],
            "Final Balance": [0.0, 50.0, 25.0],
            "YearsToRuin": [0.25, float("nan"), float("nan")],
            "First Year Gross Withdrawal": [10.0, 10.0, 10.0],
            "First Year Real Gross Withdrawal": [10.0, 10.0, 10.0],
            "Inflation At Retirement": [1.0, 1.0, 1.0],
        }
    )

    class FakeSimulator:
        def run_monte_carlo_simulations(self, **_kwargs):
            return summary, None, None, None, None, None, None

    result = build_result(config, FakeSimulator(), required_w_months=0)
    SimulationResponse.model_validate(result)
    assert result["summary"]["success_probability"] == pytest.approx(66.67)
    assert result["histogram"]["success_flags"] == [False, True, True]


def test_malformed_json_body_gets_400_with_cors_headers():
    """A body that fails JSON parsing must yield a 400 (not an opaque
    header-less 500) and still carry CORS headers so browsers can read it."""
    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.post(
                "/api/simulate",
                data=b"{not json",
                headers={"Content-Type": "application/json"},
            )
            assert resp.status == 400
            assert resp.headers.get("Access-Control-Allow-Origin") == "*"
            body = await resp.json()
            assert "Malformed JSON" in body["detail"]
        finally:
            await client.close()

    _run(scenario())


def test_non_object_json_body_gets_422():
    """Valid JSON that is not an object ('[]', '5', '\"x\"') must be a 422
    like the reference server, not a TypeError-driven 500."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            for path in ("/api/validate", "/api/simulate"):
                for payload in (b"[]", b"5", b'"x"'):
                    resp = await client.post(
                        path, data=payload,
                        headers={"Content-Type": "application/json"},
                    )
                    assert resp.status == 422, (path, payload, resp.status)
        finally:
            await client.close()

    _run(scenario())


def test_cors_reflects_origin_for_credentialed_clients():
    """With an Origin header the server must reflect it (wildcard +
    allow-credentials is spec-forbidden and browsers reject it), matching
    the reference's Starlette CORSMiddleware behavior."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get(
                "/api/health", headers={"Origin": "http://localhost:3000"}
            )
            assert resp.status == 200
            assert (
                resp.headers.get("Access-Control-Allow-Origin")
                == "http://localhost:3000"
            )
            assert resp.headers.get("Access-Control-Allow-Credentials") == "true"
        finally:
            await client.close()

    _run(scenario())


def test_corrupt_default_config_is_a_server_error(monkeypatch, tmp_path):
    """A corrupt SERVER-side config.json is a 500 from /api/config/default,
    not a 400 blaming the client's (nonexistent) request body."""
    from monte_carlo_retirement_tpu.hosts import server as server_mod

    bad = tmp_path / "config.json"
    bad.write_text("{not json")
    monkeypatch.setattr(server_mod, "DEFAULT_CONFIG_PATH", str(bad))

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get("/api/config/default")
            assert resp.status == 500
            assert "default config" in (await resp.text()).lower()
        finally:
            await client.close()

    _run(scenario())


def test_openapi_spec_covers_every_api_route_and_docs_render():
    """/openapi.json + /docs — the reference's FastAPI host serves both by
    default; parity for this aiohttp host. The documented path set is
    pinned to the RUNNING router, so a new endpoint cannot land
    undocumented, and every $ref must resolve inside components."""
    from monte_carlo_retirement_tpu.hosts.server import create_app

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get("/openapi.json")
            assert resp.status == 200
            spec = await resp.json()
            assert spec["openapi"].startswith("3.")

            registered = {
                r.resource.canonical
                for r in create_app().router.routes()
                if r.method in ("GET", "POST")
                and r.resource is not None
                and r.resource.canonical.startswith("/api/")
            }
            assert set(spec["paths"]) == registered

            components = spec["components"]["schemas"]

            def walk(node):
                if isinstance(node, dict):
                    ref = node.get("$ref")
                    if isinstance(ref, str):
                        assert ref.rsplit("/", 1)[-1] in components, ref
                    for value in node.values():
                        walk(value)
                elif isinstance(node, list):
                    for value in node:
                        walk(value)

            walk(spec)
            # Error responses must be documented in the shape the error
            # middleware actually serializes: JSON {"detail": ...}
            # (FastAPI's shape; test_api_errors_are_json_detail_bodies pins
            # the live bytes — this pins the spec to the same contract).
            for path, methods in spec["paths"].items():
                for method, op in methods.items():
                    for code in ("400", "422", "500"):
                        err = op["responses"][code]
                        content = err["content"]
                        assert list(content) == ["application/json"], (
                            path, method, code, list(content))
                        schema = content["application/json"]["schema"]
                        assert "detail" in schema.get("properties", {}), (
                            path, method, code)
                        assert "detail" in schema.get("required", []), (
                            path, method, code)
            # The models the handlers actually validate with are the ones
            # documented (drift here would mean hand-written schemas).
            for name in (
                "SimulationRequest", "SimulationResponse", "GridRequest",
                "GridResponse", "SensitivityRequest", "SensitivityResponse",
                "OptimizeRequest", "OptimizeResponse", "OptimizeJointResponse",
                "Config",
            ):
                assert name in components, name

            resp = await client.get("/docs")
            assert resp.status == 200
            assert resp.content_type == "text/html"
            html = await resp.text()
            for path in spec["paths"]:
                assert path in html
            for needle in ("SimulationRequest", "text/event-stream",
                           "optimize_round", "/openapi.json"):
                assert needle in html
        finally:
            await client.close()

    _run(scenario())


def test_api_errors_are_json_detail_bodies():
    """FastAPI error wire shape: every /api error body is JSON
    {"detail": ...} — the reference SPA reads `err.detail`
    (reference frontend/src/api.js:30-31), so text/plain errors would
    lose the message for reference-built clients."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.post(
                "/api/validate", json={"config": {"initial_balance": -1.0}}
            )
            assert resp.status == 422
            assert resp.content_type == "application/json"
            body = await resp.json()
            assert "Invalid configuration" in body["detail"]

            resp = await client.post("/api/simulate", json={})
            assert resp.status == 422
            assert (await resp.json())["detail"]

            resp = await client.post(
                "/api/optimize",
                json={"config": make_config().model_dump(by_alias=True),
                      "working_months": 0, "param": "no_such_field"},
            )
            assert resp.status == 422
            assert "no_such_field" in (await resp.json())["detail"]

            # Malformed JSON short-circuits in the middleware — same shape.
            resp = await client.post(
                "/api/validate",
                data="{not json",
                headers={"content-type": "application/json"},
            )
            assert resp.status == 400
            assert "Malformed" in (await resp.json())["detail"]
        finally:
            await client.close()

    _run(scenario())


def test_large_request_bodies_are_not_rejected_at_the_transport():
    """aiohttp defaults to a 1 MiB body cap; the reference's FastAPI host
    has none, and a MAX_GRID_VARIANTS-scale grid request can exceed 1 MiB.
    A >1 MiB body must reach the handler (here: a 422 for one variant too
    many — NOT a 413 from the transport)."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cfg = make_config().model_dump(by_alias=True)
            variants = [
                {"name": f"variant-{i:05d}-" + "x" * 280, "overrides": {}}
                for i in range(4097)  # MAX_GRID_VARIANTS + 1
            ]
            body = {"config": cfg, "variants": variants, "working_months": 0}
            assert len(json.dumps(body)) > 1024 * 1024
            resp = await client.post("/api/grid", json=body)
            assert resp.status == 422
            assert "variant" in (await resp.json())["detail"].lower()
        finally:
            await client.close()

    _run(scenario())


def test_unmatched_api_paths_answer_as_api_errors():
    """Unknown /api paths are a JSON 404 and wrong methods a JSON 405 with
    Allow — the FastAPI taxonomy — instead of falling through to the
    frontend static root's opaque octet-stream 404."""

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            resp = await client.get("/api/no-such-endpoint")
            assert resp.status == 404
            assert (await resp.json())["detail"] == "Not Found"

            resp = await client.get("/api/simulate")
            assert resp.status == 405
            assert (await resp.json())["detail"] == "Method Not Allowed"
            assert "POST" in resp.headers.get("Allow", "")

            # Trailing-slash variants of real routes 307-redirect
            # (FastAPI's redirect_slashes), preserving method + body.
            resp = await client.post(
                "/api/validate/",
                json={"config": make_config().model_dump(by_alias=True)},
                allow_redirects=True,
            )
            assert resp.status == 200
            assert (await resp.json())["valid"] is True

            # Statics are untouched by the fallback.
            resp = await client.get("/styles.css")
            assert resp.status == 200 and resp.content_type == "text/css"
        finally:
            await client.close()

    _run(scenario())


def test_request_validation_fuzz_never_500s():
    """Adversarial request bodies across every POST endpoint must answer
    4xx (422/400/404), NEVER 5xx — request validation is total."""
    import random

    rng = random.Random(20260818)
    base = make_config().model_dump(by_alias=True)

    # Guaranteed-invalid single-field mutations (each violates a pydantic
    # bound or type, or removes a required field).
    mutations = [
        {"initial_balance": -1.0},
        {"monthly_expenses": "not-a-number"},
        {"retirement_years": 0},
        {"current_age": 300.0},
        {"allocation_inv1_pct": 2.0},
        {"target_probability": 150.0},
        {"inv1_returns_volatility": -0.1},
        {"inv1_returns_mean": None},
        {"other_income_streams": [{"monthly_amount_today": -5}]},
        {"monthly_contribution": [1.0]},
    ]

    def corrupt(cfg):
        bad = dict(cfg)
        m = rng.choice(mutations)
        if rng.random() < 0.3:
            bad.pop("monthly_expenses")  # a required field
        bad.update(m)
        return bad

    bodies = []
    for _ in range(8):
        bodies.append({"config": corrupt(base)})
    bodies += [
        {},
        {"config": None},
        {"config": []},
        {"config": base, "working_months_override": -3},
        {"config": base, "working_months_override": "soon"},
        {"config": base, "include_raw_paths": "yes-please"},
    ]
    grid_bodies = [
        {"config": base, "variants": [], "working_months": 0},
        {"config": base, "variants": [{"overrides": {}}],
         "working_months": [0, 1]},
        {"config": base, "variants": [{"overrides": {"seed": "x"}}],
         "working_months": 0},
        {"config": corrupt(base), "variants": [{"overrides": {}}],
         "working_months": 0},
        {"config": base, "variants": [{"overrides": {}}],
         "working_months": 0, "num_paths": 0},
    ]
    sensitivity_bodies = [
        {"config": base, "working_months": 0, "params": ["nope"]},
        {"config": base, "working_months": 0,
         "params": ["monthly_expenses", "monthly_expenses"]},
        {"config": base, "working_months": -1},
        {"config": base, "working_months": 0, "num_paths": 0},
        {"config": base, "working_months": 0, "rel_step": 0.0},
    ]
    optimize_bodies = [
        {"config": base, "working_months": 0, "params": ["nope"]},
        {"config": base, "working_months": 0, "param": "monthly_expenses",
         "lo": 5.0, "hi": 1.0},
        {"config": base, "working_months": 0, "param": "monthly_expenses",
         "points": 1},
        {"config": base, "working_months": -1},
        {"config": base, "working_months": 0,
         "params": [{"name": "monthly_expenses"}] * 3},
        {"config": base, "working_months": 0, "param": "monthly_expenses",
         "objective": "nope"},
        {"config": base, "working_months": 0},  # neither param nor params
    ]

    async def scenario():
        client = _client_fixture()
        await client.start_server()
        try:
            cases = (
                [("/api/simulate", b) for b in bodies]
                + [("/api/validate", b) for b in bodies]
                + [("/api/grid", b) for b in grid_bodies]
                + [("/api/sensitivity", b) for b in sensitivity_bodies]
                + [("/api/optimize", b) for b in optimize_bodies]
            )
            for path, body in cases:
                resp = await client.post(path, json=body)
                assert 400 <= resp.status < 500, (
                    f"{path} {body} -> {resp.status}: "
                    f"{(await resp.text())[:200]}"
                )
                assert (await resp.json())["detail"], (path, body)
        finally:
            await client.close()

    _run(scenario())
