"""Round-5 measurement session (run ON the TPU, as a background task).

Stages (select with --stage, default all, comma-separated):
  bench16m   - 16M paths x 600 months chunked full statistics (EXACT band
               percentiles, the post-r4 code) via Engine.run(reduced=True);
               3 timed runs (first includes any cold compiles).
  probe10m   - 10M x 600 probe, single remote call (refresh of the r2 row).
  full10m    - 10M x 600 full statistics (chunked: 3 chunks), warm timing.
  longevity  - 1M x 600 serving-style reduced run with longevity on vs off:
               warm latency (min-of-3) + success-probability shift.

Prints one 'STAGE <name> <json>' line per stage; poll the log.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from monte_carlo_retirement_tpu.config import (  # noqa: E402
    Config,
    load_config_from_json,
)
from monte_carlo_retirement_tpu.engine.runner import (  # noqa: E402
    Engine,
    enable_persistent_compilation_cache,
)

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

RETIREMENT_YEARS = 50  # 600 months at working_months=0 (bench.py scenario)


def bench_config(**overrides) -> Config:
    raw = load_config_from_json(os.path.join(REPO, "config.json"))
    raw["retirement_years"] = RETIREMENT_YEARS
    raw["initial_balance"] = 1_500_000.0
    raw["monthly_expenses"] = 4_000.0
    raw["seed"] = 20260820
    raw.update(overrides)
    return Config(**raw)


def emit(stage: str, payload: dict) -> None:
    print(f"STAGE {stage} {json.dumps(payload)}", flush=True)


def stage_bench16m() -> None:
    eng = Engine(bench_config(), dtype=jnp.float32)
    n = 16 * 2**20
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        res = eng.run(0, n, stream="final", reduced=True)
        dt = time.perf_counter() - t0
        times.append(dt)
        emit(
            "bench16m_run",
            {
                "i": i,
                "seconds": round(dt, 3),
                "success_pct": round(res.success_probability, 4),
            },
        )
    emit(
        "bench16m",
        {
            "paths": n,
            "months": 600,
            "runs_s": [round(t, 3) for t in times],
            "warm_s": round(min(times[1:]), 3),
        },
    )


def stage_probe10m() -> None:
    from monte_carlo_retirement_tpu.engine.pallas_kernel import (
        pallas_probe,
        statics_from_config,
    )
    from monte_carlo_retirement_tpu.models.retirement import SimParams

    from monte_carlo_retirement_tpu.engine.pallas_kernel import pallas_simulate

    cfg = bench_config()
    params = SimParams.from_config(cfg, dtype=jnp.float32)
    statics = statics_from_config(cfg)
    n = 10_000_000

    @jax.jit
    def call(seed):
        succ, _ = pallas_simulate(
            params,
            0,
            seed,
            n_paths=n,
            retirement_years=RETIREMENT_YEARS,
            n_streams=params.n_streams,
            statics=statics,
        )
        return jnp.mean(succ[:n]) * 100.0

    float(call(1))  # warm
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        float(call(2 + i))  # varied seed, fetched output
        times.append(time.perf_counter() - t0)
    emit(
        "probe10m",
        {
            "paths": n,
            "months": 600,
            "single_call_ms": round(min(times) * 1000.0, 1),
            "path_months_per_s": round(n * 600 / min(times) / 1e9, 1),
        },
    )


def stage_full10m() -> None:
    eng = Engine(bench_config(), dtype=jnp.float32)
    n = 10_000_000
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        res = eng.run(0, n, stream="final", reduced=True)
        times.append(time.perf_counter() - t0)
    emit(
        "full10m",
        {
            "paths": n,
            "months": 600,
            "runs_s": [round(t, 3) for t in times],
            "warm_s": round(min(times[1:]), 3),
            "success_pct": round(res.success_probability, 4),
        },
    )


def stage_longevity() -> None:
    n = 1_000_000
    results = {}
    for label, longevity in (
        ("off", None),
        ("on", {"mode_age": 87.0, "dispersion_years": 10.0, "max_age": 115.0}),
    ):
        # Tighter draw than the bench scenario so outcomes are mixed and
        # the ruin-after-death relief is visible in the success rate.
        eng = Engine(
            bench_config(longevity=longevity, monthly_expenses=7_500.0),
            dtype=jnp.float32,
        )
        res = eng.run(0, n, stream="final", reduced=True)  # warm compile
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            res = eng.run(0, n, stream="final", reduced=True)
            times.append(time.perf_counter() - t0)
        results[label] = {
            "warm_s": round(min(times), 3),
            "success_pct": round(res.success_probability, 4),
            "median_final": round(res.median_final_successful, 0),
        }
        emit("longevity_run", {label: results[label]})
    emit(
        "longevity",
        {
            "paths": n,
            "months": 600,
            **results,
            "success_shift_pp": round(
                results["on"]["success_pct"] - results["off"]["success_pct"], 4
            ),
        },
    )


STAGES = {
    "bench16m": stage_bench16m,
    "probe10m": stage_probe10m,
    "full10m": stage_full10m,
    "longevity": stage_longevity,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="bench16m,probe10m,full10m,longevity")
    args = ap.parse_args()
    enable_persistent_compilation_cache()
    emit("devices", {"devices": [str(d) for d in jax.devices()]})
    for name in args.stage.split(","):
        t0 = time.perf_counter()
        STAGES[name.strip()]()
        emit(name.strip() + "_done", {"stage_s": round(time.perf_counter() - t0, 1)})
    emit("all", {"ok": True})


if __name__ == "__main__":
    main()
