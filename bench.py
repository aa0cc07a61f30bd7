"""Headline benchmark: 1M paths x 600-month horizon, wall-clock per run.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <50ms / value>}

North-star target (BASELINE.md): < 50 ms per run on a single TPU chip;
``vs_baseline`` > 1 means the target is beaten.

Workload: the default scenario (realized-gains taxation, monthly tax-aware
rebalance, correlated inflation, one effective income stream in the
waterfall — the config's second, zero-amount stream is pruned) at
working_months=0 with retirement_years=50 — exactly 600 simulated months per
path — sized so paths survive the whole horizon (no early-ruin shortcut
flatters the number). Runs on the Pallas VMEM-resident kernel, includes the
on-device success reduction, excludes compilation (persistent cache +
warmup): steady-state latency is what production serving sees.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PATHS = 1_000_000
RETIREMENT_YEARS = 50  # 600 months
REPEATS = 5
INNER_RUNS = 10
# Full-statistics runs carry ~0.8 GB of HBM series each; chain fewer per
# dispatch so concurrent live buffers stay well inside HBM.
FULL_INNER_RUNS = 5
# Secondary target (VERDICT r2 item 1): full statistics — every percentile
# table, histogram and bin the dashboard needs, reduced on device — in
# <= 150 ms device time at the same 1M x 600 scale.
FULL_TARGET_MS = 150.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from monte_carlo_retirement_tpu.config import Config, load_config_from_json
    from monte_carlo_retirement_tpu.engine.pallas_kernel import (
        pallas_simulate,
        statics_from_config,
    )
    from monte_carlo_retirement_tpu.engine.runner import (
        enable_persistent_compilation_cache,
    )
    from monte_carlo_retirement_tpu.models.retirement import SimParams

    enable_persistent_compilation_cache()

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config.json")
    raw = load_config_from_json(cfg_path)
    raw["retirement_years"] = RETIREMENT_YEARS
    # Retire at T=0 with a sustainable draw so the full 600 months simulate
    # (the bundled accumulation scenario would ruin out within ~3 years).
    raw["initial_balance"] = 1_500_000.0
    raw["monthly_expenses"] = 4_000.0
    config = Config(**raw)
    params = SimParams.from_config(config, dtype=jnp.float32)
    statics = statics_from_config(config)

    @jax.jit
    def run(seed):
        succ, _final = pallas_simulate(
            params,
            0,
            seed,
            n_paths=N_PATHS,
            retirement_years=RETIREMENT_YEARS,
            n_streams=params.n_streams,
            statics=statics,
        )
        # Reduce on device: fetching the 4 MB success vector through the
        # host link would dominate the measurement.
        return jnp.mean(succ[:N_PATHS]) * 100.0

    @jax.jit
    def run_batch(seed0):
        # INNER_RUNS complete, independent runs (distinct seeds) chained in
        # one dispatch: the per-run device time is measured without the
        # remote-tunnel round-trip (~26 ms/call on this harness), which a
        # colocated production host does not pay. Results are summed so no
        # run can be dead-code-eliminated.
        total = jnp.float32(0.0)
        for i in range(INNER_RUNS):
            total = total + run(seed0 + i)
        return total

    # ---- metric 2: full statistics, reduced on device ------------------
    # The serving path: the Pallas full kernel plus EVERY dashboard
    # reduction (trajectory/WR/final percentiles, 60-bin histogram, ruin
    # bins, medians) in one compiled program; only scalars leave the chip.
    from monte_carlo_retirement_tpu.engine.runner import (
        _pallas_full_reduced_jit,
    )

    traj_len = 1 + (RETIREMENT_YEARS * 12) // 12  # working_months = 0
    sample_idx = jnp.arange(5, dtype=jnp.int32)

    def run_full(seed):
        summary, bins = _pallas_full_reduced_jit(
            params,
            jnp.asarray(0, dtype=jnp.int32),
            seed,
            sample_idx,
            n_paths=N_PATHS,
            retirement_years=RETIREMENT_YEARS,
            n_streams=params.n_streams,
            statics=statics,
            traj_len=traj_len,
        )
        # Keep every reduction live (XLA would dead-code-eliminate unused
        # percentile tables); mask non-finite sentinels (-inf ruin_max on a
        # no-failure batch, NaN medians) so the checksum stays finite.
        total = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves((summary, bins)):
            leaf = leaf.astype(jnp.float32)
            total = total + jnp.sum(
                jnp.where(jnp.isfinite(leaf), leaf, 0.0)
            )
        return total

    @jax.jit
    def run_full_batch(seed0):
        total = jnp.float32(0.0)
        for i in range(FULL_INNER_RUNS):
            total = total + run_full(seed0 + i)
        return total

    # Warmup (compile; served from the persistent cache when available).
    rate = float(run(0))
    float(run_batch(0))
    float(run_full_batch(0))

    times = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        float(run_batch(1 + rep * INNER_RUNS))  # scalar fetch = completion
        times.append((time.perf_counter() - t0) * 1000.0 / INNER_RUNS)
    # Min-of-N: the tunnel adds multi-ms queue noise per dispatch; the
    # minimum is the reproducible per-run device latency.
    value = min(times)

    full_times = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        float(run_full_batch(1000 + rep * FULL_INNER_RUNS))
        full_times.append(
            (time.perf_counter() - t0) * 1000.0 / FULL_INNER_RUNS
        )
    full_value = min(full_times)

    print(
        json.dumps(
            {
                "metric": "1M paths x 600-month retirement MC, single chip",
                "value": round(value, 3),
                "unit": "ms",
                "vs_baseline": round(50.0 / value, 3),
                "success_rate_pct": round(rate, 2),
                "full_stats_ms": round(full_value, 3),
                "full_stats_target_ms": FULL_TARGET_MS,
                "full_stats_vs_target": round(FULL_TARGET_MS / full_value, 3),
                "single_call_note": (
                    "per-run device time; one remote dispatch covers "
                    f"{INNER_RUNS} probe runs / {FULL_INNER_RUNS} full-stats "
                    "runs"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
