"""Headline benchmark: 1M paths x 600-month horizon, wall-clock per run.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <50ms / value>}

North-star target (BASELINE.md): < 50 ms per run on a single TPU chip.
``vs_baseline`` > 1 means the target is beaten. The run is the full default
scenario (config.json: two income streams, realized-gains taxation, monthly
rebalance, correlated inflation) at working_months=0, retirement_years=50 —
i.e. exactly 600 simulated months per path — including the on-device success
reduction. Compile time is excluded (persistent cache + warmup); the steady
state is what production serving sees.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PATHS = 1_000_000
RETIREMENT_YEARS = 50  # 600 months
REPEATS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from monte_carlo_retirement_tpu.config import Config
    from monte_carlo_retirement_tpu.engine.kernel import simulate_paths
    from monte_carlo_retirement_tpu.engine.runner import (
        enable_persistent_compilation_cache,
    )
    from monte_carlo_retirement_tpu.config import load_config_from_json
    from monte_carlo_retirement_tpu.models.retirement import SimParams
    from monte_carlo_retirement_tpu.ops.shocks import stream_keys

    enable_persistent_compilation_cache()

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "config.json")
    raw = load_config_from_json(cfg_path)
    raw["retirement_years"] = RETIREMENT_YEARS
    config = Config(**raw)
    dtype = jnp.float32
    params = SimParams.from_config(config, dtype=dtype)
    _, final_key = stream_keys(2026)

    t_scan = RETIREMENT_YEARS * 12  # W=0: exactly 600 months

    def run(w):
        outs = simulate_paths(
            params,
            w,
            final_key,
            n_paths=N_PATHS,
            t_scan=t_scan,
            retirement_years=RETIREMENT_YEARS,
            traj_len=0,
            dtype=dtype,
        )
        return (
            jnp.mean(outs.success.astype(jnp.float32)) * 100.0,
            jnp.percentile(outs.final_balance, 50.0),
        )

    run_jit = jax.jit(run)
    w = jnp.asarray(0, dtype=jnp.int32)

    # Warmup (compile; served from the persistent cache when available).
    prob, median = jax.block_until_ready(run_jit(w))

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        jax.block_until_ready(run_jit(w))
        times.append((time.perf_counter() - t0) * 1000.0)
    value = sorted(times)[len(times) // 2]

    if os.environ.get("MCRT_BENCH_PIPELINED"):
        t0 = time.perf_counter()
        outs = [run_jit(w) for _ in range(10)]
        jax.block_until_ready(outs)
        per = (time.perf_counter() - t0) * 1000.0 / 10
        print(f"# pipelined x10: {per:.1f} ms/run", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "1M paths x 600-month retirement MC, single chip",
                "value": round(value, 3),
                "unit": "ms",
                "vs_baseline": round(50.0 / value, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
