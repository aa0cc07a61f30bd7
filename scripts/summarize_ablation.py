"""Device-time breakdown of the fused full-statistics program.

Times (min-of-N, chained runs per dispatch) the Pallas full kernel alone
and with each reduction stage added, at the bench shape (1M x 600), so
optimization effort goes where the milliseconds are.

Usage: python scripts/summarize_ablation.py [n_paths]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.pallas_kernel import (
    pallas_simulate_full,
    statics_from_config,
)
from monte_carlo_retirement_tpu.engine.runner import (
    enable_persistent_compilation_cache,
)
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.ops.quantiles import exact_quantiles
from monte_carlo_retirement_tpu.ops import stats as S

enable_persistent_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
R_YEARS = 50
TRAJ_LEN = 51
REPEATS = 4
INNER = 5

raw = load_config_from_json(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config.json"
))
raw["retirement_years"] = R_YEARS
raw["initial_balance"] = 1_500_000.0
raw["monthly_expenses"] = 4_000.0
config = Config(**raw)
params = SimParams.from_config(config, dtype=jnp.float32)
statics = statics_from_config(config)

TRAJ_Q = jnp.asarray(S.TRAJECTORY_PERCENTILES, jnp.float32)
WR_Q = jnp.asarray(S.WITHDRAWAL_RATE_PERCENTILES, jnp.float32)


def full(seed):
    return pallas_simulate_full(
        params, jnp.asarray(0, jnp.int32), seed, n_paths=N,
        retirement_years=R_YEARS, n_streams=params.n_streams,
        statics=statics, traj_len=TRAJ_LEN,
    )


def ksum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x.astype(jnp.float32), 0.0))


def _as_outs(f):
    """PathOutputs view over the kernel's dict (bins need 4 fields)."""
    from monte_carlo_retirement_tpu.engine.kernel import PathOutputs

    return PathOutputs(
        success=f["success"][:N] > 0.5,
        final_balance=f["final_balance"][:N],
        start_balance=f["start_balance"][:N],
        years_to_ruin=f["years_to_ruin"][:N],
        first_year_gross=f["first_year_gross"][:N],
        first_year_real_gross=f["first_year_real_gross"][:N],
        inflation_at_retirement=f["inflation_at_retirement"][:N],
        trajectory=None, price_levels=None,
        withdrawal_rates=f["withdrawal_rates"][:N],
    )


def _series(f):
    # The production reducer: nominal+real fans share ONE joint bisection
    # loop (ops/stats.series_summary); WR stays its own loop — folding it
    # in with 2 repeat-padded ranks measured SLOWER (88.9 vs 86.3 ms with
    # the kernel: the pass compute is the binding resource, see NOTES).
    parts = S.series_summary(
        f["trajectory"][:N], f["price_levels"][:N],
        f["withdrawal_rates"][:N], jnp.arange(5, dtype=jnp.int32),
    )
    return sum(ksum(jnp.asarray(v)) for v in parts)


STAGES = {
    "kernel_only": lambda f: sum(ksum(v) for v in f.values()),
    "kernel+traj_q": lambda f: ksum(exact_quantiles(f["trajectory"][:N],
                                                    TRAJ_Q)),
    "kernel+series": _series,
    "kernel+wr_q": lambda f: ksum(exact_quantiles(
        f["withdrawal_rates"][:N], WR_Q,
        valid=~jnp.isnan(f["withdrawal_rates"][:N]),
    )),
    "kernel+vectors": lambda f: sum(ksum(jnp.asarray(v)) for v in S.vector_summary(
        f["success"][:N] > 0.5, f["final_balance"][:N],
        f["start_balance"][:N], f["first_year_real_gross"][:N],
    )),
    "kernel+bins": lambda f: sum(ksum(jnp.asarray(v)) for v in S.serving_bins(
        _as_outs(f), r_years=R_YEARS,
    )),
}


def bench(name, reduce_fn):
    @jax.jit
    def run_batch(seed0):
        total = jnp.float32(0.0)
        for i in range(INNER):
            total = total + reduce_fn(full(seed0 + i))
        return total

    float(run_batch(0))  # warm
    times = []
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        float(run_batch(100 + rep * INNER))
        times.append((time.perf_counter() - t0) * 1000.0 / INNER)
    print(f"{name:24s} {min(times):8.2f} ms/run", flush=True)
    return min(times)


base = bench("kernel_only", STAGES["kernel_only"])
for name in list(STAGES)[1:]:
    t = bench(name, STAGES[name])
    print(f"{'':24s} (+{t - base:6.2f} ms over kernel)", flush=True)
