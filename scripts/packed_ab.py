"""A/B the packed single-window full-mode output layout vs the 10-ref one.

Times pallas_simulate_full(packed=...) at 1M x 600 on the chip: varied
seeds, fetched checksum, min-of-N (docs/NOTES.md timing rules). Also
cross-checks bit-identity of every output between the two layouts on
device (they share the kernel body via _PackedView, so this is a seatbelt,
not the primary gate — the CPU differential suites are).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from monte_carlo_retirement_tpu.config import Config, load_config_from_json
from monte_carlo_retirement_tpu.engine.pallas_kernel import (
    pallas_simulate_full,
    statics_from_config,
)
from monte_carlo_retirement_tpu.engine.runner import (
    enable_persistent_compilation_cache,
)
from monte_carlo_retirement_tpu.models.retirement import SimParams
from monte_carlo_retirement_tpu.timing import expected_trajectory_length

enable_persistent_compilation_cache()

R = 50
N = 1_000_000

raw = load_config_from_json(os.path.join(REPO, "config.json"))
raw.update(retirement_years=R, initial_balance=1_500_000.0,
           monthly_expenses=4_000.0, seed=20260821)
cfg = Config(**raw)
params = SimParams.from_config(cfg, dtype=jnp.float32)
statics = statics_from_config(cfg)
L = expected_trajectory_length(0, R)


from functools import partial


@partial(jax.jit, static_argnames=("packed",))
def call(seed, packed):
    outs = pallas_simulate_full(
        params, 0, seed, n_paths=N, retirement_years=R,
        n_streams=params.n_streams, statics=statics, traj_len=L,
        packed=packed,
    )
    # One scalar checksum over every output forces full materialization;
    # jitting the whole thing makes each timed call ONE device dispatch so
    # the A/B delta resolves below a millisecond.
    return sum(jnp.sum(jnp.nan_to_num(v)) for v in outs.values())


def time_variant(packed, n=5):
    t0 = time.perf_counter()
    float(call(1, packed))  # compile / cache-load
    print(f"packed={packed}: first call {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for i in range(n):
        t0 = time.perf_counter()
        float(call(2 + i, packed))
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"packed={packed}: min-of-{n} {ms:.1f} ms (runs: "
          f"{[round(t * 1e3, 1) for t in times]})", flush=True)
    return ms


def main():
    variants = [int(v) for v in (sys.argv[1:] or ["0", "1"])]
    print("devices:", jax.devices(), "variants:", variants, flush=True)
    res = {v: time_variant(v) for v in variants}
    print("RESULT " + " ".join(f"packed{v}={ms:.1f}ms"
                               for v, ms in res.items()), flush=True)

    # Bit-identity on device between layouts (same seed).
    ref = None
    for v in variants:
        o = pallas_simulate_full(
            params, 0, 999, n_paths=N, retirement_years=R,
            n_streams=params.n_streams, statics=statics, traj_len=L,
            packed=v,
        )
        if ref is None:
            ref = o
            continue
        for k in ref:
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(o[k]), err_msg=k
            )
    print("BIT-IDENTICAL across layouts (all 10 outputs)", flush=True)


if __name__ == "__main__":
    main()
