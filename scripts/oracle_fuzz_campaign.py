"""Oracle re-certification campaign: engine vs the f64 NumPy oracle over
thousands of random scenarios WITH every engine extension in the mix
(glide, guardrails, crashes, fees, longevity — the reference head-to-head
campaign, scripts/fuzz_campaign.py, keeps extensions OFF by design because
the reference cannot simulate them; this campaign certifies the extension
semantics against tests/oracle.py instead).

Each trial = one random scenario x 16 paths, every per-path success flag
and final balance compared (same harness as
tests/test_fuzz_parity.py::run_differential_case).

Usage: python scripts/oracle_fuzz_campaign.py [--trials N] [--seed S]
Exit 0 = all trials clean; 1 = first failing trial printed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from monte_carlo_retirement_tpu.engine.runner import (  # noqa: E402
    enable_persistent_compilation_cache,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--clear-every", type=int, default=150,
        help="jax.clear_caches() cadence — a long-lived process compiling "
        "hundreds of distinct CPU executables exhausts the kernel's mmap "
        "budget otherwise (docs/NOTES.md)",
    )
    args = ap.parse_args()

    enable_persistent_compilation_cache()
    from tests.test_fuzz_parity import run_differential_case

    t0 = time.time()
    ext_counts = {"longevity": 0, "crashes": 0, "guardrails": 0, "glide": 0}
    for i in range(args.trials):
        case_seed = args.seed * 1_000_000 + 7_000_000 + i
        try:
            run_differential_case(case_seed)
        except AssertionError as exc:
            print(f"TRIAL {i} (seed {case_seed}) FAILED:\n{exc}")
            return 1
        # Tally which extensions the trial exercised (same rng replay).
        import numpy as np

        from tests.test_fuzz_parity import _random_config

        cfg = _random_config(np.random.default_rng(case_seed))
        ext_counts["longevity"] += cfg.longevity is not None
        ext_counts["crashes"] += cfg.market_crashes is not None
        ext_counts["guardrails"] += cfg.spending_guardrails is not None
        ext_counts["glide"] += cfg.allocation_inv1_final_pct is not None
        if (i + 1) % args.clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 50 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"{i + 1}/{args.trials} clean "
                  f"({rate:.1f} trials/s, extensions: {ext_counts})",
                  flush=True)

    dt = time.time() - t0
    print(f"CLEAN: {args.trials} trials x 16 paths in {dt:.0f}s "
          f"(extension mix: {ext_counts})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
