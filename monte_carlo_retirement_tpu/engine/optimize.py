"""One-parameter plan optimization by batched grid refinement.

A capability the reference has no analog for (its engine evaluates one
config per request, backend/simulation.py:952-1128). The TPU-shaped
algorithm is NOT a serial line search: each refinement round evaluates K
points spanning the current interval in ONE scenario-grid dispatch
(engine/scenario_batch.py), takes the argmax neighborhood, and zooms into
the two cells around it. With common random numbers the objective is a
deterministic function of the parameter (draws depend only on
(stream, month, path)), so rounds are exactly comparable, ties break
deterministically, and the refinement cannot chase sampling noise.

Interval shrink per round = 2/(K-1); K=17 points for 3 rounds narrows the
search interval by ~512x for 51 scenario rows total — about three device
dispatches, versus ~9 sequential dispatches for golden-section reaching
only ~70x on a latency-bound serial path.
"""

from __future__ import annotations

import math
from typing import Callable, List, NamedTuple, Optional

import numpy as np

from ..config import Config
from .scenario_batch import ScenarioBatchResult, run_scenario_grid
from .sensitivity import SENSITIVITY_PARAMS, _quiet_config_warnings

__all__ = ["OBJECTIVES", "OptimizeResult", "OptimizePoint", "optimize_param"]

# objective name -> (extractor, higher_is_better). All are maximized;
# decision-grade metrics only (success% ties are broken by median final).
OBJECTIVES = {
    "success_probability": lambda r: r.success_probability,
    "median_final_balance": lambda r: r.median_final_balance,
    "mean_final_balance": lambda r: r.mean_final_balance,
}


class OptimizePoint(NamedTuple):
    value: float
    success_probability: float
    median_final_balance: float
    mean_final_balance: float


class OptimizeResult(NamedTuple):
    param: str
    objective: str
    best: OptimizePoint
    interval: tuple  # final refined (lo, hi) bracket around the best point
    curve: List[OptimizePoint]  # round-1 coarse sweep over [lo, hi]
    rounds: int
    evaluations: int  # total scenario rows dispatched
    success_sigma: float  # per-point binomial MC sigma at the best point


def _bounds_for(param: str, lo: Optional[float], hi: Optional[float]):
    spec = SENSITIVITY_PARAMS[param]
    lo = spec.lo if lo is None else float(lo)
    hi = spec.hi if hi is None else float(hi)
    if math.isinf(hi):
        raise ValueError(
            f"Parameter '{param}' has no upper bound; pass an explicit "
            "hi for the search interval."
        )
    if not (spec.lo <= lo < hi <= spec.hi):
        raise ValueError(
            f"Search interval [{lo}, {hi}] must be increasing and inside "
            f"the config bounds [{spec.lo}, {spec.hi}] of '{param}'."
        )
    return lo, hi


def optimize_param(
    config: Config,
    working_months: int,
    param: str,
    num_paths: Optional[int] = None,
    seed: int = 0,
    objective: str = "success_probability",
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    points: int = 17,
    rounds: int = 3,
    backend: Optional[str] = None,
    mesh=None,
    progress_callback: Optional[Callable[[dict], None]] = None,
) -> OptimizeResult:
    """Maximize ``objective`` over one scalar config field at fixed months.

    Each round dispatches ``points`` parameter values spanning the current
    interval as one CRN scenario grid, then zooms into the two grid cells
    around the argmax. ``progress_callback`` receives the underlying
    ``grid_chunk`` events plus an ``optimize_round`` event per round.
    """
    if param not in SENSITIVITY_PARAMS:
        raise ValueError(
            f"Unknown parameter '{param}'; supported: "
            f"{sorted(SENSITIVITY_PARAMS)}"
        )
    if objective not in OBJECTIVES:
        raise ValueError(
            f"Unknown objective '{objective}'; supported: "
            f"{sorted(OBJECTIVES)}"
        )
    points = int(points)
    rounds = int(rounds)
    if points < 3:
        raise ValueError("points must be >= 3")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    base_dump = config.model_dump()
    base_dump.pop("allocation_inv2_pct", None)  # derived property
    lo, hi = _bounds_for(param, lo, hi)
    n = int(num_paths or config.num_simulations_main)
    extract = OBJECTIVES[objective]

    def evaluate(xs: np.ndarray) -> ScenarioBatchResult:
        with _quiet_config_warnings():
            variants = [
                Config(**{**base_dump, param: float(x)}) for x in xs
            ]
        return run_scenario_grid(
            variants,
            [int(working_months)] * len(variants),
            n,
            seed=seed,
            # One dispatch per round (the module's design claim) — K is
            # host-bounded at 257, whose (k, n) grid intermediates stay
            # comfortably inside HBM even at 1M paths.
            chunk_size=len(xs),
            backend=backend,
            mesh=mesh,
            progress_callback=progress_callback,
        )

    curve: List[OptimizePoint] = []
    evaluations = 0
    # The GLOBAL best across rounds. Zooming re-grids around each round's
    # argmax, and with an even point count the new grid need not re-sample
    # it — so the returned optimum must be tracked across rounds, never
    # read off the final grid alone.
    best_key = None
    best: Optional[OptimizePoint] = None
    best_bracket = (lo, hi)
    best_sigma = 0.0
    xs = np.linspace(lo, hi, points)
    for r in range(rounds):
        res = evaluate(xs)
        evaluations += len(xs)
        obj = np.asarray(extract(res), dtype=float)
        med = np.asarray(res.median_final_balance, dtype=float)
        # Deterministic argmax with a median-final tie-break (success
        # saturates at 100% over whole plateaus; CRN makes ties exact).
        best_idx = int(
            max(range(len(xs)), key=lambda i: (obj[i], med[i]))
        )
        key = (float(obj[best_idx]), float(med[best_idx]))
        if best_key is None or key > best_key:
            best_key = key
            best = OptimizePoint(
                value=float(xs[best_idx]),
                success_probability=float(res.success_probability[best_idx]),
                median_final_balance=float(med[best_idx]),
                mean_final_balance=float(res.mean_final_balance[best_idx]),
            )
            best_bracket = (
                float(xs[max(0, best_idx - 1)]),
                float(xs[min(len(xs) - 1, best_idx + 1)]),
            )
            best_sigma = float(res.success_sigma[best_idx])
        if r == 0:
            curve = [
                OptimizePoint(
                    value=float(xs[i]),
                    success_probability=float(res.success_probability[i]),
                    median_final_balance=float(med[i]),
                    mean_final_balance=float(res.mean_final_balance[i]),
                )
                for i in range(len(xs))
            ]
        if progress_callback is not None:
            progress_callback({
                "type": "optimize_round",
                "round": r + 1,
                "rounds": rounds,
                "best_value": best.value,
                "best_objective": best_key[0],
                "interval": [float(xs[0]), float(xs[-1])],
            })
        if r + 1 < rounds:
            new_lo = float(xs[max(0, best_idx - 1)])
            new_hi = float(xs[min(len(xs) - 1, best_idx + 1)])
            xs = np.linspace(new_lo, new_hi, points)

    assert best is not None
    return OptimizeResult(
        param=param,
        objective=objective,
        best=best,
        interval=best_bracket,
        curve=curve,
        rounds=rounds,
        evaluations=evaluations,
        success_sigma=best_sigma,
    )
