"""Optimizer serving: request models, validation, assembly.

No reference analog (the reference serves one simulation per request,
backend/server.py:298-319); same validation taxonomy as the grid and
sensitivity surfaces: malformed request -> 422, valid request the engine
cannot serve -> 400.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

from pydantic import BaseModel, Field

from ..config import Config
from ..engine.optimize import OBJECTIVES, optimize_param
from ..engine.sensitivity import SENSITIVITY_PARAMS


class OptimizeRequest(BaseModel):
    config: Dict[str, Any] = Field(
        ..., description="Base configuration (same schema as config.json)."
    )
    working_months: int = Field(..., ge=0)
    param: str = Field(
        ..., description="Config field to optimize over "
        f"(supported: {sorted(SENSITIVITY_PARAMS)}).",
    )
    objective: str = Field(
        "success_probability",
        description=f"Metric to maximize (supported: {sorted(OBJECTIVES)}).",
    )
    lo: Optional[float] = Field(
        None, description="Search interval lower bound "
        "(default: the field's hard bound).",
    )
    hi: Optional[float] = Field(
        None, description="Search interval upper bound (required when the "
        "field has no hard upper bound).",
    )
    num_paths: Optional[int] = Field(
        None, ge=1,
        description="Paths per point (default: config.num_simulations_main).",
    )
    points: int = Field(17, ge=3, le=257,
                        description="Grid points per refinement round.")
    rounds: int = Field(3, ge=1, le=8,
                        description="Refinement rounds (each one dispatch).")


class OptimizePointModel(BaseModel):
    value: float
    success_probability: float
    median_final_balance: float
    mean_final_balance: float


class OptimizeResponse(BaseModel):
    scenario: str
    working_months: int
    num_paths: int
    param: str
    objective: str
    base_value: float
    best: OptimizePointModel
    interval: List[float]  # final refined bracket [lo, hi] around best
    curve: List[OptimizePointModel]  # round-1 coarse sweep
    rounds: int
    evaluations: int
    success_sigma: float


def prepare_optimize(request: OptimizeRequest):
    """Materialize (config, num_paths); raises ValueError -> 422.

    Interval/param/objective validation happens in the engine — those
    errors are also request errors, so the runner re-raises them for the
    handler's 422 path via prepare-time probing of the static arguments.
    """
    try:
        config = Config(**request.config)
    except Exception as exc:
        raise ValueError(f"base config is invalid: {exc}") from exc
    if request.param not in SENSITIVITY_PARAMS:
        raise ValueError(
            f"Unknown parameter '{request.param}'; supported: "
            f"{sorted(SENSITIVITY_PARAMS)}"
        )
    if request.objective not in OBJECTIVES:
        raise ValueError(
            f"Unknown objective '{request.objective}'; supported: "
            f"{sorted(OBJECTIVES)}"
        )
    from ..engine.optimize import _bounds_for

    _bounds_for(request.param, request.lo, request.hi)  # raises ValueError
    num_paths = int(request.num_paths or config.num_simulations_main)
    return config, num_paths


def run_optimize_request(
    request: OptimizeRequest,
    prepared=None,
    progress_callback: Optional[Callable[[dict], None]] = None,
) -> dict:
    """Run the refinement and assemble the response dict (worker-thread
    safe)."""
    config, num_paths = prepared or prepare_optimize(request)
    seed = int(config.seed) if config.seed is not None else 0
    result = optimize_param(
        config,
        request.working_months,
        request.param,
        num_paths=num_paths,
        seed=seed,
        objective=request.objective,
        lo=request.lo,
        hi=request.hi,
        points=request.points,
        rounds=request.rounds,
        progress_callback=progress_callback,
    )

    def point(p) -> dict:
        return {
            "value": round(p.value, 10),
            "success_probability": round(p.success_probability, 3),
            "median_final_balance": round(p.median_final_balance, 2),
            "mean_final_balance": round(p.mean_final_balance, 2),
        }

    return {
        "scenario": config.Nickname,
        "working_months": int(request.working_months),
        "num_paths": num_paths,
        "param": result.param,
        "objective": result.objective,
        "base_value": float(config.model_dump()[result.param]),
        "best": point(result.best),
        "interval": [round(result.interval[0], 10),
                     round(result.interval[1], 10)],
        "curve": [point(p) for p in result.curve],
        "rounds": result.rounds,
        "evaluations": result.evaluations,
        "success_sigma": round(result.success_sigma, 3),
    }
