"""Scenario-parallel execution: a batch of configs as one device program.

The reference ran one config per process (SURVEY §2.3 marks scenario-parallel
as absent). Here a scenario grid is a *struct-of-arrays* ``SimParams`` —
every scalar leaf stacked over a leading scenario axis — and the compiled
path kernel is simply vmapped over it. A 256-variant sweep therefore costs
one device dispatch, sharing shocks across scenarios (common random numbers
over the grid, so outcome differences are attributable to the config deltas,
not sampling noise).

Constraint: all configs in one batch must share structural shape —
``retirement_years`` and the number of *effective* income streams (streams
with zero amount or zero duration are pruned before stacking, so padding
with zero-amount streams does NOT align batches; every config must carry
the same count of streams that can actually pay).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.retirement import SimParams
from ..ops.shocks import stream_keys
from .kernel import simulate_paths


class ScenarioBatchResult(NamedTuple):
    success_probability: np.ndarray  # (k,) percent
    median_final_balance: np.ndarray  # (k,)
    mean_final_balance: np.ndarray  # (k,)


def grid_statics(configs: Sequence[Config]):
    """The shared compile-time Statics of a scenario batch.

    The Pallas grid kernel bakes tax systems and stream structure into the
    executable, so every config in one PALLAS grid dispatch must share them
    (the XLA scan path keeps these as per-row traced data and accepts mixed
    batches). Raises ValueError when the batch mixes them.
    """
    from .pallas_kernel import statics_from_config

    statics = {statics_from_config(c) for c in configs}
    if len(statics) != 1:
        raise ValueError(
            "all configs in a scenario grid must share tax systems and "
            "stream structure (compile-time Statics); split the batch by "
            f"statics. Got {len(statics)} distinct combinations."
        )
    return next(iter(statics))


def stack_params(configs: Sequence[Config], dtype=jnp.float32) -> SimParams:
    """Stack per-config SimParams into one struct-of-arrays pytree."""
    if not configs:
        raise ValueError("scenario batch needs at least one config")
    r_years = {c.retirement_years for c in configs}
    if len(r_years) != 1:
        raise ValueError(
            f"all configs must share retirement_years, got {sorted(r_years)}"
        )
    per_config = [SimParams.from_config(c, dtype=dtype) for c in configs]
    # Validate on the PRUNED stream count — SimParams.from_config drops
    # zero-amount/zero-duration streams, so the raw config counts can match
    # while the stacked array shapes do not.
    n_streams = {p.n_streams for p in per_config}
    if len(n_streams) != 1:
        raise ValueError(
            "all configs must have the same number of effective income "
            "streams after pruning zero-amount/zero-duration ones, got "
            f"counts {sorted(n_streams)}"
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_config)


def run_scenario_batch(
    configs: Sequence[Config],
    working_months: Sequence[int],
    num_simulations: int,
    seed: int = 0,
    dtype=jnp.float32,
    t_scan: Optional[int] = None,
) -> ScenarioBatchResult:
    """Simulate every (config, working_months) pair in one compiled dispatch.

    ``working_months`` is per-scenario (len == len(configs)). Shocks are
    shared across scenarios (CRN over the grid).
    """
    if len(working_months) != len(configs):
        raise ValueError("working_months must align with configs")
    params = stack_params(configs, dtype=dtype)
    R = configs[0].retirement_years
    w_vec = jnp.asarray(list(working_months), dtype=jnp.int32)
    horizon = int(max(working_months)) + 12 * R
    t = t_scan or horizon
    if t < horizon:
        raise ValueError("t_scan below the longest scenario horizon")
    _, final_key = stream_keys(seed)

    succ, final = _batch_jit(
        params,
        w_vec,
        final_key,
        n_paths=int(num_simulations),
        t_scan=t,
        retirement_years=R,
        dtype=dtype,
    )
    return ScenarioBatchResult(
        success_probability=np.asarray(succ),
        median_final_balance=np.asarray(final[0]),
        mean_final_balance=np.asarray(final[1]),
    )


def _batch_impl(params, w_vec, key, n_paths, t_scan, retirement_years, dtype):
    def one(p, w):
        outs = simulate_paths(
            p,
            w,
            key,
            n_paths=n_paths,
            t_scan=t_scan,
            retirement_years=retirement_years,
            traj_len=0,
            dtype=dtype,
        )
        return (
            jnp.mean(outs.success.astype(jnp.float32)) * 100.0,
            (
                jnp.percentile(outs.final_balance, 50.0),
                jnp.mean(outs.final_balance),
            ),
        )

    return jax.vmap(one, in_axes=(0, 0))(params, w_vec)


_batch_jit = jax.jit(
    _batch_impl,
    static_argnames=("n_paths", "t_scan", "retirement_years", "dtype"),
)
