"""On-device summary reductions over the path axis.

Where the reference hauled every path back to the host and reduced with
pandas (backend/simulation.py:1012-1118), these reductions run inside the
same XLA program as the simulation: under a sharded paths axis they lower to
ICI collectives, and only the small percentile tables cross back to the host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import (
    FINAL_BALANCE_PERCENTILES,
    SMALL_EPSILON,
    TRAJECTORY_PERCENTILES,
    WITHDRAWAL_RATE_PERCENTILES,
)

EPS = SMALL_EPSILON


class RunSummary(NamedTuple):
    """Reduced statistics for one full simulation batch (device arrays)."""

    success_probability: jnp.ndarray  # scalar, percent
    median_start_balance: jnp.ndarray  # scalar
    median_final_successful: jnp.ndarray  # scalar (NaN if no successes)
    swr: jnp.ndarray  # scalar, percent (NaN if no valid start balances)
    final_balance_percentiles: jnp.ndarray  # (9,)
    trajectory_percentiles: jnp.ndarray  # (7, L)
    real_trajectory_percentiles: jnp.ndarray  # (7, L)
    sample_trajectories: jnp.ndarray  # (num_samples, L)
    sample_real_trajectories: jnp.ndarray  # (num_samples, L)
    wr_percentiles: jnp.ndarray  # (5, R)
    wr_observation_counts: jnp.ndarray  # (R,)


def summarize(outs, sample_idx: jnp.ndarray) -> RunSummary:
    """Reduce a PathOutputs batch to percentile tables and headline scalars."""
    success = outs.success
    final = outs.final_balance
    start = outs.start_balance

    success_prob = jnp.mean(success.astype(jnp.float32)) * 100.0

    median_start = jnp.percentile(start, 50.0)
    final_successful = jnp.where(success, final, jnp.nan)
    median_final_successful = jnp.nanpercentile(final_successful, 50.0)

    rates = jnp.where(
        start > EPS,
        outs.first_year_real_gross / jnp.maximum(start, EPS) * 100.0,
        jnp.nan,
    )
    swr = jnp.nanpercentile(rates, 50.0)

    final_pcts = jnp.percentile(
        final, jnp.asarray(FINAL_BALANCE_PERCENTILES) * 100.0
    )

    traj = outs.trajectory
    price = outs.price_levels
    real = jnp.where(price > EPS, traj / jnp.maximum(price, EPS), 0.0)
    traj_q = jnp.asarray(TRAJECTORY_PERCENTILES) * 100.0
    traj_pcts = jnp.percentile(traj, traj_q, axis=0)
    real_pcts = jnp.percentile(real, traj_q, axis=0)

    samples = traj[sample_idx]
    samples_real = real[sample_idx]

    wr = outs.withdrawal_rates
    wr_q = jnp.asarray(WITHDRAWAL_RATE_PERCENTILES) * 100.0
    wr_pcts = jnp.nanpercentile(wr, wr_q, axis=0)
    wr_counts = jnp.sum(~jnp.isnan(wr), axis=0)

    return RunSummary(
        success_probability=success_prob,
        median_start_balance=median_start,
        median_final_successful=median_final_successful,
        swr=swr,
        final_balance_percentiles=final_pcts,
        trajectory_percentiles=traj_pcts,
        real_trajectory_percentiles=real_pcts,
        sample_trajectories=samples,
        sample_real_trajectories=samples_real,
        wr_percentiles=wr_pcts,
        wr_observation_counts=wr_counts,
    )
