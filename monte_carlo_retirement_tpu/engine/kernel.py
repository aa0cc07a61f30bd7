"""The compiled path kernel: one `lax.scan` over absolute months.

Design notes (TPU-first re-architecture of the reference's per-path Python
loop, backend/simulation.py:476-950):

  * The time axis is a `lax.scan` with a small struct-of-arrays carry; the
    path axis is a plain vector dimension inside the step, so sharding the
    paths over a device mesh requires no kernel changes.
  * `working_months` (W) is a *traced* scalar. Accumulation vs retirement is
    decided per-month by masks, so one compilation serves every candidate W —
    the working-month search batches candidates with `vmap` over W, and the
    monthly shocks are a pure function of (stream, month, path), which yields
    common random numbers across candidates by construction.
  * Divergent control flow (ruin `break`s, partial tax years, stream start
    dates) becomes branchless masking. Dead paths freeze their entire state,
    which reproduces the reference's early-`break` semantics exactly.
  * Yearly trajectory / price-level / withdrawal-rate series are recorded by
    in-carry ring buffers updated with `dynamic_update_slice` at a per-month
    slot index, instead of materialising (T, n_paths) scan outputs in HBM.

Event timeline inside one month m (1-indexed absolute month):
  income & need -> ruin check A -> growth & inflation -> ruin check B ->
  capacity-limited pro-rata withdrawal -> contribution -> rebalance ->
  annual tax at absolute 12-month boundaries -> final-period settle at the
  horizon end -> death/record resolution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import MONTHS_PER_YEAR, SMALL_EPSILON
from ..models.retirement import SimParams
from ..ops.shocks import monthly_gross_factors, monthly_shocks
from ..ops.tax import (
    apply_annual_gain_taxes,
    fail_rtol,
    net_liquidation_value,
    rebalance,
    withdraw_net_target,
)

EPS = SMALL_EPSILON


class PathOutputs(NamedTuple):
    """Per-path results of one batched simulation run."""

    success: jnp.ndarray  # (n,) bool — every month of spending was funded
    final_balance: jnp.ndarray  # (n,)
    start_balance: jnp.ndarray  # (n,) balance on the retirement date
    years_to_ruin: jnp.ndarray  # (n,) NaN when successful
    first_year_gross: jnp.ndarray  # (n,) nominal gross withdrawals, year 0
    first_year_real_gross: jnp.ndarray  # (n,) deflated to retirement-date $
    inflation_at_retirement: jnp.ndarray  # (n,) price level on retirement date
    trajectory: Optional[jnp.ndarray]  # (n, L) yearly samples, or None
    price_levels: Optional[jnp.ndarray]  # (n, L) price level at each sample
    withdrawal_rates: Optional[jnp.ndarray]  # (n, R) real % of start balance


class _Carry(NamedTuple):
    b1: jnp.ndarray
    c1: jnp.ndarray
    b2: jnp.ndarray
    c2: jnp.ndarray
    infl: jnp.ndarray
    g1acc: jnp.ndarray
    g2acc: jnp.ndarray
    alive: jnp.ndarray
    preret_failed: jnp.ndarray
    ytr: jnp.ndarray
    start_bal: jnp.ndarray
    infl_ret: jnp.ndarray
    yg: jnp.ndarray  # gross withdrawals in the current retirement year
    yr: jnp.ndarray  # same, deflated to retirement-date dollars
    fy_g: jnp.ndarray
    fy_r: jnp.ndarray
    fixed_nom: Optional[jnp.ndarray]  # (n, S) frozen nominal stream amounts
    traj: Optional[jnp.ndarray]
    price: Optional[jnp.ndarray]
    wr: Optional[jnp.ndarray]


@partial(
    jax.jit,
    static_argnames=(
        "n_paths",
        "t_scan",
        "retirement_years",
        "traj_len",
        "dtype",
    ),
)
def simulate_paths(
    params: SimParams,
    working_months: jnp.ndarray,
    stream_key: jax.Array,
    *,
    n_paths: int,
    t_scan: int,
    retirement_years: int,
    traj_len: int,
    dtype,
    shocks: Optional[jnp.ndarray] = None,
) -> PathOutputs:
    """Simulate ``n_paths`` full lifetimes with ``working_months`` (traced).

    ``t_scan`` must be >= working_months + 12 * retirement_years. With
    ``traj_len`` == 0 the trajectory/price/withdrawal-rate buffers are elided
    (probe mode for the search). ``shocks`` may supply precomputed draws of
    shape (t_scan, n_paths, 3); otherwise draws are generated inside the scan
    from ``stream_key`` (identical values either way).
    """
    p = params
    R = retirement_years
    W = jnp.asarray(working_months, dtype=jnp.int32)
    f = lambda x: jnp.asarray(x, dtype=dtype)
    zeros = jnp.zeros((n_paths,), dtype=dtype)
    track = traj_len > 0
    n_streams = p.n_streams

    w_f = W.astype(dtype)
    full_wy = W // MONTHS_PER_YEAR
    partial_wy = (W % MONTHS_PER_YEAR != 0).astype(jnp.int32)
    t_end = W + MONTHS_PER_YEAR * R

    b1_0 = f(p.initial_balance * p.alloc1) * jnp.ones_like(zeros)
    b2_0 = f(p.initial_balance) - b1_0

    init = _Carry(
        b1=b1_0,
        c1=b1_0,
        b2=b2_0,
        c2=b2_0,
        infl=jnp.ones_like(zeros),
        g1acc=zeros,
        g2acc=zeros,
        alive=jnp.ones((n_paths,), dtype=bool),
        preret_failed=jnp.zeros((n_paths,), dtype=bool),
        ytr=jnp.full((n_paths,), jnp.nan, dtype=dtype),
        start_bal=f(p.initial_balance) * jnp.ones_like(zeros),
        infl_ret=jnp.ones_like(zeros),
        yg=zeros,
        yr=zeros,
        fy_g=zeros,
        fy_r=zeros,
        fixed_nom=(
            jnp.full((n_paths, n_streams), -1.0, dtype=dtype) if n_streams else None
        ),
        traj=(
            jnp.zeros((n_paths, traj_len), dtype=dtype)
            .at[:, 0]
            .set(f(p.initial_balance))
            if track
            else None
        ),
        price=(
            jnp.ones((n_paths, traj_len), dtype=dtype) if track else None
        ),
        wr=(jnp.full((n_paths, R), jnp.nan, dtype=dtype) if track else None),
    )

    def step(carry: _Carry, xs):
        m, z_m = xs  # m: absolute month, 1-indexed
        is_accum = m <= W
        k = m - W  # retirement month, 1-indexed
        ret_idx = k - 1  # retirement month, 0-indexed
        in_ret = (m > W) & (m <= t_end)
        boundary = (m % MONTHS_PER_YEAR) == 0
        year_end = in_ret & ((k % MONTHS_PER_YEAR) == 0)
        new_year = in_ret & ((ret_idx % MONTHS_PER_YEAR) == 0)
        alive0 = carry.alive
        act_ret = in_ret & alive0

        # --- new retirement year: reset the per-year withdrawal accumulators
        yg = jnp.where(new_year, 0.0, carry.yg)
        yr = jnp.where(new_year, 0.0, carry.yr)

        # --- other income & net spending need (retirement months only)
        price0 = carry.infl  # price level at the start of the month
        expenses = f(p.monthly_expenses) * price0
        fixed_nom = carry.fixed_nom
        if n_streams:
            ret_idx_f = ret_idx.astype(dtype)
            start_m = jnp.maximum(
                0.0,
                jnp.ceil(
                    jnp.maximum(0.0, f(p.stream_months_from_t0) - w_f) - EPS
                ),
            )  # (S,)
            active_s = (
                in_ret
                & (ret_idx_f >= start_m)
                & (ret_idx_f < start_m + f(p.stream_duration_months))
            )  # (S,)
            starts_now = active_s & (ret_idx_f == start_m)
            fixed_nom = jnp.where(
                starts_now[None, :] & (fixed_nom < 0),
                f(p.stream_amount)[None, :] * price0[:, None],
                fixed_nom,
            )
            nominal = jnp.where(
                p.stream_indexed[None, :],
                f(p.stream_amount)[None, :] * price0[:, None],
                fixed_nom,
            )
            net_income = jnp.sum(
                jnp.where(
                    active_s[None, :],
                    nominal * (1.0 - f(p.stream_tax))[None, :],
                    0.0,
                ),
                axis=1,
            )
        else:
            net_income = zeros
        need = jnp.maximum(0.0, expenses - net_income)

        # --- ruin check A: broke before the month begins
        total0 = carry.b1 + carry.b2
        dies_a = act_ret & (total0 <= EPS) & (need > EPS)

        # --- market growth & inflation
        z_eq, z_inf, z_prem = z_m
        g1, gi, g2 = monthly_gross_factors(
            z_eq, z_inf, z_prem,
            f(p.mu1), f(p.sigma1), f(p.mu_inf), f(p.sigma_inf),
            f(p.mu_prem), f(p.sigma_prem),
        )
        gmask = is_accum | (act_ret & ~dies_a)
        g1acc = carry.g1acc + jnp.where(gmask, carry.b1 * (g1 - 1.0), 0.0)
        g2acc = carry.g2acc + jnp.where(gmask, carry.b2 * (g2 - 1.0), 0.0)
        b1 = jnp.where(gmask, carry.b1 * g1, carry.b1)
        b2 = jnp.where(gmask, carry.b2 * g2, carry.b2)
        c1, c2 = carry.c1, carry.c2
        infl = jnp.where(gmask, carry.infl * gi, carry.infl)

        # --- ruin check B: growth alone cannot fund the month
        total1 = b1 + b2
        dies_b = act_ret & ~dies_a & (total1 <= EPS) & (need > EPS)
        b1 = jnp.where(dies_b, jnp.maximum(0.0, b1), b1)
        b2 = jnp.where(dies_b, jnp.maximum(0.0, b2), b2)

        # --- capacity-limited withdrawal, split pro-rata by net capacity
        wmask = act_ret & ~dies_a & ~dies_b
        nc1 = net_liquidation_value(b1, c1, p.use_real1, f(p.real_tax1))
        nc2 = net_liquidation_value(b2, c2, p.use_real2, f(p.real_tax2))
        tnc = nc1 + nc2
        target = jnp.maximum(0.0, jnp.minimum(need, tnc))
        # Funding failures need a relative slack under float32 (see
        # ops.tax.fail_rtol); in float64 this reduces to the reference's
        # absolute epsilon.
        ftol = EPS + fail_rtol(dtype) * (need + total1)
        fail_cap = wmask & (need > EPS) & (target < need - ftol)
        prop1 = jnp.where(tnc > EPS, nc1 / jnp.where(tnc > EPS, tnc, 1.0), f(p.alloc1))

        wb1, wc1, gw1, nw1 = withdraw_net_target(
            b1, c1, target * prop1, p.use_real1, f(p.real_tax1)
        )
        wb2, wc2, gw2, nw2 = withdraw_net_target(
            b2, c2, target * (1.0 - prop1), p.use_real2, f(p.real_tax2)
        )
        b1 = jnp.where(wmask, wb1, b1)
        c1 = jnp.where(wmask, wc1, c1)
        b2 = jnp.where(wmask, wb2, b2)
        c2 = jnp.where(wmask, wc2, c2)
        gw = jnp.where(wmask, gw1 + gw2, 0.0)
        yg = yg + gw
        yr = yr + gw * carry.infl_ret / jnp.maximum(price0, EPS)
        fail_net = wmask & (need > EPS) & (nw1 + nw2 < need - ftol)

        # --- contributions (accumulation only); grows at each contribution year
        contrib_years = ((m - 1) // MONTHS_PER_YEAR).astype(dtype)
        contrib = f(p.monthly_contribution) * jnp.power(
            1.0 + f(p.contribution_growth), contrib_years
        )
        ca1 = contrib * f(p.alloc1)
        ca2 = contrib - ca1
        b1 = b1 + jnp.where(is_accum, ca1, 0.0)
        c1 = c1 + jnp.where(is_accum, ca1, 0.0)
        b2 = b2 + jnp.where(is_accum, ca2, 0.0)
        c2 = c2 + jnp.where(is_accum, ca2, 0.0)

        # --- monthly rebalance (runs even in the month a funding failure is
        #     detected; ruin-check deaths skip it)
        rmask = is_accum | wmask
        rb1, rc1, rb2, rc2 = rebalance(
            b1, c1, b2, c2, f(p.alloc1),
            p.use_real1, f(p.real_tax1), p.use_real2, f(p.real_tax2),
        )
        b1 = jnp.where(rmask, rb1, b1)
        c1 = jnp.where(rmask, rc1, c1)
        b2 = jnp.where(rmask, rb2, b2)
        c2 = jnp.where(rmask, rc2, c2)

        # --- annual mark-to-market taxes at absolute 12-month boundaries
        tmask = boundary & (is_accum | (wmask & ~fail_cap & ~fail_net))
        tb1, tc1, tb2, tc2, tfail = apply_annual_gain_taxes(
            b1, c1, b2, c2, g1acc, g2acc,
            f(p.alloc1),
            p.use_real1, f(p.real_tax1), f(p.ann_tax1),
            p.use_real2, f(p.real_tax2), f(p.ann_tax2),
        )
        b1 = jnp.where(tmask, tb1, b1)
        c1 = jnp.where(tmask, tc1, c1)
        b2 = jnp.where(tmask, tb2, b2)
        c2 = jnp.where(tmask, tc2, c2)
        g1acc = jnp.where(tmask, 0.0, g1acc)
        g2acc = jnp.where(tmask, 0.0, g2acc)
        preret_failed = carry.preret_failed | (is_accum & tmask & tfail)
        ret_tax_fail = in_ret & tmask & tfail

        # --- horizon end: settle a trailing partial tax period so terminal
        #     wealth is net of accrued liability (tax dates stay absolute)
        dies_regular = dies_a | dies_b | fail_cap | fail_net | ret_tax_fail
        smask = (
            (m == t_end)
            & ((W % MONTHS_PER_YEAR) != 0)
            & alive0
            & ~dies_regular
        )
        sb1, sc1, sb2, sc2, sfail = apply_annual_gain_taxes(
            b1, c1, b2, c2, g1acc, g2acc,
            f(p.alloc1),
            p.use_real1, f(p.real_tax1), f(p.ann_tax1),
            p.use_real2, f(p.real_tax2), f(p.ann_tax2),
        )
        b1 = jnp.where(smask, sb1, b1)
        c1 = jnp.where(smask, sc1, c1)
        b2 = jnp.where(smask, sb2, b2)
        c2 = jnp.where(smask, sc2, c2)
        settle_fail = smask & sfail

        # --- retirement-date snapshot & pre-retirement tax ruin
        at_w = m == W
        total2 = b1 + b2
        start_bal = jnp.where(at_w, total2, carry.start_bal)
        infl_ret = jnp.where(at_w, infl, carry.infl_ret)
        kill_at_w = at_w & preret_failed

        # --- death resolution
        ytr = carry.ytr
        ytr = jnp.where(dies_regular, (ret_idx.astype(dtype) + 1.0) / MONTHS_PER_YEAR, ytr)
        ytr = jnp.where(settle_fail, jnp.asarray(R, dtype=dtype), ytr)
        ytr = jnp.where(kill_at_w, 0.0, ytr)
        alive = alive0 & ~dies_regular & ~settle_fail & ~kill_at_w

        # --- first-retirement-year withdrawal capture
        year0 = (ret_idx // MONTHS_PER_YEAR) == 0
        cap_fy = act_ret & year0 & (dies_regular | year_end)
        fy_g = jnp.where(cap_fy, yg, carry.fy_g)
        fy_r = jnp.where(cap_fy, yr, carry.fy_r)

        # --- yearly records
        traj, price, wr = carry.traj, carry.price, carry.wr
        if track:
            slot = jnp.where(
                m <= W,
                jnp.where(at_w, full_wy + partial_wy, m // MONTHS_PER_YEAR),
                full_wy
                + partial_wy
                + (k + MONTHS_PER_YEAR - 1) // MONTHS_PER_YEAR,
            )
            slot = jnp.clip(slot, 0, traj_len - 1).astype(jnp.int32)
            zero = jnp.int32(0)
            rec_accum = is_accum & (boundary | (at_w & (partial_wy == 1)))
            rec_ret = act_ret & (dies_regular | (year_end & ~dies_regular))
            rec = rec_accum | rec_ret
            value = jnp.where(dies_regular, jnp.maximum(0.0, total2), total2)
            traj_col = jnp.where(rec, value, lax.dynamic_slice(
                traj, (zero, slot), (n_paths, 1)
            )[:, 0])
            traj = lax.dynamic_update_slice(traj, traj_col[:, None], (zero, slot))
            price_col = jnp.where(rec, infl, lax.dynamic_slice(
                price, (zero, slot), (n_paths, 1)
            )[:, 0])
            price = lax.dynamic_update_slice(price, price_col[:, None], (zero, slot))

            yslot = jnp.clip(k // MONTHS_PER_YEAR - 1, 0, R - 1).astype(jnp.int32)
            wr_mask = year_end & alive0 & ~dies_regular
            wr_value = jnp.where(
                carry.start_bal > EPS, yr / jnp.maximum(carry.start_bal, EPS) * 100.0, 0.0
            )
            wr_col = jnp.where(
                wr_mask, wr_value,
                lax.dynamic_slice(wr, (zero, yslot), (n_paths, 1))[:, 0],
            )
            wr = lax.dynamic_update_slice(wr, wr_col[:, None], (zero, yslot))

        new_carry = _Carry(
            b1=b1, c1=c1, b2=b2, c2=c2, infl=infl,
            g1acc=g1acc, g2acc=g2acc,
            alive=alive, preret_failed=preret_failed, ytr=ytr,
            start_bal=start_bal, infl_ret=infl_ret,
            yg=yg, yr=yr, fy_g=fy_g, fy_r=fy_r,
            fixed_nom=fixed_nom, traj=traj, price=price, wr=wr,
        )
        return new_carry, None

    months = jnp.arange(1, t_scan + 1, dtype=jnp.int32)
    if shocks is None:
        def gen_step(carry, m):
            z = monthly_shocks(stream_key, m, n_paths, f(p.rho), dtype)
            return step(carry, (m, z))

        final, _ = lax.scan(gen_step, init, months)
    else:
        sh = jnp.asarray(shocks, dtype=dtype)
        z_eq = sh[:, :, 0]
        z_inf = f(p.rho) * z_eq + jnp.sqrt(
            jnp.maximum(0.0, 1.0 - f(p.rho) ** 2)
        ) * sh[:, :, 1]
        z_prem = sh[:, :, 2]
        final, _ = lax.scan(step, init, (months, (z_eq, z_inf, z_prem)))

    return PathOutputs(
        success=final.alive,
        final_balance=jnp.maximum(0.0, final.b1 + final.b2),
        start_balance=final.start_bal,
        years_to_ruin=final.ytr,
        first_year_gross=final.fy_g,
        first_year_real_gross=final.fy_r,
        inflation_at_retirement=final.infl_ret,
        trajectory=final.traj,
        price_levels=final.price,
        withdrawal_rates=final.wr,
    )
