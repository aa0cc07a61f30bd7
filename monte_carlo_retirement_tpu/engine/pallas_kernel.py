"""Pallas TPU fast path: the full path lifetime in one on-chip kernel.

Why this exists: the XLA-scan kernel streams its ~10-vector carry through HBM
on every one of 600 scan steps (~100 GB of traffic for 1M paths), which caps
it around 400 ms/run. This kernel keeps ALL per-path state resident in VMEM
for the whole lifetime — the only HBM traffic is the final per-path outputs —
and generates shocks with the core-local PRNG (`pltpu.prng_random_bits`), so
the month loop is pure VPU compute.

Layout: paths are tiled into blocks of (rows, 128); the grid iterates blocks
(and, for candidate/scenario grids, a leading candidate axis whose rows
select per-candidate parameters from SMEM); each grid step runs the complete
month loop with a *static* trip count plus a scalar horizon guard (dynamic
`fori_loop` bounds miscompile at larger grids on this toolchain).
`working_months` stays a traced SMEM scalar, so candidates never recompile.

RNG: the per-core PRNG is seeded per (stream_seed, path-block) — candidate
axes never enter the seed — and each month draws three 23-bit uniforms ->
inverse-CDF normals (equity, inflation-independent, premium). Draws depend
only on (stream, block, month, lane): common random numbers across
working-month candidates and scenario grids hold structurally, like the XLA
path. The bit streams differ from XLA's threefry, so cross-backend parity is
statistical (Monte Carlo); the month *logic* is bit-identical and pinned by
injected-shocks parity tests against the scan kernel.

Entry points: `pallas_simulate` (per-path success/final), `pallas_probe`
(candidate-parallel success probabilities for the search),
`pallas_simulate_full` (adds retirement snapshots and the yearly
trajectory/price/withdrawal-rate series via in-ref stores), and
`pallas_scenario_grid` (per-row parameter sweeps).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MONTHS_PER_YEAR, SMALL_EPSILON
from ..models.retirement import SimParams
from ..ops.tax import (
    apply_annual_gain_taxes,
    fail_rtol,
    rebalance,
    sale_tax_profile,
    withdraw_net_target,
)

EPS = SMALL_EPSILON

BLOCK_ROWS = 256  # paths per block = BLOCK_ROWS * 128 = 32768
BLOCK_PATHS = BLOCK_ROWS * 128

# fparams vector layout (float32, SMEM)
(
    F_MU1_M, F_S1_M, F_MUI_M, F_SI_M, F_MUP_M, F_SP_M,
    F_RHO, F_RHO_C,
    F_ALLOC1, F_INIT_BAL, F_CONTRIB0, F_LOG1P_GROWTH, F_EXPENSES,
    F_USE_REAL1, F_R_REAL1, F_R_ANN1,
    F_USE_REAL2, F_R_REAL2, F_R_ANN2,
    NUM_FPARAMS,
) = range(20)

# iparams vector layout (int32, SMEM)
I_W, I_T_END, I_SEED, NUM_IPARAMS = range(4)

_INV_2_23 = 1.0 / float(1 << 23)
_SQRT2 = math.sqrt(2.0)


def _uniform(shape):
    """Uniform in (0, 1), never exactly 0 or 1 (safe for erfinv/log).

    Uses 23 random bits so that (r + 0.5) is exactly representable in
    float32: with 24 bits, r + 0.5 rounds up to 2^24 for the top value and
    the uniform hits exactly 1.0 — erf_inv(1) = inf, which poisoned ~1 in
    2^24 draws with NaNs. Max |2u-1| is now 1 - 2^-23, i.e. normal tails
    reach ~5.4 sigma.
    """
    bits = pltpu.prng_random_bits(shape)
    # Logical shift on the int32 view keeps the top 23 bits as a nonnegative
    # int32 (Mosaic has no uint32->f32 cast).
    reduced = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.int32), jnp.int32(9)
    )
    return (reduced.astype(jnp.float32) + 0.5) * _INV_2_23


def _normal(shape):
    """One standard normal per lane via the inverse-CDF transform.

    z = sqrt(2) * erfinv(2u - 1): branch-free, trig-free, and exactly the
    construction jax.random.normal uses — Box-Muller's sin/cos lower poorly
    on the TPU vector unit, erf_inv is a short polynomial.
    """
    u = _uniform(shape)
    return _SQRT2 * jax.lax.erf_inv(2.0 * u - 1.0)


def _three_normals(shape):
    return _normal(shape), _normal(shape), _normal(shape)


def _make_kernel(
    n_streams: int,
    retirement_years: int,
    with_shocks: bool,
    t_scan: int = 0,
    block_axis: int = 0,
    cand_axis=None,
    rows: int = BLOCK_ROWS,
    traj_len: int = 0,
    multi_params: bool = False,
):
    """Build the block kernel for a static (n_streams, R, debug-shock) combo.

    ``t_scan`` > 0 pins the month loop to a static trip count with a
    per-month horizon guard; 0 uses the dynamic bound W + 12R.
    ``block_axis`` names the grid axis that indexes path blocks; in
    candidate-parallel probes the grid is (candidates, blocks) and iparams is
    blocked per candidate, so each grid step gets its own working_months
    while the PRNG seed depends only on the path block (common random
    numbers across candidates by construction).
    """
    R = retirement_years
    shape = (rows, 128)
    track = traj_len > 0
    frtol = fail_rtol(jnp.float32)

    def kernel(iparams, fparams, *rest):
        rest = list(rest)
        if n_streams:
            s_amount, s_from_t0, s_duration, s_indexed, s_tax = rest[:5]
            rest = rest[5:]
        if with_shocks:
            shocks_ref = rest.pop(0)
        if track:
            (out_success, out_final, out_start, out_ytr, out_fyg, out_fyr,
             out_inflret, out_traj, out_price, out_wr) = rest
        else:
            out_success, out_final = rest

        row = pl.program_id(cand_axis) if cand_axis is not None else 0
        w = iparams[row, I_W]
        t_end = iparams[row, I_T_END]
        if multi_params:
            # Scenario grids: every float parameter (and stream table) is a
            # per-candidate row, so one kernel dispatch sweeps a config grid.
            # Read the row ONCE here — per-use SMEM reads inside the month
            # loop defeat loop-invariant hoisting and cost ~25x.
            fvals = [fparams[row, i] for i in range(NUM_FPARAMS)]
            f = lambda i: fvals[i]
            _cells = {}

            def stream_cell(arr, s):
                key = (id(arr), s)
                if key not in _cells:
                    _cells[key] = arr[row, s]
                return _cells[key]
        else:
            # Hoist every SMEM parameter read out of the month loop (per-use
            # reads measurably serialize against the loop).
            fvals = [fparams[i] for i in range(NUM_FPARAMS)]
            f = lambda i: fvals[i]
            if n_streams:
                _svals = {
                    id(arr): [arr[s] for s in range(n_streams)]
                    for arr in (s_amount, s_from_t0, s_duration, s_indexed,
                                s_tax)
                }
                stream_cell = lambda arr, s: _svals[id(arr)][s]
            else:
                stream_cell = lambda arr, s: arr[s]
        w_f = w.astype(jnp.float32)

        if not with_shocks:
            # Per-(stream, path-block) seed: golden-ratio mix keeps block
            # streams decorrelated; int32 overflow wraps, which is fine for
            # mixing. Candidate grid axes do NOT enter the seed (CRN).
            pltpu.prng_seed(
                iparams[row, I_SEED]
                ^ (pl.program_id(block_axis) * jnp.int32(-1640531527))
            )

        alloc1 = f(F_ALLOC1)
        use_real1 = f(F_USE_REAL1) > 0.5
        use_real2 = f(F_USE_REAL2) > 0.5

        def monthly_rebalance(b1, c1, b2, c2):
            return rebalance(
                b1, c1, b2, c2, alloc1,
                use_real1, f(F_R_REAL1), use_real2, f(F_R_REAL2),
            )

        def annual_tax(b1, c1, b2, c2, g1a, g2a):
            return apply_annual_gain_taxes(
                b1, c1, b2, c2, g1a, g2a,
                alloc1,
                use_real1, f(F_R_REAL1), f(F_R_ANN1),
                use_real2, f(F_R_REAL2), f(F_R_ANN2),
            )

        if n_streams:
            stream_start = [
                jnp.maximum(
                    0.0,
                    jnp.ceil(
                        jnp.maximum(0.0, stream_cell(s_from_t0, s) - w_f) - EPS
                    ),
                )
                for s in range(n_streams)
            ]

        # A zero vector with a materialized (non-replicated) layout: loop
        # carries seeded from replicated constants would force the body's
        # computed vectors into an invalid relayout under Mosaic.
        zero_v = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ).astype(jnp.float32) * 0.0
        b1_0 = zero_v + f(F_INIT_BAL) * alloc1
        b2_0 = zero_v + f(F_INIT_BAL) - b1_0
        if track:
            # Series buffers live directly in the (VMEM) output refs —
            # Mosaic has no dynamic_update_slice on loop-carried values,
            # and in-ref stores avoid carrying the buffers entirely.
            out_traj[:] = jnp.zeros((traj_len, rows, 128), jnp.float32)
            out_traj[0] = zero_v + f(F_INIT_BAL)
            out_price[:] = jnp.ones((traj_len, rows, 128), jnp.float32)
            out_wr[:] = jnp.full((R, rows, 128), jnp.nan, jnp.float32)
            tracked0 = (
                zero_v + jnp.nan,                        # years_to_ruin
                zero_v + f(F_INIT_BAL),                  # start_balance
                zero_v + 1.0,                            # inflation at ret.
                zero_v,                                  # yg (year gross)
                zero_v,                                  # yr (year real gross)
                zero_v,                                  # first-year gross
                zero_v,                                  # first-year real
            )
        else:
            tracked0 = ()
        init = (
            b1_0, b1_0, b2_0, b2_0,                      # b1, c1, b2, c2
            zero_v + 1.0,                                # infl
            zero_v,                                      # g1acc
            zero_v,                                      # g2acc
            zero_v + 1.0,                                # alive (0/1 flag)
            zero_v,                                      # preret_failed (0/1)
            tuple(zero_v - 1.0 for _ in range(n_streams)),
        ) + tracked0

        full_wy = w // MONTHS_PER_YEAR
        partial_wy = (w % MONTHS_PER_YEAR != 0).astype(jnp.int32)


        def draw(m):
            if with_shocks:
                z_eq = shocks_ref[m - 1, 0]
                z_ind = shocks_ref[m - 1, 1]
                z_prem = shocks_ref[m - 1, 2]
            else:
                z_eq, z_ind, z_prem = _three_normals(shape)
            z_inf = f(F_RHO) * z_eq + f(F_RHO_C) * z_ind
            g1 = jnp.exp(f(F_MU1_M) + f(F_S1_M) * z_eq)
            gi = jnp.exp(f(F_MUI_M) + f(F_SI_M) * z_inf)
            gp = jnp.exp(f(F_MUP_M) + f(F_SP_M) * z_prem)
            return g1, gi, gi * gp

        def accum_month(m, st):
            b1, c1, b2, c2, infl, g1a, g2a, alive_f, preret_f, fixed = st[:10]
            tracked = st[10:]
            g1, gi, g2 = draw(m)
            g1a = g1a + b1 * (g1 - 1.0)
            g2a = g2a + b2 * (g2 - 1.0)
            b1 = b1 * g1
            b2 = b2 * g2
            infl = infl * gi

            years = ((m - 1) // MONTHS_PER_YEAR).astype(jnp.float32)
            contrib = f(F_CONTRIB0) * jnp.exp(f(F_LOG1P_GROWTH) * years)
            ca1 = contrib * alloc1
            ca2 = contrib - ca1
            b1, c1 = b1 + ca1, c1 + ca1
            b2, c2 = b2 + ca2, c2 + ca2

            b1, c1, b2, c2 = monthly_rebalance(b1, c1, b2, c2)

            def on_boundary(args):
                b1, c1, b2, c2, g1a, g2a, preret_f = args
                tb1, tc1, tb2, tc2, tfail = annual_tax(b1, c1, b2, c2, g1a, g2a)
                # Zeros derived from live vectors keep branch layouts equal
                # (replicated constants trip Mosaic's cond relayout).
                return (
                    tb1, tc1, tb2, tc2,
                    g1a * 0.0, g2a * 0.0,
                    jnp.where(tfail, 1.0, preret_f),
                )

            b1, c1, b2, c2, g1a, g2a, preret_f = lax.cond(
                m % MONTHS_PER_YEAR == 0,
                on_boundary,
                lambda a: a,
                (b1, c1, b2, c2, g1a, g2a, preret_f),
            )
            # Pre-retirement tax ruin takes effect on the retirement date.
            at_w = m == w
            alive_f = jnp.where(at_w & (preret_f > 0.5), 0.0, alive_f)
            if track:
                ytr, start_bal, infl_ret, yg, yr, fy_g, fy_r = tracked
                start_bal = jnp.where(at_w, b1 + b2, start_bal)
                infl_ret = jnp.where(at_w, infl, infl_ret)
                ytr = jnp.where(at_w & (preret_f > 0.5), 0.0, ytr)
                # Yearly sample at full working years and at a partial-year
                # retirement date (scalar predicates; one slot per month).
                rec = ((m % MONTHS_PER_YEAR) == 0) | (at_w & (partial_wy == 1))
                slot = jnp.clip(
                    jnp.where(at_w, full_wy + partial_wy,
                              m // MONTHS_PER_YEAR),
                    0, traj_len - 1,
                ).astype(jnp.int32)
                total_rec = b1 + b2
                infl_rec = infl

                @pl.when(rec)
                def _():
                    out_traj[pl.ds(slot, 1)] = total_rec[None]
                    out_price[pl.ds(slot, 1)] = infl_rec[None]

                tracked = (ytr, start_bal, infl_ret, yg, yr, fy_g, fy_r)
            return (b1, c1, b2, c2, infl, g1a, g2a, alive_f, preret_f,
                    fixed) + tracked

        def ret_month(m, st):
            b1, c1, b2, c2, infl, g1a, g2a, alive_f, preret_f, fixed = st[:10]
            tracked = st[10:]
            alive = alive_f > 0.5
            alive0_f = alive_f
            k = m - w
            ret_idx = k - 1
            ret_idx_f = (k - 1).astype(jnp.float32)
            if track:
                ytr, start_bal, infl_ret, yg, yr, fy_g, fy_r = tracked
                new_year = (ret_idx % MONTHS_PER_YEAR) == 0
                yg = jnp.where(new_year, 0.0, yg)
                yr = jnp.where(new_year, 0.0, yr)

            price0 = infl
            expenses = f(F_EXPENSES) * price0
            net_income = jnp.zeros(shape, jnp.float32)
            new_fixed = []
            for s in range(n_streams):
                amount_s = stream_cell(s_amount, s)
                active = (ret_idx_f >= stream_start[s]) & (
                    ret_idx_f < stream_start[s] + stream_cell(s_duration, s)
                )
                fixed_s = jnp.where(
                    active & (ret_idx_f == stream_start[s]) & (fixed[s] < 0),
                    amount_s * price0,
                    fixed[s],
                )
                nominal = jnp.where(
                    stream_cell(s_indexed, s) > 0.5, amount_s * price0, fixed_s
                )
                net_income = net_income + jnp.where(
                    active, nominal * (1.0 - stream_cell(s_tax, s)), 0.0
                )
                new_fixed.append(fixed_s)
            need = jnp.maximum(0.0, expenses - net_income)

            total0 = b1 + b2
            dies_a = alive & (total0 <= EPS) & (need > EPS)

            g1, gi, g2 = draw(m)
            gmask = alive & ~dies_a
            g1a = g1a + jnp.where(gmask, b1 * (g1 - 1.0), 0.0)
            g2a = g2a + jnp.where(gmask, b2 * (g2 - 1.0), 0.0)
            b1 = jnp.where(gmask, b1 * g1, b1)
            b2 = jnp.where(gmask, b2 * g2, b2)
            infl = jnp.where(gmask, infl * gi, infl)

            total1 = b1 + b2
            dies_b = gmask & (total1 <= EPS) & (need > EPS)
            b1 = jnp.where(dies_b, jnp.maximum(0.0, b1), b1)
            b2 = jnp.where(dies_b, jnp.maximum(0.0, b2), b2)

            wmask = gmask & ~dies_b
            eff1, nc1 = sale_tax_profile(b1, c1, use_real1, f(F_R_REAL1))
            eff2, nc2 = sale_tax_profile(b2, c2, use_real2, f(F_R_REAL2))
            tnc = nc1 + nc2
            target = jnp.maximum(0.0, jnp.minimum(need, tnc))
            ftol = EPS + frtol * (need + total1)
            fail_cap = wmask & (need > EPS) & (target < need - ftol)
            prop1 = jnp.where(
                tnc > EPS, nc1 / jnp.where(tnc > EPS, tnc, 1.0), alloc1
            )

            wb1, wc1, gw1, nw1 = withdraw_net_target(
                b1, c1, target * prop1, use_real1, f(F_R_REAL1), eff_tax=eff1
            )
            wb2, wc2, gw2, nw2 = withdraw_net_target(
                b2, c2, target * (1.0 - prop1), use_real2, f(F_R_REAL2),
                eff_tax=eff2,
            )
            b1 = jnp.where(wmask, wb1, b1)
            c1 = jnp.where(wmask, wc1, c1)
            b2 = jnp.where(wmask, wb2, b2)
            c2 = jnp.where(wmask, wc2, c2)
            fail_net = wmask & (need > EPS) & (nw1 + nw2 < need - ftol)
            if track:
                gw = jnp.where(wmask, gw1 + gw2, 0.0)
                yg = yg + gw
                yr = yr + gw * infl_ret / jnp.maximum(price0, EPS)

            rb1, rc1, rb2, rc2 = monthly_rebalance(b1, c1, b2, c2)
            b1 = jnp.where(wmask, rb1, b1)
            c1 = jnp.where(wmask, rc1, c1)
            b2 = jnp.where(wmask, rb2, b2)
            c2 = jnp.where(wmask, rc2, c2)

            # Annual tax at absolute boundaries / terminal settle share one
            # subgraph (mutually exclusive scalar triggers).
            tmask_ok = wmask & ~fail_cap & ~fail_net
            is_boundary = (m % MONTHS_PER_YEAR) == 0
            is_settle = (m == t_end) & ((w % MONTHS_PER_YEAR) != 0)
            dies_pre = dies_a | dies_b | fail_cap | fail_net

            def apply_tax(args):
                b1, c1, b2, c2, g1a, g2a = args
                tb1, tc1, tb2, tc2, tfail = annual_tax(b1, c1, b2, c2, g1a, g2a)
                # Pure boolean algebra (no bool-vector select; Mosaic-safe):
                mask = (is_boundary & tmask_ok) | (
                    ~is_boundary & alive & ~dies_pre
                )
                return (
                    jnp.where(mask, tb1, b1),
                    jnp.where(mask, tc1, c1),
                    jnp.where(mask, tb2, b2),
                    jnp.where(mask, tc2, c2),
                    jnp.where(mask & is_boundary, 0.0, g1a),
                    jnp.where(mask & is_boundary, 0.0, g2a),
                    # Cond outputs must not be i1 vectors (Mosaic): 0/1 f32.
                    jnp.where(mask & tfail, 1.0, g1a * 0.0),
                )

            b1, c1, b2, c2, g1a, g2a, tfail_f = lax.cond(
                is_boundary | is_settle,
                apply_tax,
                lambda a: a + (a[4] * 0.0,),
                (b1, c1, b2, c2, g1a, g2a),
            )
            dies = dies_pre | (tfail_f > 0.5)
            settle_failed = is_settle & (tfail_f > 0.5)
            dies_regular = dies & ~settle_failed
            alive_f = jnp.where(dies, 0.0, alive_f)
            if track:
                ytr = jnp.where(
                    dies_regular,
                    (ret_idx.astype(jnp.float32) + 1.0) / MONTHS_PER_YEAR,
                    ytr,
                )
                ytr = jnp.where(settle_failed, jnp.float32(R), ytr)
                year0 = (ret_idx // MONTHS_PER_YEAR) == 0
                year_end = (k % MONTHS_PER_YEAR) == 0
                cap_fy = (alive0_f > 0.5) & year0 & (dies_regular | year_end)
                fy_g = jnp.where(cap_fy, yg, fy_g)
                fy_r = jnp.where(cap_fy, yr, fy_r)

                slot = jnp.clip(
                    full_wy + partial_wy
                    + (k + MONTHS_PER_YEAR - 1) // MONTHS_PER_YEAR,
                    0, traj_len - 1,
                ).astype(jnp.int32)
                yslot = jnp.clip(
                    k // MONTHS_PER_YEAR - 1, 0, R - 1
                ).astype(jnp.int32)
                total2 = b1 + b2
                # Dead paths froze at death, so total2 is the at-death
                # balance for deaths this year; older deaths pad zero.
                death_k = jnp.round(ytr * MONTHS_PER_YEAR)
                y_f = (k // MONTHS_PER_YEAR - 1).astype(jnp.float32)
                died_this_year = (
                    death_k > y_f * MONTHS_PER_YEAR + 0.5
                ) & (death_k < k.astype(jnp.float32) + 0.5)
                alive_now = alive_f > 0.5
                wmask_rec = alive_now | died_this_year
                value_rec = jnp.where(
                    wmask_rec,
                    jnp.where(alive_now, total2, jnp.maximum(0.0, total2)),
                    0.0,  # non-recording dead paths keep their zero padding
                )
                infl_rec = infl
                # WR recorded for paths that completed the whole year
                # (includes a failed terminal settle, like the reference).
                wr_mask = (alive0_f > 0.5) & ~dies_regular
                wr_value = jnp.where(
                    start_bal > EPS,
                    yr / jnp.maximum(start_bal, EPS) * 100.0,
                    0.0,
                )

                @pl.when((k % MONTHS_PER_YEAR) == 0)
                def _():
                    old_t = out_traj[pl.ds(slot, 1)][0]
                    out_traj[pl.ds(slot, 1)] = jnp.where(
                        wmask_rec, value_rec, old_t
                    )[None]
                    # Unconditional: dead paths' infl froze at death, so this
                    # carries the at-death price level into post-death slots
                    # (reference padding, backend/simulation.py:902-937).
                    out_price[pl.ds(slot, 1)] = infl_rec[None]
                    old_w = out_wr[pl.ds(yslot, 1)][0]
                    out_wr[pl.ds(yslot, 1)] = jnp.where(
                        wr_mask, wr_value, old_w
                    )[None]

                tracked = (ytr, start_bal, infl_ret, yg, yr, fy_g, fy_r)
            return (b1, c1, b2, c2, infl, g1a, g2a, alive_f, preret_f,
                    tuple(new_fixed)) + tracked

        def month(m, st):
            return lax.cond(
                m <= w,
                lambda s: accum_month(m, s),
                lambda s: ret_month(m, s),
                st,
            )

        if t_scan:
            def month_guarded(m, st):
                return lax.cond(m <= t_end, lambda s: month(m, s),
                                lambda s: s, st)

            final = lax.fori_loop(1, t_scan + 1, month_guarded, init)
        else:
            final = lax.fori_loop(1, t_end + 1, month, init)
        b1, c1, b2, c2 = final[0], final[1], final[2], final[3]
        # alive flag is already a 0/1 float32; reshape covers both the
        # (rows, 128) single-candidate and (1, rows, 128) probe out blocks.
        out_success[:] = final[7].reshape(out_success.shape)
        out_final[:] = jnp.maximum(0.0, b1 + b2).reshape(out_final.shape)
        if track:
            ytr, start_bal, infl_ret, _yg, _yr, fy_g, fy_r = final[10:]
            out_ytr[:] = ytr.reshape(out_ytr.shape)
            out_start[:] = start_bal.reshape(out_start.shape)
            out_inflret[:] = infl_ret.reshape(out_inflret.shape)
            out_fyg[:] = fy_g.reshape(out_fyg.shape)
            out_fyr[:] = fy_r.reshape(out_fyr.shape)

    return kernel


def _pack_params(params: SimParams, seed: int, working_months, retirement_years):
    sq = math.sqrt(MONTHS_PER_YEAR)
    f32 = jnp.float32
    fp = jnp.stack(
        [
            params.mu1.astype(f32) / MONTHS_PER_YEAR,
            params.sigma1.astype(f32) / sq,
            params.mu_inf.astype(f32) / MONTHS_PER_YEAR,
            params.sigma_inf.astype(f32) / sq,
            params.mu_prem.astype(f32) / MONTHS_PER_YEAR,
            params.sigma_prem.astype(f32) / sq,
            params.rho.astype(f32),
            jnp.sqrt(jnp.maximum(0.0, 1.0 - params.rho.astype(f32) ** 2)),
            params.alloc1.astype(f32),
            params.initial_balance.astype(f32),
            params.monthly_contribution.astype(f32),
            jnp.log1p(params.contribution_growth.astype(f32)),
            params.monthly_expenses.astype(f32),
            params.use_real1.astype(f32),
            params.real_tax1.astype(f32),
            params.ann_tax1.astype(f32),
            params.use_real2.astype(f32),
            params.real_tax2.astype(f32),
            params.ann_tax2.astype(f32),
        ]
    )
    w = jnp.asarray(working_months, jnp.int32).reshape(-1)  # (K,) candidates
    seeds = jnp.broadcast_to(jnp.asarray(seed, jnp.int32), w.shape)
    ip = jnp.stack(
        [w, w + jnp.int32(MONTHS_PER_YEAR * retirement_years), seeds],
        axis=1,
    )  # (K, NUM_IPARAMS)
    return ip, fp


@partial(
    jax.jit,
    static_argnames=("n_paths", "retirement_years", "n_streams", "with_shocks",
                     "interpret", "t_scan"),
)
def pallas_simulate(
    params: SimParams,
    working_months,
    seed,
    *,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    shocks: Optional[jnp.ndarray] = None,
    with_shocks: bool = False,
    interpret: bool = False,
    t_scan: int = 0,
):
    """Probe-mode simulation on the Pallas TPU kernel.

    Returns (success_f32, final_balance) of shape (n_padded,); the caller
    slices [:n_paths]. ``shocks`` (debug/parity only): (T, 3, BLOCK_ROWS, 128)
    pre-drawn independent normals for a single block. ``t_scan`` > 0 selects
    a static month-loop trip count (must be >= W + 12R).
    """
    assert n_streams == params.n_streams
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp = _pack_params(params, seed, working_months, retirement_years)

    kernel = _make_kernel(n_streams, retirement_years, with_shocks, t_scan)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iparams
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fparams
    ]
    inputs = [ip, fp]
    if n_streams:
        f32 = jnp.float32
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        inputs += [
            params.stream_amount.astype(f32),
            params.stream_months_from_t0.astype(f32),
            jnp.minimum(
                params.stream_duration_months.astype(f32), jnp.float32(3.0e7)
            ),
            params.stream_indexed.astype(f32),
            params.stream_tax.astype(f32),
        ]
    if with_shocks:
        assert n_blocks == 1, "injected shocks support a single block only"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(shocks.astype(jnp.float32))

    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, 128), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    success, final = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    return success.reshape(-1), final.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("n_candidates", "n_paths", "retirement_years",
                     "n_streams", "t_scan", "interpret"),
)
def pallas_probe(
    params: SimParams,
    months,
    seed,
    *,
    n_candidates: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    t_scan: int,
    interpret: bool = False,
):
    """Candidate-parallel probe: one dispatch for a whole candidate batch.

    The grid is (candidates, path-blocks); iparams is blocked per candidate
    so every grid step simulates its own working_months, while the PRNG seed
    depends only on the path-block axis — all candidates therefore see
    identical shock draws (common random numbers), exactly like the XLA
    probe path. Returns per-candidate success probabilities in percent,
    shape (n_candidates,).
    """
    assert n_streams == params.n_streams
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp = _pack_params(params, seed, months, retirement_years)

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=False, t_scan=t_scan,
        block_axis=1, cand_axis=0,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # full (K, 3); row = pid(0)
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [ip, fp]
    if n_streams:
        f32 = jnp.float32
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        inputs += [
            params.stream_amount.astype(f32),
            params.stream_months_from_t0.astype(f32),
            jnp.minimum(
                params.stream_duration_months.astype(f32), jnp.float32(3.0e7)
            ),
            params.stream_indexed.astype(f32),
            params.stream_tax.astype(f32),
        ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_candidates, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
        jax.ShapeDtypeStruct(
            (n_candidates, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    success, _final = pl.pallas_call(
        kernel,
        grid=(n_candidates, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    flat = success.reshape(n_candidates, -1)[:, :n_paths]
    return jnp.mean(flat, axis=1) * 100.0


FULL_BLOCK_ROWS = 32  # smaller path blocks in full mode: the trajectory
# buffers ((traj_len + R) x rows x 128 floats) must fit VMEM alongside state.


@partial(
    jax.jit,
    static_argnames=("n_paths", "retirement_years", "n_streams", "traj_len",
                     "t_scan", "with_shocks", "interpret"),
)
def pallas_simulate_full(
    params: SimParams,
    working_months,
    seed,
    *,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    traj_len: int,
    t_scan: int,
    shocks=None,
    with_shocks: bool = False,
    interpret: bool = False,
):
    """Full-statistics simulation on the Pallas kernel.

    Returns a dict of per-path arrays: success/final/start/ytr/fy_g/fy_r/
    infl_ret of shape (n_padded,), trajectory/price (n_padded, traj_len) and
    wr (n_padded, R). Same semantics as the XLA scan kernel's tracked mode
    (pinned by the injected-shocks parity suite).

    RNG note: probe mode (BLOCK_ROWS) and full mode (FULL_BLOCK_ROWS) tile
    paths differently, so the same path index sees different draws — the two
    entry points use independent bit streams. CRN (same (stream, month) →
    same shocks across candidate months) holds *within* each entry point,
    which is where the search relies on it; search and final runs are on
    independent seed streams by design anyway.
    """
    assert n_streams == params.n_streams
    rows = FULL_BLOCK_ROWS
    block_paths = rows * 128
    n_blocks = max(1, -(-n_paths // block_paths))
    ip, fp = _pack_params(params, seed, working_months, retirement_years)
    R = retirement_years

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=with_shocks, t_scan=t_scan,
        rows=rows, traj_len=traj_len,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs = [ip, fp]
    if n_streams:
        f32 = jnp.float32
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        inputs += [
            params.stream_amount.astype(f32),
            params.stream_months_from_t0.astype(f32),
            jnp.minimum(
                params.stream_duration_months.astype(f32), jnp.float32(3.0e7)
            ),
            params.stream_indexed.astype(f32),
            params.stream_tax.astype(f32),
        ]
    if with_shocks:
        assert n_blocks == 1, "injected shocks support a single block only"
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        inputs.append(shocks.astype(jnp.float32))

    n_pad = n_blocks * rows
    vec = jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)
    vec_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    series = lambda L: jax.ShapeDtypeStruct((L, n_pad, 128), jnp.float32)
    series_spec = pl.BlockSpec(
        (traj_len, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    wr_spec = pl.BlockSpec(
        (R, rows, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    out_shape = [vec] * 7 + [series(traj_len), series(traj_len), series(R)]
    out_specs = [vec_spec] * 7 + [series_spec, series_spec, wr_spec]

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    (succ, final, start, ytr, fy_g, fy_r, infl_ret, traj, price, wr) = outs
    flat = lambda x: x.reshape(-1)
    # (L, rows, 128) -> (path, L) with path = row * 128 + lane, matching the
    # flattening of the per-path vectors above.
    per_path_series = lambda x: jnp.transpose(x, (1, 2, 0)).reshape(
        n_pad * 128, -1
    )
    return {
        "success": flat(succ),
        "final_balance": flat(final),
        "start_balance": flat(start),
        "years_to_ruin": flat(ytr),
        "first_year_gross": flat(fy_g),
        "first_year_real_gross": flat(fy_r),
        "inflation_at_retirement": flat(infl_ret),
        "trajectory": per_path_series(traj),
        "price_levels": per_path_series(price),
        "withdrawal_rates": per_path_series(wr),
    }


@partial(
    jax.jit,
    static_argnames=("n_scenarios", "n_paths", "retirement_years",
                     "n_streams", "t_scan", "interpret"),
)
def pallas_scenario_grid(
    params_batch: SimParams,
    months,
    seed,
    *,
    n_scenarios: int,
    n_paths: int,
    retirement_years: int,
    n_streams: int,
    t_scan: int,
    interpret: bool = False,
):
    """Scenario-grid probe: every (config, working_months) pair in one
    dispatch on the Pallas kernel.

    ``params_batch`` is a struct-of-arrays SimParams (leading scenario axis,
    see engine.scenario_batch.stack_params); the kernel grid is
    (scenarios, path-blocks) with per-row parameters and path-block-only PRNG
    seeding, so the whole grid shares shock draws (CRN across scenarios).
    Returns success probabilities in percent, shape (n_scenarios,).
    """
    # Batched SimParams carry streams as (K, S); n_streams is the last axis.
    assert n_streams == int(params_batch.stream_amount.shape[-1])
    n_blocks = max(1, -(-n_paths // BLOCK_PATHS))
    ip, fp_rows = _pack_params(params_batch, seed, months, retirement_years)
    # _pack_params stacks per-parameter vectors of shape (K,) -> fp (NF, K);
    # the kernel wants rows per scenario: (K, NF).
    fp = jnp.transpose(fp_rows)

    kernel = _make_kernel(
        n_streams, retirement_years, with_shocks=False, t_scan=t_scan,
        block_axis=1, cand_axis=0, multi_params=True,
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # iparams (K, 3)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fparams (K, NF)
    ]
    inputs = [ip, fp]
    if n_streams:
        f32 = jnp.float32
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        inputs += [
            params_batch.stream_amount.astype(f32),
            params_batch.stream_months_from_t0.astype(f32),
            jnp.minimum(
                params_batch.stream_duration_months.astype(f32),
                jnp.float32(3.0e7),
            ),
            params_batch.stream_indexed.astype(f32),
            params_batch.stream_tax.astype(f32),
        ]
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_scenarios, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
        jax.ShapeDtypeStruct(
            (n_scenarios, n_blocks * BLOCK_ROWS, 128), jnp.float32
        ),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, 128), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    success, _final = pl.pallas_call(
        kernel,
        grid=(n_scenarios, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    flat = success.reshape(n_scenarios, -1)[:, :n_paths]
    return jnp.mean(flat, axis=1) * 100.0
