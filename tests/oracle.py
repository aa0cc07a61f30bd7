"""An independent, deliberately-simple NumPy oracle of the model semantics.

Used only by the fuzz/differential tests: it re-derives the monthly lifecycle
from the model definition (README 'Design notes' + SURVEY §2 contracts) in
plain sequential Python, structured around a mutable PathState — nothing is
shared with the compiled kernels except the shock values, so agreement
between the two is meaningful evidence of correctness.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil, exp, nan, sqrt

import numpy as np

from monte_carlo_retirement_tpu.config import Config
from monte_carlo_retirement_tpu.models.retirement import arithmetic_to_log_params

EPS = 1e-6
MPY = 12


@dataclass
class AssetTax:
    use_realized: bool
    realized_rate: float
    annual_rate: float


@dataclass
class Asset:
    balance: float
    basis: float
    tax: AssetTax
    gain_acc: float = 0.0

    def net_liquidation(self) -> float:
        if self.balance <= EPS:
            return 0.0
        gain = max(0.0, self.balance - self.basis)
        due = gain * self.tax.realized_rate if self.tax.use_realized else 0.0
        return max(0.0, self.balance - due)

    def sell_for_net(self, net_target: float):
        """Returns (gross, net) and mutates balance/basis."""
        if self.balance <= EPS or net_target <= 0:
            self.balance = max(0.0, self.balance)
            self.basis = max(0.0, self.basis)
            return 0.0, 0.0
        gain_frac = max(0.0, self.balance - self.basis) / self.balance
        eff = gain_frac * self.tax.realized_rate if self.tax.use_realized else 0.0
        gross = min(net_target / max(EPS, 1.0 - eff), self.balance)
        frac = min(1.0, gross / self.balance)
        removed = min(self.basis, self.basis * frac)
        taxable = max(0.0, gross - removed)
        paid = taxable * self.tax.realized_rate if self.tax.use_realized else 0.0
        net = max(0.0, gross - paid)
        self.balance = max(0.0, self.balance - gross)
        self.basis = max(0.0, self.basis - removed)
        if self.balance <= EPS:
            self.balance = self.basis = 0.0
        return gross, net


@dataclass
class PathState:
    a1: Asset
    a2: Asset
    price: float = 1.0
    alive: bool = True
    preret_failed: bool = False
    years_to_ruin: float = nan


def _rebalance(state: PathState, alloc1: float) -> None:
    a1, a2 = state.a1, state.a2
    total = a1.balance + a2.balance
    if total <= EPS:
        return
    drift1 = a1.balance - total * alloc1
    if abs(drift1) <= EPS:
        return
    if drift1 > 0:
        seller, buyer, alloc_s, drift = a1, a2, alloc1, drift1
    else:
        seller, buyer = a2, a1
        alloc_s = 1.0 - alloc1
        drift = a2.balance - total * alloc_s
    gain_frac = max(0.0, seller.balance - seller.basis) / seller.balance
    per_dollar = gain_frac * seller.tax.realized_rate if seller.tax.use_realized else 0.0
    gross = min(seller.balance, drift / max(EPS, 1.0 - alloc_s * per_dollar))
    frac = gross / seller.balance
    removed = min(seller.basis, seller.basis * frac)
    paid = (
        max(0.0, gross - removed) * seller.tax.realized_rate
        if seller.tax.use_realized else 0.0
    )
    seller.balance = max(0.0, seller.balance - gross)
    seller.basis = max(0.0, seller.basis - removed)
    buyer.balance += gross - paid
    buyer.basis += gross - paid
    for asset in (seller, buyer):
        if asset.balance <= EPS:
            asset.balance = asset.basis = 0.0


def _annual_taxes(state: PathState, alloc1: float) -> bool:
    """Settle one tax period. Returns True when the bill was unpayable."""
    bills = [
        0.0 if a.tax.use_realized else max(0.0, a.gain_acc) * a.tax.annual_rate
        for a in (state.a1, state.a2)
    ]
    due = sum(bills)
    caps = [a.net_liquidation() for a in (state.a1, state.a2)]
    capacity = sum(caps)
    payment = min(due, capacity)
    failed = payment < due - EPS
    if capacity > EPS and payment > 0:
        delivered = 0.0
        for asset, cap in zip((state.a1, state.a2), caps):
            _, net = asset.sell_for_net(payment * cap / capacity)
            delivered += net
        if delivered < due - EPS:
            failed = True
    _rebalance(state, alloc1)
    return failed


def simulate_path_oracle(
    config: Config, working_months: int, shocks: np.ndarray,
    jump_shocks: np.ndarray | None = None,
    mort_u: float | None = None,
) -> dict:
    """One lifetime; shocks is (T, 3) of raw independent standard normals.
    ``jump_shocks`` (required iff config.market_crashes is set) is (T, 2) of
    (uniform, standard normal) crash draws per month. ``mort_u`` (required
    iff config.longevity is set) is the path's longevity uniform.

    Also produces the yearly series: nominal trajectory (initial value, each
    completed working year post-tax, the retirement date for partial working
    years, each retirement year end — the at-death balance for the failure
    year — padded with zeros after failure), the matching price levels
    (padded with the last level), and the per-retirement-year real
    withdrawal rates (NaN for the failure year onward).
    """
    c = config
    mu1, s1 = arithmetic_to_log_params(c.inv1_returns_mean, c.inv1_returns_volatility)
    mui, si = arithmetic_to_log_params(c.inflation_rate_mean, c.inflation_rate_volatility)
    mup, sp = arithmetic_to_log_params(
        c.inv2_premium_over_inflation_mean, c.inv2_premium_over_inflation_volatility
    )
    # Expense ratios (extension): annual drift drag, same expression as
    # SimParams.host_leaves so the f64 differential stays exact.
    from math import log1p

    mu1 += log1p(-getattr(c, "inv1_expense_ratio_annual", 0.0))
    mup += log1p(-getattr(c, "inv2_expense_ratio_annual", 0.0))
    rho = c.equity_inflation_correlation
    rho_c = sqrt(max(0.0, 1.0 - rho * rho))
    alloc1 = c.allocation_inv1_pct
    # Allocation glide (extension): linear target a0 -> af over the working
    # months, af held through retirement. Same operation ORDER as the
    # kernels (scale = (af-a0)/max(W,1); al = a0 + scale*m) so the f64
    # differential stays exact. af == a0 when the config sets no glide.
    alloc_final = (
        alloc1 if getattr(c, "allocation_inv1_final_pct", None) is None
        else c.allocation_inv1_final_pct
    )
    glide_scale = (alloc_final - alloc1) / max(working_months, 1)
    # Spending guardrails (extension): year-start multiplier updates; the
    # rule-off sentinels (upper=inf, lower=0, adjust=0, floor=cap=1) make
    # every update an exact no-op, mirroring the kernels.
    # Market crashes (extension): compensated Bernoulli-lognormal jump on
    # the gross factors, same expressions as SimParams.host_leaves / the
    # kernels' growth step so the f64 differential stays exact.
    mc = getattr(c, "market_crashes", None)
    if mc is None:
        jp = jmu = jsig = jbeta = jc1 = jc2 = 0.0
    else:
        from math import log

        jp = mc.frequency_per_year / MPY
        jmu = log(1.0 - mc.mean_drop_pct / 100.0)
        jsig = mc.size_volatility
        jbeta = mc.inv2_beta
        jc1 = log((1.0 - jp) + jp * exp(jmu + 0.5 * jsig * jsig))
        jc2 = log((1.0 - jp) + jp * exp(jbeta * jmu + 0.5 * (jbeta * jsig) ** 2))
    # Longevity (extension): remaining lifetime in retirement months from
    # the injected uniform — the same two-branch Gompertz inverse-survival
    # (and operation order) as ops.shocks.gompertz_remaining_months, so the
    # f64 differential stays exact. After month d the owner is gone: the
    # spending need is zero (no ruin possible), income stops with it, and
    # the estate keeps evolving; WR observations exist only for fully-lived
    # years.
    lg = getattr(c, "longevity", None)
    if lg is None:
        d_mort = float("inf")
    else:
        g0 = (lg.mode_age - c.current_age) / lg.dispersion_years
        b12 = MPY * lg.dispersion_years
        g_ret = g0 - working_months / b12
        log_u = np.log(np.float64(mort_u))
        with np.errstate(over="ignore"):
            if g_ret > 0:
                t = g_ret + np.log(np.exp(np.float64(-g_ret)) - log_u)
            else:
                t = np.log1p(-log_u * np.exp(np.float64(g_ret)))
        t = b12 * t
        cap = max(0.0, (lg.max_age - c.current_age) * MPY - working_months)
        d_mort = float(min(t, cap))
    gr = getattr(c, "spending_guardrails", None)
    gr_upper = float("inf") if gr is None else gr.upper_wr_pct / 100.0
    gr_lower = 0.0 if gr is None else gr.lower_wr_pct / 100.0
    gr_adjust = 0.0 if gr is None else gr.adjustment_pct / 100.0
    gr_floor = 1.0 if gr is None else gr.floor_pct / 100.0
    gr_cap = 1.0 if gr is None else gr.cap_pct / 100.0
    spend_mult = 1.0

    st = PathState(
        a1=Asset(
            c.initial_balance * alloc1, c.initial_balance * alloc1,
            AssetTax(c.inv1_use_realized_gains_tax_system,
                     c.inv1_realized_gains_tax_rate,
                     c.inv1_annual_tax_on_gains_rate),
        ),
        a2=Asset(
            c.initial_balance * (1 - alloc1), c.initial_balance * (1 - alloc1),
            AssetTax(c.inv2_use_realized_gains_tax_system,
                     c.inv2_realized_gains_tax_rate,
                     c.inv2_annual_tax_on_gains_rate),
        ),
    )

    def grow(m_idx: int) -> None:
        z_eq, z_ind, z_prem = shocks[m_idx]
        z_inf = rho * z_eq + rho_c * z_ind
        g1 = exp(mu1 / MPY + s1 / sqrt(MPY) * z_eq)
        gi = exp(mui / MPY + si / sqrt(MPY) * z_inf)
        g2 = gi * exp(mup / MPY + sp / sqrt(MPY) * z_prem)
        if mc is not None:
            u, z_j = jump_shocks[m_idx]
            jl = (jmu + jsig * z_j) if u < jp else 0.0
            g1 = g1 * exp(jl - jc1)
            g2 = g2 * exp(jbeta * jl - jc2)
        st.a1.gain_acc += st.a1.balance * (g1 - 1.0)
        st.a2.gain_acc += st.a2.balance * (g2 - 1.0)
        st.a1.balance *= g1
        st.a2.balance *= g2
        st.price *= gi

    trajectory = [c.initial_balance]
    price_levels = [1.0]
    wr_rates: list = []

    # ---------------- accumulation --------------------------------------
    for m in range(1, working_months + 1):
        grow(m - 1)
        contrib = c.monthly_contribution * (
            (1.0 + c.contribution_growth_rate_annual) ** ((m - 1) // MPY)
        )
        al = alloc1 + glide_scale * m
        for asset, share in ((st.a1, al), (st.a2, 1 - al)):
            asset.balance += contrib * share
            asset.basis += contrib * share
        _rebalance(st, al)
        if m % MPY == 0:
            if _annual_taxes(st, al):
                st.preret_failed = True
            st.a1.gain_acc = st.a2.gain_acc = 0.0
            trajectory.append(st.a1.balance + st.a2.balance)
            price_levels.append(st.price)

    start_balance = st.a1.balance + st.a2.balance
    price_at_ret = st.price
    if working_months % MPY != 0:
        trajectory.append(start_balance)
        price_levels.append(st.price)
    if st.preret_failed:
        st.alive = False
        st.years_to_ruin = 0.0

    # Stream payment windows (months relative to retirement start).
    windows = []
    for stream in c.other_income_streams:
        offset = (stream.start_at_age - c.current_age) * MPY - working_months
        start = max(0, ceil(offset - EPS))
        end = (
            float("inf") if stream.duration_years is None
            else start + stream.duration_years * MPY
        )
        windows.append((stream, start, end, [None]))  # [None] = frozen nominal

    first_year_gross = 0.0
    first_year_real = 0.0

    # ---------------- retirement ----------------------------------------
    def record_year(failed: bool, lived: bool = True) -> None:
        trajectory.append(max(0.0, st.a1.balance + st.a2.balance))
        price_levels.append(st.price)
        wr_rates.append(
            nan if (failed or not lived) else (
                year_real / start_balance * 100.0
                if start_balance > EPS else 0.0
            )
        )

    year_gross = year_real = 0.0
    for ret_idx in range(c.retirement_years * MPY):
        if not st.alive:
            break
        year = ret_idx // MPY
        if ret_idx % MPY == 0:
            year_gross = year_real = 0.0

        price0 = st.price
        # Guardrail check at year starts after the first (kernel order:
        # planned WR vs the balance entering the month, before income).
        if ret_idx % MPY == 0 and ret_idx > 0:
            planned = 12.0 * c.monthly_expenses * spend_mult * price0
            wr_now = planned / max(st.a1.balance + st.a2.balance, EPS)
            s_new = spend_mult * (1.0 - gr_adjust) if wr_now > gr_upper \
                else spend_mult
            if wr_now < gr_lower:
                s_new = spend_mult * (1.0 + gr_adjust)
            spend_mult = min(max(s_new, gr_floor), gr_cap)
        income = 0.0
        for stream, start, end, frozen in windows:
            if not (start <= ret_idx < end):
                continue
            if stream.inflation_indexed:
                nominal = stream.monthly_amount_today * price0
            else:
                if frozen[0] is None:
                    frozen[0] = stream.monthly_amount_today * price0
                nominal = frozen[0]
            income += nominal * (1.0 - stream.tax_rate)
        need = max(0.0, c.monthly_expenses * spend_mult * price0 - income)
        living = ret_idx < d_mort
        if not living:
            need = 0.0

        def die():
            st.alive = False
            st.years_to_ruin = (ret_idx + 1) / MPY

        if st.a1.balance + st.a2.balance <= EPS and need > EPS:
            die()
            record_year(failed=True)
            break
        grow(working_months + ret_idx)
        if st.a1.balance + st.a2.balance <= EPS and need > EPS:
            st.a1.balance = max(0.0, st.a1.balance)
            st.a2.balance = max(0.0, st.a2.balance)
            die()
            record_year(failed=True)
            break

        caps = [st.a1.net_liquidation(), st.a2.net_liquidation()]
        capacity = sum(caps)
        target = max(0.0, min(need, capacity))
        failed = need > EPS and target < need - EPS
        share1 = caps[0] / capacity if capacity > EPS else alloc1
        g1, n1 = st.a1.sell_for_net(target * share1)
        g2, n2 = st.a2.sell_for_net(target * (1.0 - share1))
        year_gross += g1 + g2
        year_real += (g1 + g2) * price_at_ret / max(price0, EPS)
        if need > EPS and n1 + n2 < need - EPS:
            failed = True
        _rebalance(st, alloc_final)

        absolute_month = working_months + ret_idx + 1
        if not failed and absolute_month % MPY == 0:
            if _annual_taxes(st, alloc_final):
                failed = True
            st.a1.gain_acc = st.a2.gain_acc = 0.0
        if year == 0:
            first_year_gross, first_year_real = year_gross, year_real
        if failed:
            die()
            record_year(failed=True)
            break
        if (ret_idx + 1) % MPY == 0:
            record_year(failed=False, lived=living)

    # Trailing partial tax period for surviving paths.
    total_months = working_months + c.retirement_years * MPY
    if st.alive and total_months % MPY != 0:
        if _annual_taxes(st, alloc_final):
            st.alive = False
            st.years_to_ruin = float(c.retirement_years)
        if trajectory:
            trajectory[-1] = st.a1.balance + st.a2.balance

    # Pad: failed paths fill remaining years with zero; price carries last.
    expected_len = 1 + (working_months + MPY - 1) // MPY + c.retirement_years
    while len(trajectory) < expected_len:
        trajectory.append(0.0)
        price_levels.append(price_levels[-1] if price_levels else 1.0)
    while len(wr_rates) < c.retirement_years:
        wr_rates.append(nan)

    return {
        "success": st.alive,
        "final_balance": max(0.0, st.a1.balance + st.a2.balance),
        "start_balance": start_balance,
        "years_to_ruin": st.years_to_ruin,
        "first_year_gross": first_year_gross,
        "first_year_real_gross": first_year_real,
        "inflation_at_retirement": price_at_ret,
        "trajectory": trajectory,
        "price_levels": price_levels,
        "withdrawal_rates": wr_rates,
    }
