"""Property-based invariants of the tax/portfolio ops (hypothesis, x64 CPU).

The closed-form suite (test_tax_ops) pins specific values; these properties
pin the *algebraic contracts* over the whole input space: money conservation,
basis bounds, exact post-tax weights, the average-cost-basis gain-fraction
invariance that the Pallas kernel's fused algebra relies on, and the
capacity definition shared by withdrawals and the ruin test.
"""

from __future__ import annotations

import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from monte_carlo_retirement_tpu.constants import SMALL_EPSILON as EPS
from monte_carlo_retirement_tpu.ops.tax import (
    apply_annual_gain_taxes,
    net_liquidation_value,
    rebalance,
    sale_tax_profile,
    withdraw_net_target,
)

money = st.floats(0.0, 1e9, allow_nan=False, allow_infinity=False)
pos_money = st.floats(1.0, 1e9, allow_nan=False, allow_infinity=False)
rate = st.floats(0.0, 1.0, allow_nan=False, allow_infinity=False)
frac = st.floats(0.01, 0.99, allow_nan=False, allow_infinity=False)
flag = st.booleans()

SET = settings(max_examples=300, deadline=None)


def _a(x):
    return jnp.asarray([x], dtype=jnp.float64)


@SET
@given(bal=pos_money, basis_mult=st.floats(0.0, 2.0), target=money,
       use=flag, r=rate)
def test_withdraw_invariants(bal, basis_mult, target, use, r):
    basis = bal * basis_mult
    nb, nc, gross, net = withdraw_net_target(
        _a(bal), _a(basis), _a(target), jnp.asarray([use]), _a(r)
    )
    nb, nc, gross, net = (float(v[0]) for v in (nb, nc, gross, net))
    # bounds
    assert 0.0 <= gross <= bal + 1e-6
    assert 0.0 <= net <= gross + 1e-6
    assert nb >= 0.0 and nc >= 0.0
    # conservation: balance drops by exactly the gross sale (unless the
    # emptied-cleanup zeroed a dust residue)
    if nb > EPS:
        assert abs((bal - gross) - nb) <= 1e-6 * max(1.0, bal)
    # never deliver more than asked
    assert net <= target + 1e-6 * max(1.0, target)
    # gain-fraction invariance under a proportional sale (the identity the
    # fused kernels rely on): gf(new) == gf(old) while both sides are alive
    if nb > EPS and bal > EPS and gross > 0:
        gf_old = max(0.0, bal - basis) / bal
        gf_new = max(0.0, nb - nc) / nb
        assert abs(gf_old - gf_new) <= 1e-9 + 1e-6 * gf_old
    # realized tax equals gross * eff exactly under avg-cost basis
    if use and gross > 0:
        eff = max(0.0, bal - basis) / bal * r
        assert abs((gross - net) - gross * eff) <= 1e-6 * max(1.0, gross)


@SET
@given(b1=pos_money, m1=st.floats(0.0, 2.0), b2=pos_money,
       m2=st.floats(0.0, 2.0), alloc1=frac, use1=flag, r1=rate,
       use2=flag, r2=rate)
def test_rebalance_invariants(b1, m1, b2, m2, alloc1, use1, r1, use2, r2):
    c1, c2 = b1 * m1, b2 * m2
    ob1, oc1, ob2, oc2 = rebalance(
        _a(b1), _a(c1), _a(b2), _a(c2), _a(alloc1),
        jnp.asarray([use1]), _a(r1), jnp.asarray([use2]), _a(r2),
    )
    ob1, oc1, ob2, oc2 = (float(v[0]) for v in (ob1, oc1, ob2, oc2))
    total0, total1 = b1 + b2, ob1 + ob2
    # the sale tax can only shrink the portfolio, never grow it
    assert total1 <= total0 + 1e-6 * max(1.0, total0)
    # nonnegative balances and bases; zero balance => zero basis
    assert ob1 >= 0 and ob2 >= 0 and oc1 >= 0 and oc2 >= 0
    if ob1 <= EPS:
        assert oc1 == 0.0
    if ob2 <= EPS:
        assert oc2 == 0.0
    # exact post-tax weights unless the trade was a no-op or the seller was
    # fully liquidated (gross capped at the balance)
    drift0 = b1 - total0 * alloc1
    sold_out = (ob1 == 0.0) or (ob2 == 0.0)
    if total0 > EPS and abs(drift0) > EPS and not sold_out and total1 > EPS:
        assert abs(ob1 - total1 * alloc1) <= 1e-6 * max(1.0, total1)


@SET
@given(bal=money, basis_mult=st.floats(0.0, 2.0), use=flag, r=rate)
def test_capacity_bounds_and_profile_consistency(bal, basis_mult, use, r):
    basis = bal * basis_mult
    nlv = float(net_liquidation_value(
        _a(bal), _a(basis), jnp.asarray([use]), _a(r))[0])
    assert 0.0 <= nlv <= bal + 1e-9
    eff, cap = sale_tax_profile(_a(bal), _a(basis), jnp.asarray([use]), _a(r))
    # capacity from the shared profile equals the standalone definition
    assert abs(float(cap[0]) - nlv) <= 1e-9 * max(1.0, bal)
    assert 0.0 <= float(eff[0]) <= 1.0


@SET
@given(b1=pos_money, m1=st.floats(0.0, 2.0), b2=pos_money,
       m2=st.floats(0.0, 2.0), g1=st.floats(-1e6, 1e6),
       g2=st.floats(-1e6, 1e6), alloc1=frac,
       use1=flag, rr1=rate, ra1=rate, use2=flag, rr2=rate, ra2=rate)
def test_annual_tax_invariants(b1, m1, b2, m2, g1, g2, alloc1,
                               use1, rr1, ra1, use2, rr2, ra2):
    c1, c2 = b1 * m1, b2 * m2
    ob1, oc1, ob2, oc2, failed = apply_annual_gain_taxes(
        _a(b1), _a(c1), _a(b2), _a(c2), _a(g1), _a(g2), _a(alloc1),
        jnp.asarray([use1]), _a(rr1), _a(ra1),
        jnp.asarray([use2]), _a(rr2), _a(ra2),
    )
    ob1, oc1, ob2, oc2 = (float(v[0]) for v in (ob1, oc1, ob2, oc2))
    failed = bool(failed[0])
    total0, total1 = b1 + b2, ob1 + ob2
    assert total1 <= total0 + 1e-6 * max(1.0, total0)
    assert ob1 >= 0 and ob2 >= 0 and oc1 >= 0 and oc2 >= 0
    # a failure requires an actual bill beyond capacity
    due = (0.0 if use1 else max(0.0, g1) * ra1) + (
        0.0 if use2 else max(0.0, g2) * ra2
    )
    if failed:
        assert due > 0.0
