"""Closed-form unit tests of the branchless tax/portfolio kernels."""

import jax.numpy as jnp
import pytest

from monte_carlo_retirement_tpu.ops.tax import (
    apply_annual_gain_taxes,
    net_liquidation_value,
    rebalance,
    withdraw_net_target,
)


def _s(x):
    return jnp.asarray(x, dtype=jnp.float64)


def test_withdrawal_all_gain_asset_underfunds_net_target():
    # $100 balance, all gain, 20% tax: liquidating everything nets $80, so a
    # $90 net target is underfunded despite gross value exceeding it.
    bal, basis, gross, net = withdraw_net_target(
        _s(100.0), _s(0.0), _s(90.0), jnp.asarray(True), _s(0.20)
    )
    assert float(bal) == pytest.approx(0.0)
    assert float(basis) == pytest.approx(0.0)
    assert float(gross) == pytest.approx(100.0)
    assert float(net) == pytest.approx(80.0)


def test_withdrawal_at_loss_removes_proportional_basis():
    # At a loss, selling half the shares removes half the $100 basis ($50),
    # not merely the $40 of proceeds.
    bal, basis, gross, net = withdraw_net_target(
        _s(80.0), _s(100.0), _s(40.0), jnp.asarray(True), _s(0.20)
    )
    assert float(bal) == pytest.approx(40.0)
    assert float(basis) == pytest.approx(50.0)
    assert float(gross) == pytest.approx(40.0)
    assert float(net) == pytest.approx(40.0)


def test_withdrawal_noop_cases():
    bal, basis, gross, net = withdraw_net_target(
        _s(0.0), _s(0.0), _s(100.0), jnp.asarray(True), _s(0.2)
    )
    assert float(gross) == 0.0 and float(net) == 0.0
    bal, basis, gross, net = withdraw_net_target(
        _s(50.0), _s(40.0), _s(0.0), jnp.asarray(True), _s(0.2)
    )
    assert float(bal) == 50.0 and float(basis) == 40.0 and float(gross) == 0.0


def test_withdrawal_batched():
    bal, basis, gross, net = withdraw_net_target(
        _s([100.0, 80.0]),
        _s([0.0, 100.0]),
        _s([90.0, 40.0]),
        jnp.asarray([True, True]),
        _s([0.20, 0.20]),
    )
    assert float(net[0]) == pytest.approx(80.0)
    assert float(basis[1]) == pytest.approx(50.0)


def test_net_liquidation_value():
    assert float(
        net_liquidation_value(_s(100.0), _s(40.0), jnp.asarray(True), _s(0.25))
    ) == pytest.approx(85.0)
    assert float(
        net_liquidation_value(_s(100.0), _s(40.0), jnp.asarray(False), _s(0.25))
    ) == pytest.approx(100.0)
    assert float(
        net_liquidation_value(_s(0.0), _s(40.0), jnp.asarray(True), _s(0.25))
    ) == 0.0


def test_rebalance_is_tax_aware_and_preserves_asset_cost_basis():
    # 70/30 with target 60/40: sell inv1, pay 10% on realized gains, and the
    # *post-tax* weights must be exactly 60/40.
    b1, c1, b2, c2 = rebalance(
        _s(70.0), _s(50.0), _s(30.0), _s(30.0),
        _s(0.60),
        jnp.asarray(True), _s(0.10), jnp.asarray(True), _s(0.10),
    )
    total = float(b1) + float(b2)
    assert float(b1) / total == pytest.approx(0.60, abs=1e-12)
    assert float(b2) / total == pytest.approx(0.40, abs=1e-12)
    assert total < 100.0  # tax was actually paid

    gross_sale = 70.0 - float(b1)
    basis_removed = 50.0 * (gross_sale / 70.0)
    tax_paid = (gross_sale - basis_removed) * 0.10
    assert float(c1) == pytest.approx(50.0 - basis_removed)
    assert float(c2) == pytest.approx(30.0 + gross_sale - tax_paid)


def test_rebalance_other_direction_and_noop():
    # Underweight inv1: sell inv2 (tax-free here), post weights exact.
    b1, c1, b2, c2 = rebalance(
        _s(20.0), _s(20.0), _s(80.0), _s(80.0),
        _s(0.50),
        jnp.asarray(False), _s(0.0), jnp.asarray(False), _s(0.0),
    )
    assert float(b1) == pytest.approx(50.0)
    assert float(b2) == pytest.approx(50.0)
    assert float(c1) == pytest.approx(50.0)
    # Empty portfolio: untouched
    b1, c1, b2, c2 = rebalance(
        _s(0.0), _s(0.0), _s(0.0), _s(0.0),
        _s(0.5), jnp.asarray(True), _s(0.1), jnp.asarray(True), _s(0.1),
    )
    assert float(b1) == 0.0 and float(b2) == 0.0


def test_annual_tax_only_on_positive_market_gains():
    # Annual-tax asset with $12 accrued market gain at 50%: pays $6 from the
    # portfolio, then rebalances (all-in-one-asset keeps it unchanged).
    b1, c1, b2, c2, failed = apply_annual_gain_taxes(
        _s(112.0), _s(100.0), _s(0.0), _s(0.0),
        _s(12.0), _s(0.0),
        _s(1.0),
        jnp.asarray(False), _s(0.0), _s(0.50),
        jnp.asarray(False), _s(0.0), _s(0.0),
    )
    assert float(b1) == pytest.approx(106.0)
    assert not bool(failed)
    # Negative gains owe nothing
    b1, c1, b2, c2, failed = apply_annual_gain_taxes(
        _s(90.0), _s(100.0), _s(0.0), _s(0.0),
        _s(-10.0), _s(0.0),
        _s(1.0),
        jnp.asarray(False), _s(0.0), _s(0.50),
        jnp.asarray(False), _s(0.0), _s(0.0),
    )
    assert float(b1) == pytest.approx(90.0)
    assert not bool(failed)


def test_annual_tax_fails_when_capacity_below_bill():
    # Bill of $50 against $10 of liquidation capacity -> tax_failed.
    b1, c1, b2, c2, failed = apply_annual_gain_taxes(
        _s(10.0), _s(10.0), _s(0.0), _s(0.0),
        _s(100.0), _s(0.0),
        _s(1.0),
        jnp.asarray(False), _s(0.0), _s(0.50),
        jnp.asarray(False), _s(0.0), _s(0.0),
    )
    assert bool(failed)
    assert float(b1) == pytest.approx(0.0)


def test_realized_tax_asset_owes_no_annual_tax():
    b1, c1, b2, c2, failed = apply_annual_gain_taxes(
        _s(112.0), _s(100.0), _s(0.0), _s(0.0),
        _s(12.0), _s(0.0),
        _s(1.0),
        jnp.asarray(True), _s(0.10), _s(0.50),
        jnp.asarray(False), _s(0.0), _s(0.0),
    )
    assert float(b1) == pytest.approx(112.0)
    assert not bool(failed)
