from .tax import (
    withdraw_net_target,
    net_liquidation_value,
    rebalance,
    apply_annual_gain_taxes,
)
from .shocks import monthly_shocks, monthly_gross_factors

__all__ = [
    "withdraw_net_target",
    "net_liquidation_value",
    "rebalance",
    "apply_annual_gain_taxes",
    "monthly_shocks",
    "monthly_gross_factors",
]
