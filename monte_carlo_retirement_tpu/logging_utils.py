"""Logging + reporting helpers (stdlib logging; loguru-style format).

Covers the reference's utils.py responsibilities: timestamp-derived seeds,
exhaustive input-parameter logging and final-result reporting
(reference: backend/utils.py:9-103).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import logging
import sys
from typing import Optional

import numpy as np

from .config import Config
from .constants import MONTHS_PER_YEAR

LOG_FORMAT = "%(asctime)s | %(levelname)-8s | %(name)s:%(funcName)s:%(lineno)d - %(message)s"
DATE_FORMAT = "%Y-%m-%d %H:%M:%S"

log = logging.getLogger("mcrt")


def configure_logging(
    level: int = logging.INFO, logfile: Optional[str] = None
) -> None:
    """Configure the root 'mcrt' logger with stderr + optional file sinks."""
    logger = logging.getLogger("mcrt")
    logger.setLevel(level)
    logger.handlers.clear()
    stream = logging.StreamHandler(sys.stderr)
    stream.setFormatter(logging.Formatter(LOG_FORMAT, DATE_FORMAT))
    logger.addHandler(stream)
    if logfile:
        fileh = logging.FileHandler(logfile)
        fileh.setFormatter(logging.Formatter(LOG_FORMAT, DATE_FORMAT))
        logger.addHandler(fileh)


def generate_seed_from_timestamp() -> int:
    """Deterministic-given-time seed: SHA-256 of the current UTC ISO timestamp."""
    ts = _dt.datetime.now(_dt.timezone.utc).isoformat()
    return int.from_bytes(hashlib.sha256(ts.encode()).digest()[:8], "big") % (2**32 - 1)


_MONEY_KEYWORDS = ("balance", "contribution", "expenses", "amount")
_PCT_KEYWORDS = ("rate", "mean", "volatility", "pct")
_PCT_EXCLUDED = {
    "initial_balance",
    "monthly_contribution",
    "monthly_expenses",
    "monthly_amount_today",
}


def log_input_parameters(config: Config) -> None:
    """Pretty-print every configuration field with %/$ formatting heuristics."""
    log.info("--- Input Parameters For Scenario: %s ---", config.Nickname)
    for key, value in config.model_dump(by_alias=False).items():
        title = key.replace("_", " ").title()
        if key == "Nickname":
            continue
        if key == "other_income_streams":
            log.info("%s:", title)
            if not config.other_income_streams:
                log.info("  - None")
            for s in config.other_income_streams:
                duration = (
                    f", lasts {s.duration_years} yrs"
                    if s.duration_years is not None
                    else ", lasts indefinitely"
                )
                indexing = (
                    " (Fully Inflation Adj.)"
                    if s.inflation_indexed
                    else " (Nominal Fixed at Stream Start)"
                )
                log.info(
                    "  - %s: $%s/mo (T=0 real value), starts at age %g%s%s, Tax: %.0f%%",
                    s.name,
                    f"{s.monthly_amount_today:,.0f}",
                    s.start_at_age,
                    duration,
                    indexing,
                    s.tax_rate * 100,
                )
        elif key == "target_probability":
            log.info("%s: %.2f%%", title, value)
        elif (
            isinstance(value, float)
            and any(k in key for k in _PCT_KEYWORDS)
            and key not in _PCT_EXCLUDED
        ):
            log.info("%s: %.2f%%", title, value * 100)
        elif isinstance(value, (float, int)) and any(k in key for k in _MONEY_KEYWORDS):
            log.info("%s: $%s", title, f"{value:,.2f}")
        else:
            log.info("%s: %s", title, value)
    log.info(
        "Allocation Inv2 Pct (Calculated): %.2f%%", config.allocation_inv2_pct * 100
    )
    log.info("--- End of Input Parameters ---")


def log_simulation_results(
    config: Config,
    required_w_months: int,
    final_success_prob_pct: float,
    median_start_ret_bal: float,
    median_final_bal_successful: float,
    swr: float,
    final_balances: np.ndarray,
) -> None:
    """Report the headline results plus the final-balance percentile ladder."""
    log.info("--- Final Simulation Results for Scenario: '%s' ---", config.Nickname)
    log.info(
        "Determined Required Working Months: %d (%.1f years)",
        required_w_months,
        required_w_months / MONTHS_PER_YEAR,
    )
    log.info(
        "Probability of Not Running Out of Money (Final Sims): %.2f%% (Target: %.2f%%)",
        final_success_prob_pct,
        config.target_probability,
    )
    log.info(
        "Median Balance at Start of Retirement (All Sims): $%s",
        f"{median_start_ret_bal:,.2f}",
    )
    log.info(
        "Median Final Balance (Successful Sims Only): $%s",
        f"{median_final_bal_successful:,.2f}",
    )
    log.info(
        "Est. First-year Real Withdrawal Rate (median, real gross / start bal): %.2f%%",
        swr,
    )
    log.info("Final Balance Percentiles (All Sims, $):")
    for p in (1, 5, 10, 25, 50, 75, 90, 95, 99):
        value = float(np.percentile(np.asarray(final_balances, dtype=float), p))
        log.info("  %dth: %s", p, f"{max(0.0, value):,.2f}")
