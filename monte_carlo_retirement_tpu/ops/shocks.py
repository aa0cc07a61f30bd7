"""Correlated lognormal shock generation (counter-based, CRN-stable).

Design: one threefry key per *absolute month* — ``fold_in(stream_key, m)`` —
and a single bulk ``normal(key_m, (n_paths, 3))`` draw per month. Path ``p``
always reads row ``p``, so the shock for (stream, month, path) is a pure
function of those three coordinates. Consequences:

  * Common random numbers across working-month candidates for free (the
    reference achieved this with a per-(stream, n) seed cache,
    backend/simulation.py:152-199).
  * Stable under different ``n_paths``: threefry counters are row-major, so
    row p's three draws are identical for any batch size >= p+1.
  * Search vs final streams are independent roots (fold_in 0 / 1 of the main
    seed key), mirroring SeedSequence.spawn(2) (backend/simulation.py:148-151).

Statistical (not bitwise) parity with the reference's NumPy Philox draws is
the contract; distributional tests live in tests/test_statistical.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import MONTHS_PER_YEAR

SQRT_MONTHS = MONTHS_PER_YEAR ** 0.5


def stream_keys(main_seed: int) -> Tuple[jax.Array, jax.Array]:
    """Derive the two independent root keys: (search, final).

    Seeds within the PRNGKey range pass through untouched (every pinned
    expectation in tests and docs depends on that). Seeds beyond it — the
    reference's SeedSequence accepts arbitrarily large ints — fold their
    FULL entropy through numpy's SeedSequence rather than truncating, so
    distinct huge seeds (e.g. s and s + 2**63) get distinct streams."""
    s = int(main_seed)
    if not 0 <= s < (1 << 63):
        import numpy as _np

        s = int(_np.random.SeedSequence(s).generate_state(1, _np.uint64)[0] >> 1)
    root = jax.random.PRNGKey(s)
    return jax.random.fold_in(root, 0), jax.random.fold_in(root, 1)


def monthly_shocks(
    stream_key: jax.Array,
    month: jnp.ndarray,
    n_paths: int,
    rho: jnp.ndarray,
    dtype,
    antithetic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Standard-normal shocks (z_equity, z_inflation, z_premium) for one month.

    The inflation shock is rho-correlated with the equity shock via the exact
    two-factor construction z_inf = rho*z_eq + sqrt(1-rho^2)*z_ind, which is
    exact at the singular endpoints rho = +/-1.

    ``antithetic`` pairs adjacent paths: path 2i+1 uses the NEGATED draws of
    path 2i (all three factors, so the correlation structure is preserved —
    negation commutes with the linear rho-mixing below). Even-indexed paths
    read draw row i = p//2, so the even half of an antithetic batch is
    bit-identical to an iid batch of half the size (pinned in
    tests/test_antithetic.py). A trailing odd path stays an unpaired +z draw
    — still exactly N(0,1), so every estimator remains unbiased.
    """
    key_m = jax.random.fold_in(stream_key, month)
    if antithetic:
        n_half = (n_paths + 1) // 2
        z = jax.random.normal(key_m, (n_half, 3), dtype=dtype)
        sign = jnp.where(jnp.arange(n_paths) % 2 == 0, 1.0, -1.0).astype(dtype)
        z = jnp.repeat(z, 2, axis=0)[:n_paths] * sign[:, None]
    else:
        z = jax.random.normal(key_m, (n_paths, 3), dtype=dtype)
    z_eq = z[:, 0]
    z_inf = rho * z_eq + jnp.sqrt(jnp.maximum(0.0, 1.0 - rho * rho)) * z[:, 1]
    z_prem = z[:, 2]
    return z_eq, z_inf, z_prem


# The jump stream folds months at this offset so the base shock stream above
# (fold_in(stream_key, month), months <= ~1440) is untouched whether or not
# crashes are configured — the off-path stays bit-identical by construction.
JUMP_FOLD_OFFSET = 1 << 20


def monthly_jump_draws(
    stream_key: jax.Array,
    month: jnp.ndarray,
    n_paths: int,
    dtype,
    antithetic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crash draws for one month: (u, z) with u ~ U[0,1), z ~ N(0,1).

    Drawn from ``fold_in(stream_key, JUMP_FOLD_OFFSET + month)`` — a counter
    space disjoint from the base shocks, so configs without crashes consume
    exactly the same base stream (CRN across candidates holds for the same
    reason it does for the base draws: the key depends only on
    (stream, month) and path p reads row p).

    ``antithetic`` pairs adjacent paths like ``monthly_shocks``: path 2i+1
    mirrors path 2i's draws (z negated, u -> 1-u, so crash occurrences
    anti-correlate while staying Bernoulli(p) marginally). Even paths read
    draw row p//2, preserving the even-half == half-size-iid-run identity.
    """
    key_m = jax.random.fold_in(stream_key, JUMP_FOLD_OFFSET + month)
    ku, kz = jax.random.split(key_m)
    if antithetic:
        n_half = (n_paths + 1) // 2
        u = jax.random.uniform(ku, (n_half,), dtype=dtype)
        z = jax.random.normal(kz, (n_half,), dtype=dtype)
        odd = jnp.arange(n_paths) % 2 == 1
        u = jnp.repeat(u, 2)[:n_paths]
        z = jnp.repeat(z, 2)[:n_paths]
        u = jnp.where(odd, 1.0 - u, u)
        z = jnp.where(odd, -z, z)
    else:
        u = jax.random.uniform(ku, (n_paths,), dtype=dtype)
        z = jax.random.normal(kz, (n_paths,), dtype=dtype)
    return u, z


# The longevity stream folds at its own disjoint offset (the jump stream
# uses JUMP_FOLD_OFFSET + month <= 2^20 + ~1440), so base and crash draws are
# untouched whether or not a lifespan rule is configured.
MORT_FOLD_OFFSET = 1 << 21


def mortality_uniform(
    stream_key: jax.Array,
    n_paths: int,
    dtype,
    antithetic: bool = False,
) -> jnp.ndarray:
    """ONE uniform per path, u ~ U[0,1) — the longevity percentile.

    Drawn from ``fold_in(stream_key, MORT_FOLD_OFFSET)``: a counter space
    disjoint from both the base shocks and the crash stream, so configs
    without a lifespan rule consume exactly the same draws. Path p reads
    row p, so the percentile is CRN-stable across working-month candidates
    — a candidate that retires later re-conditions the SAME percentile on
    the later age, keeping search curves smooth.

    ``antithetic`` pairs adjacent paths with u -> 1-u: small u means a long
    life (u is the survival probability being inverted), so paired paths
    anti-correlate lifespans while staying uniform marginally. Even paths
    read draw row p//2, preserving the even-half == half-size-iid identity.
    """
    key = jax.random.fold_in(stream_key, MORT_FOLD_OFFSET)
    if antithetic:
        n_half = (n_paths + 1) // 2
        u = jax.random.uniform(key, (n_half,), dtype=dtype)
        odd = jnp.arange(n_paths) % 2 == 1
        u = jnp.repeat(u, 2)[:n_paths]
        u = jnp.where(odd, 1.0 - u, u)
    else:
        u = jax.random.uniform(key, (n_paths,), dtype=dtype)
    return u


def gompertz_remaining_months(
    u: jnp.ndarray,
    g0,
    b12,
    cap,
    working_months,
    dtype,
):
    """Remaining lifetime in retirement months from the longevity uniform.

    Gompertz inverse-survival conditioned on being alive at the retirement
    date: with g_ret = (mode_age - retirement_age) / b = g0 - W / b12,
        t = b12 * ln(1 - ln(u) * exp(g_ret)),
    computed in the overflow-stable two-branch form (factor e^{g_ret} out of
    the log when g_ret > 0, where exp(g_ret) could overflow for young ages).
    u = 0 maps to t = +inf (longest life) and is absorbed by the max-age cap.
    Sentinel rows (b12 == 0) return +inf: no lifespan rule, never expires.
    """
    w_f = jnp.asarray(working_months).astype(dtype)
    g_ret = g0 - w_f / b12  # NaN/inf on sentinel rows; discarded below
    log_u = jnp.log(u)
    t_low = jnp.log1p(-log_u * jnp.exp(g_ret))
    t_high = g_ret + jnp.log(jnp.exp(-g_ret) - log_u)
    t = b12 * jnp.where(g_ret > 0, t_high, t_low)
    d = jnp.minimum(t, jnp.maximum(0.0, cap - w_f))
    return jnp.where(b12 > 0, d, jnp.asarray(jnp.inf, dtype=dtype))


def monthly_gross_factors(
    z_eq: jnp.ndarray,
    z_inf: jnp.ndarray,
    z_prem: jnp.ndarray,
    mu1: jnp.ndarray,
    sigma1: jnp.ndarray,
    mu_inf: jnp.ndarray,
    sigma_inf: jnp.ndarray,
    mu_prem: jnp.ndarray,
    sigma_prem: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Monthly gross return factors (asset1, inflation, asset2).

    Monthly factor from annual lognormal params: exp(mu/12 + sigma/sqrt(12)*z).
    Asset 2 compounds inflation times its premium factor.
    """
    g1 = jnp.exp(mu1 / MONTHS_PER_YEAR + sigma1 / SQRT_MONTHS * z_eq)
    gi = jnp.exp(mu_inf / MONTHS_PER_YEAR + sigma_inf / SQRT_MONTHS * z_inf)
    gp = jnp.exp(mu_prem / MONTHS_PER_YEAR + sigma_prem / SQRT_MONTHS * z_prem)
    return g1, gi, gi * gp
