"""The sort-free quantile engine must agree exactly with numpy.

These pin ops/quantiles.py — the machinery that replaced every percentile
sort in the serving path — against np.percentile / np.nanpercentile on
adversarial data: duplicates, negatives, signed zeros, infinities, all-NaN
columns, single elements, and both float widths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monte_carlo_retirement_tpu.ops.quantiles import (
    exact_quantiles,
    exact_quantiles_parts,
    masked_median,
    order_statistics,
    quantiles_percol,
    upper_median,
)

QS = np.asarray([0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99])


def _check_against_numpy(x_np, qs=QS, dtype=jnp.float64):
    got = np.asarray(exact_quantiles(jnp.asarray(x_np, dtype=dtype), qs))
    want = np.percentile(np.asarray(x_np, dtype=np.dtype(dtype)), qs * 100.0,
                         axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=0.0)


def test_matches_numpy_random_f64():
    rng = np.random.default_rng(0)
    _check_against_numpy(rng.normal(size=(997, 13)) * 1e6)


def test_matches_numpy_random_f32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(512, 7)).astype(np.float32) * 1e5
    got = np.asarray(exact_quantiles(jnp.asarray(x, dtype=jnp.float32), QS))
    want = np.percentile(x, QS * 100.0, axis=0).astype(np.float32)
    # Order statistics are exact; only the final interpolation arithmetic
    # differs (f32 on device vs f64 in numpy).
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_duplicates_and_constants():
    x = np.concatenate(
        [np.zeros((40, 3)), np.ones((40, 3)), np.full((17, 3), -5.0)]
    )
    _check_against_numpy(x)
    _check_against_numpy(np.full((33, 2), 7.25))


def test_negatives_and_signed_zero():
    x = np.asarray([[-1.5, -0.0], [0.0, -0.0], [2.5, -0.0], [-3.25, 0.0]])
    _check_against_numpy(x, qs=np.asarray([0.0, 0.5, 1.0]))


def test_single_element_and_extremes():
    _check_against_numpy(np.asarray([[42.0]]), qs=np.asarray([0.0, 0.37, 1.0]))
    x = np.asarray([[np.inf], [-np.inf], [1.0], [2.0]])
    got = np.asarray(
        exact_quantiles(jnp.asarray(x), np.asarray([0.0, 0.5, 1.0]))
    ).ravel()
    # Interior quantiles match numpy; at the extremes numpy's lerp computes
    # inf - inf = NaN while the zero-weight short-circuit here returns the
    # exact order statistic (a deliberate, strictly-more-defined answer).
    assert got[0] == -np.inf and got[1] == 1.5 and got[2] == np.inf


def test_nan_aware_matches_nanpercentile():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(301, 9)) * 1e4
    x[rng.random(size=x.shape) < 0.3] = np.nan
    x[:, 4] = np.nan  # one all-NaN column
    valid = ~np.isnan(x)
    got = np.asarray(
        exact_quantiles(jnp.asarray(x), QS, valid=jnp.asarray(valid))
    )
    with np.errstate(invalid="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = np.nanpercentile(x, QS * 100.0, axis=0)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    mask = ~np.isnan(want)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-12)


def test_order_statistics_exact_ranks():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(100, 4))
    ranks = np.asarray([[0, 1, 49, 99]] * 4, dtype=np.int32)
    got = np.asarray(order_statistics(jnp.asarray(x), jnp.asarray(ranks)))
    want = np.sort(x, axis=0)[[0, 1, 49, 99], :].T
    np.testing.assert_array_equal(got, want)


def test_out_of_range_rank_is_nan():
    x = jnp.asarray([[1.0], [2.0]])
    valid = jnp.asarray([[True], [False]])
    got = np.asarray(
        order_statistics(x, jnp.asarray([[0, 1]], dtype=jnp.int32), valid=valid)
    )
    assert got[0, 0] == 1.0 and np.isnan(got[0, 1])


def test_masked_median_and_upper_median():
    x = np.asarray([5.0, 1.0, 9.0, 3.0, 7.0, 100.0])
    valid = np.asarray([True, True, True, True, True, False])
    assert float(
        masked_median(jnp.asarray(x), valid=jnp.asarray(valid))
    ) == np.median(x[:5])
    # upper median: sorted[n//2] with n=5 -> index 2 -> 5.0
    assert float(upper_median(jnp.asarray(x), jnp.asarray(valid))) == 5.0
    # even count: [5,1,3,7] -> sorted [1,3,5,7], n=4 -> index 2 -> 5.0
    valid2 = np.asarray([True, True, False, True, True, False])
    assert float(upper_median(jnp.asarray(x), jnp.asarray(valid2))) == 5.0


def test_parts_equal_per_group_calls():
    """The joint-loop form must return exactly what per-group calls do."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(257, 6)) * 1e5
    b = rng.normal(size=(257, 3)) * 1e-3
    b[rng.random(size=b.shape) < 0.25] = np.nan
    valid_b = ~np.isnan(b)
    got_a, got_b = exact_quantiles_parts(
        [jnp.asarray(a), jnp.asarray(b)], QS,
        valids=[None, jnp.asarray(valid_b)],
    )
    np.testing.assert_array_equal(
        np.asarray(got_a), np.asarray(exact_quantiles(jnp.asarray(a), QS))
    )
    np.testing.assert_array_equal(
        np.asarray(got_b),
        np.asarray(
            exact_quantiles(jnp.asarray(b), QS, valid=jnp.asarray(valid_b))
        ),
    )
    # And numpy agrees on the unmasked group.
    np.testing.assert_allclose(
        np.asarray(got_a), np.percentile(a, QS * 100.0, axis=0), rtol=1e-12
    )


def test_quantiles_percol_heterogeneous_rows():
    """Per-column fraction rows: medians next to a percentile ladder,
    with repeat-padding, must match per-column nanpercentile."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(401, 3)) * 1e4
    valid = np.ones_like(x, dtype=bool)
    valid[::3, 1] = False  # a masked column
    qmat = np.asarray([
        [0.5, 0.5, 0.5, 0.5],      # median, repeat-padded
        [0.25, 0.75, 0.75, 0.75],  # quartiles, repeat-padded
        [0.01, 0.5, 0.95, 0.99],   # a ladder
    ])
    got = np.asarray(
        quantiles_percol(jnp.asarray(x), jnp.asarray(qmat),
                         valid=jnp.asarray(valid))
    )
    for c in range(3):
        col = x[valid[:, c], c]
        want = np.percentile(col, qmat[c] * 100.0)
        np.testing.assert_allclose(got[c], want, rtol=1e-12)


def test_quantiles_percol_shape_validation():
    with pytest.raises(ValueError):
        quantiles_percol(jnp.zeros((4, 3)), jnp.zeros((2, 2)))


def test_shape_validation():
    with pytest.raises(ValueError):
        order_statistics(
            jnp.zeros((4, 3)), jnp.zeros((2, 2), dtype=jnp.int32)
        )


def test_works_under_jit_and_grad_free_path():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(64, 5))
    fn = jax.jit(lambda a: exact_quantiles(a, jnp.asarray([0.25, 0.5, 0.75])))
    got = np.asarray(fn(jnp.asarray(x)))
    want = np.percentile(x, [25, 50, 75], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_radix_bits_per_pass_bit_identical():
    """The radix-2^k floor search (k result bits per compare-count pass)
    returns BIT-identical keys for every k — the perf knob
    (MCRT_QUANTILE_RADIX_BITS) can never change a value. Exercises sign
    mixes, exact zeros, duplicates, masked columns, and both dtypes."""
    from monte_carlo_retirement_tpu.ops.quantiles import (
        _search_floor_values_parts,
    )

    rng = np.random.default_rng(7)
    for dtype in (np.float32, np.float64):
        x = (rng.standard_normal((3001, 9)) * 10.0 ** rng.integers(
            -3, 4, size=9
        )).astype(dtype)
        x[rng.random(x.shape) < 0.05] = 0.0       # exact-zero ties
        x[rng.random(x.shape) < 0.05] = dtype(2)  # duplicates
        x[:, 4] = -np.abs(x[:, 4])                # all-negative column
        valid = rng.random(x.shape) > 0.15
        xf = jnp.where(jnp.asarray(valid), jnp.asarray(x),
                       jnp.asarray(np.inf, dtype))
        nv = np.maximum(valid.sum(axis=0), 1)
        need = jnp.asarray(
            np.stack([np.ones(9), nv // 2, nv], axis=1), jnp.int32
        )
        outs = {
            k: np.asarray(
                _search_floor_values_parts([xf], need, bits_per_pass=k)
            )
            for k in (1, 2, 4, 8)
        }
        for k in (2, 4, 8):
            np.testing.assert_array_equal(outs[k], outs[1])
