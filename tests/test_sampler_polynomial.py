"""CI pin of the Pallas normal-sampler polynomial.

The TPU kernel converts 23 hardware-PRNG bits to a uniform x in
(-1, 1) and maps it through z = x * P(sqrt(-log1p(-x^2))) — a
single-branch degree-9 fit of sqrt(2)*erfinv whose full 2^23-input
enumeration (max rel err 1.43e-4) lives in scripts/perf_ablation.py and
whose on-device draw statistics are recorded in docs/PARITY.md. This test
keeps the shipped coefficients honest in CI: float32 evaluation exactly as
the kernel computes it, compared against scipy's erfinv on a dense strided
subgrid plus the extreme representable inputs.
"""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy", reason="scipy provides the erfinv truth")
import scipy.special  # noqa: E402

from monte_carlo_retirement_tpu.engine.pallas_kernel import (
    _INV_2_22,
    _X_OFFSET,
    _ZPOLY,
)

SQRT2 = np.sqrt(2.0)


def _sampler_f32(r: np.ndarray) -> tuple:
    """The kernel's exact mapping (pallas_kernel._normal) in numpy float32:
    23-bit integer r -> uniform x -> polynomial quantile z.
    Returns (z, x) — callers need the uniform too for the truth value."""
    f32 = np.float32
    x = r.astype(f32) * f32(_INV_2_22) + f32(_X_OFFSET)
    s = np.sqrt(-np.log1p(-(x * x), dtype=f32), dtype=f32)
    acc = np.full(r.shape, _ZPOLY[0], f32)
    for c in _ZPOLY[1:]:
        acc = acc * s + f32(c)
    return (acc * x).astype(f32), x


def _grid() -> np.ndarray:
    # Prime stride over the 23-bit domain (~270k points) + both extreme tails.
    r = np.arange(0, 1 << 23, 31, dtype=np.int64)
    edges = np.array([0, 1, 2, (1 << 23) - 3, (1 << 23) - 2, (1 << 23) - 1])
    return np.unique(np.concatenate([r, edges]))


def test_polynomial_matches_erfinv_to_spec():
    z, x = _sampler_f32(_grid())
    true = SQRT2 * scipy.special.erfinv(x.astype(np.float64))
    rel = np.abs(z.astype(np.float64) - true) / np.maximum(np.abs(true), 1e-12)
    assert float(rel.max()) < 2.0e-4, f"max rel err {rel.max():.3e}"


def test_quantile_is_finite_monotone_and_odd():
    r = _grid()
    z, x = _sampler_f32(r)
    assert np.isfinite(z).all()  # never +-inf even at the extreme inputs
    assert (np.diff(z) > 0).all(), "quantile must be strictly increasing"
    # Tails reach the 23-bit design range (~5.4 sigma) and are symmetric.
    assert 5.2 < -z[0] < 5.5 and 5.2 < z[-1] < 5.5
    # The bit mapping is exactly odd: r' = 2^23-1-r gives x' = -x, so the
    # mirrored draws must be the exact negations.
    z_neg, _ = _sampler_f32((1 << 23) - 1 - r)
    np.testing.assert_array_equal(z_neg, -z)


def test_quantile_moments_are_standard_normal():
    # The strided uniform grid is a quadrature over x ~ U(-1,1); through the
    # quantile map the moments must be standard normal.
    z, _ = _sampler_f32(_grid())
    z = z.astype(np.float64)
    assert abs(z.mean()) < 1e-4
    assert abs(z.var() - 1.0) < 1e-3
    kurt = (z**4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.05
