"""Bessel K_nu against scipy.special.kv (the reference's source of truth,
_kernels.pyx:6)."""

import numpy as np
import pytest
import scipy.special

from gppe_tpu.ops import special


@pytest.mark.parametrize("nu", [0.0, 0.1, 0.25, 0.5, 0.9, 1.0, 1.3, 2.5,
                                3.2, 7.8, 25.0, 60.5, 99.0])
def test_kv_matches_scipy(nu):
    x = np.logspace(-5, 2.5, 200)
    got = np.asarray(special.kv(nu, x))
    want = scipy.special.kv(nu, x)
    # Ignore entries where scipy overflowed/underflowed out of float range
    mask = np.isfinite(want) & (want > 1e-280) & (want < 1e280)
    assert mask.sum() > 40  # large nu overflows at small x; tail remains
    np.testing.assert_allclose(got[mask], want[mask], rtol=5e-10)


def test_kv_vectorized_over_nu():
    nus = np.array([0.3, 1.7, 4.2])
    x = np.array([0.5, 1.0, 10.0])
    got = np.asarray(special.kv(nus, x))
    want = scipy.special.kv(nus, x)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_kv_nonpositive_x_is_inf():
    assert np.isinf(np.asarray(special.kv(0.5, 0.0)))


def test_gamma():
    x = np.array([0.5, 1.0, 2.5, 7.3])
    np.testing.assert_allclose(np.asarray(special.gamma(x)),
                               scipy.special.gamma(x), rtol=1e-12)
