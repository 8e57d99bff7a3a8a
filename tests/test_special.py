"""Bessel K_nu against scipy.special.kv (the reference's source of truth,
_kernels.pyx:6)."""

import jax
import jax.numpy as jnp
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


def test_kv_nu_gradient_matches_fd_half_integer():
    """Regression (r4): at half-integer nu the CF2 coefficient
    a1 = 0.25 - mu^2 vanishes, every value-increment is identically zero
    and a value-only convergence freeze truncated the autodiff chain —
    d K/d nu came out 5-40% wrong over z in [2, 6] while the VALUE was
    exact. The freeze now also requires the h continued fraction to
    converge; this pins the gradient at the pathological orders."""
    import scipy.special as sp

    for nu in [0.5, 1.5, 3.5, 7.5]:
        for z in [2.1, 3.0, 5.0]:
            ad = float(jax.grad(
                lambda n_: special.kv(n_, jnp.asarray(z)))(jnp.asarray(nu)))
            h = 1e-6 * max(nu, 1.0)
            fd = (sp.kv(nu + h, z) - sp.kv(nu - h, z)) / (2 * h)
            assert ad == pytest.approx(fd, rel=1e-5), (nu, z, ad, fd)


def test_log_kv_extreme_range_f32():
    """log_kv must stay finite and accurate where K_nu itself overflows
    or underflows float32 (large nu / small z and large z)."""
    import scipy.special as sp

    cases = [(25.0, 0.01), (25.0, 0.5), (10.0, 1e-3), (3.5, 120.0)]
    for nu, z in cases:
        got = float(special.log_kv(jnp.asarray(nu, jnp.float32),
                                   jnp.asarray(z, jnp.float32)))
        want = float(np.log(sp.kv(nu, z))) if np.isfinite(
            sp.kv(nu, z)) and sp.kv(nu, z) > 0 else float(
            sp.gammaln(nu) - np.log(2.0) + nu * np.log(2.0 / z))
        assert np.isfinite(got)
        assert got == pytest.approx(want, rel=2e-5), (nu, z, got, want)
