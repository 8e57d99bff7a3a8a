"""Trust-region Newton (role of scipy 'trust-exact' in the reference,
_direct_likelihood.py:378-384)."""

import jax.numpy as jnp
import numpy as np

from gppe_tpu.ops.optimize import trust_region_minimize


def test_quadratic():
    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -2.0])
    fun = lambda x: 0.5 * x @ (A @ x) - b @ x
    res = trust_region_minimize(fun, jnp.zeros(2), gtol=1e-10)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.linalg.solve(np.asarray(A), np.asarray(b)),
                               rtol=1e-8)
    assert bool(res.success)


def test_rosenbrock():
    def rosen(x):
        return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
    res = trust_region_minimize(rosen, jnp.array([-1.2, 1.0]), gtol=1e-8,
                                max_iter=200)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-5)


def test_nonconvex_start():
    # Start where the Hessian is indefinite
    def f(x):
        return jnp.cos(x[0]) + 0.5 * (x[1] - 1.0) ** 2
    res = trust_region_minimize(f, jnp.array([0.1, 3.0]), gtol=1e-8,
                                max_iter=200)
    # converges to a minimum of cos: x0 = pi (mod 2pi)
    assert abs(abs(float(res.x[0])) - np.pi) < 1e-5
    np.testing.assert_allclose(float(res.x[1]), 1.0, atol=1e-6)
