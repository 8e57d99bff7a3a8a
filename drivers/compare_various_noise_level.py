"""Noise-level sweep (BASELINE config 4; reference
examples/CompareVariousNoiseLevel.py:132-196).

For each basis-function family and each of 200 noise magnitudes in
logspace(-2, 1), estimate (sigma, sigma0, eta). The reference farms the
levels to a multiprocessing pool; here ALL noise levels share one K (and
one eigendecomposition), and their 200 root-finding problems run as a
single *vectorized* Chandrupatla — one compiled program, one device.
GCV noise estimates are computed alongside (config 4).
"""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse

import numpy as np


def sweep(pts, X, noise_levels, nu=0.5, scale=0.1, seed=31):
    import jax
    import jax.numpy as jnp

    from gppe_tpu.models import direct_likelihood as dl
    from gppe_tpu.models import profile_likelihood as pl_mod
    from gppe_tpu.models.mixed_correlation import MixedCorrelation
    from gppe_tpu.ops import assembly, root_finding
    from gppe_tpu.utils import data as data_utils

    n, m = X.shape
    K = assembly.dense_correlation(pts, scale, nu)
    Km = MixedCorrelation(K)

    # batch of z vectors: same signal, per-level noise (reference
    # generate_data semantics with the fixed seed)
    signal = np.sin(np.asarray(pts) * np.pi).sum(axis=1)
    rng = np.random.RandomState(seed)
    eps = rng.randn(pts.shape[0])
    Z = signal[None, :] + np.asarray(noise_levels)[:, None] * eps[None, :]

    # rotate the whole batch at once
    data0 = dl.make_spectral_data(Km, X, Z[0])
    Zt = np.asarray(Km.rotate(jnp.asarray(Z.T)))  # (n, L) rotated
    Zt = jnp.asarray(Zt.T, dtype=data0.zt.dtype)  # (L, n)
    Xt = data0.Xt
    lam = data0.lam
    Zt = jax.device_put(Zt, list(lam.devices())[0])

    def der1_batch(log_eta_vec):
        def one(le, zt):
            d = dl.SpectralData(lam=lam, Xt=Xt, zt=zt)
            return pl_mod.log_likelihood_der1_eta(d, le)
        return jax.vmap(one)(log_eta_vec, Zt)

    L = Z.shape[0]
    lo = jnp.full((L,), -4.0, dtype=lam.dtype)
    hi = jnp.full((L,), 3.0, dtype=lam.dtype)
    f_lo = der1_batch(lo)
    f_hi = der1_batch(hi)
    bracketed = np.sign(np.asarray(f_lo)) != np.sign(np.asarray(f_hi))

    root, iters = root_finding.chandrupatla(
        der1_batch, lo, hi, f0=f_lo, f1=f_hi, eps_m=1e-6, eps_a=1e-6)
    eta = np.power(10.0, np.asarray(root))
    # boundary fallback where no bracket: pick boundary by sign
    eta = np.where(bracketed, eta,
                   np.where(np.asarray(f_hi) > 0, np.inf, 0.0))

    sigma = np.empty(L)
    sigma0 = np.empty(L)
    for i in range(L):
        d = dl.SpectralData(lam=lam, Xt=Xt, zt=Zt[i])
        if np.isinf(eta[i]):
            sigma[i] = 0.0
            sigma0[i] = float(pl_mod.find_optimal_sigma0(d))
        else:
            sigma[i] = float(pl_mod.find_optimal_sigma(d, eta[i]))
            sigma0[i] = np.sqrt(eta[i]) * sigma[i] if np.isfinite(eta[i]) \
                else 0.0

    # GCV noise estimates for the same problems (config 4)
    from gppe_tpu.models import gcv as gcv_mod
    gcv_sigma0 = np.empty(L)
    for i in range(L):
        d = dl.SpectralData(lam=lam, Xt=Xt, zt=Zt[i])
        gcv_sigma0[i] = gcv_mod.minimize_gcv(d)["sigma0"]

    return {"noise_levels": np.asarray(noise_levels), "eta": eta,
            "sigma": sigma, "sigma0": sigma0, "gcv_sigma0": gcv_sigma0}


def main(num_points=30, num_levels=200, results_path="data/noise_level_results.pickle",
         use_saved=False, verbose=True):
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    from gppe_tpu.utils import data as data_utils
    cfg.setup()

    def compute():
        pts = data_utils.generate_points(num_points, dimension=2)
        noise_levels = np.logspace(-2, 1, num_levels)
        out = {}
        # the reference's four basis families (CompareVariousNoiseLevel
        # :132-196): polynomial degrees 0..2 and trigonometric
        for name, kwargs in [
                ("poly0", dict(polynomial_degree=0)),
                ("poly1", dict(polynomial_degree=1)),
                ("poly2", dict(polynomial_degree=2)),
                ("poly2trig", dict(polynomial_degree=2,
                                   trigonometric=True))]:
            X = data_utils.generate_basis_functions(pts, **kwargs)
            out[name] = sweep(pts, X, noise_levels)
            if verbose:
                r = out[name]
                ratio = r["sigma0"][-20:] / noise_levels[-20:]
                print(f"[{name}] sigma0/noise at high noise: "
                      f"{np.nanmean(ratio):.3f}")
        return out

    return checkpoint.run_or_resume(results_path, compute,
                                    use_saved=use_saved, verbose=verbose)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=30)
    p.add_argument("--num-levels", type=int, default=200)
    p.add_argument("--use-saved", action="store_true")
    a = p.parse_args()
    main(a.num_points, a.num_levels, use_saved=a.use_saved)
