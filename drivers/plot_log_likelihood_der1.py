"""Derivative-of-likelihood plot driver (reference
examples/plot_log_likelihood_first_derivative.py:33-93): single dataset,
estimate eta by the derivative method, plot d lp/d eta with bounds and
asymptotes."""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse

import numpy as np


def main(num_points=30, noise=0.2, scale=0.1, nu=0.5, verbose=True):
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    from gppe_tpu.models import direct_likelihood as dl
    from gppe_tpu.models import profile_likelihood as pl_mod
    from gppe_tpu.models.mixed_correlation import MixedCorrelation
    from gppe_tpu.ops import assembly
    from gppe_tpu.utils import data as data_utils
    from gppe_tpu.utils import plot as plot_utils

    pts = data_utils.generate_points(num_points, dimension=2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, 2)
    K = assembly.dense_correlation(pts, scale, nu)
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)

    res = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])
    if verbose:
        print(f"eta={res['eta']:.4f} sigma={res['sigma']:.5f} "
              f"sigma0={res['sigma0']:.5f}")

    plot_utils.plot_log_likelihood_der1_eta(
        data, np.asarray(K, dtype=np.float64), np.asarray(X),
        np.asarray(z), optimal_eta=res["eta"])
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=30)
    a = p.parse_args()
    main(a.num_points)
