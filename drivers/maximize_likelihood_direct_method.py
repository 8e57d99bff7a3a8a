"""End-to-end MLE driver (BASELINE config 1).

Port of reference examples/maximize_likelihood_direct_method.py:28-61:
50x50 grid (n=2500), noise 0.2, Matern nu=0.5 scale=0.1, polynomial-2
basis; trains with both the direct and profiled methods and reports
wall-clock split into precompute and optimize phases (the reference's
benchmark methodology, CompareVariousNumberOfPoints.py:241-280).
"""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main(num_points=50, noise=0.2, nu=0.5, scale=0.1, degree=2,
         verbose=True):
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    import gppe_tpu
    from gppe_tpu.ops import assembly
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(num_points, dimension=2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, polynomial_degree=degree)

    t0 = time.perf_counter()
    K = assembly.dense_correlation(pts, scale, nu)
    K.block_until_ready()
    t_assembly = time.perf_counter() - t0

    results = {}
    for method in ("direct", "profiled"):
        t0 = time.perf_counter()
        gp = gppe_tpu.GaussianProcess(X, K, likelihood_method=method)
        t_pre = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = gp.train(z)
        t_opt = time.perf_counter() - t0
        res.update({"precompute_s": t_pre, "optimize_s": t_opt})
        results[method] = res
        if verbose:
            print(f"[{method}] sigma={res['sigma']:.6f} "
                  f"sigma0={res['sigma0']:.6f} eta={res['eta']:.4f} "
                  f"(pre {t_pre:.2f}s, opt {t_opt:.2f}s)")
    if verbose:
        print(f"assembly: {t_assembly:.2f}s, n={pts.shape[0]}")
    results["assembly_s"] = t_assembly
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=50)
    p.add_argument("--noise", type=float, default=0.2)
    p.add_argument("--nu", type=float, default=0.5)
    p.add_argument("--scale", type=float, default=0.1)
    a = p.parse_args()
    main(a.num_points, a.noise, a.nu, a.scale)
