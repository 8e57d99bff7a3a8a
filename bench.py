"""BASELINE scorecard benchmark (one JSON line, multiple metrics).

Headline (BASELINE.json north-star): profile log-likelihood derivative
evaluations/s at N=100k Matern points on one TPU chip, target >= 10/s.
The reference's own benchmark methodology
(examples/CompareVariousNumberOfPoints.py:241-280) times a
"pre-computation" phase (trace interpolation / eigendecomposition)
separately from the "maximize likelihood" phase; the numbers here follow
the same split, and every timed phase is reported {cold, warm}
(VERDICT r2 item 6: cold includes XLA/Mosaic compilation — real work on
a fresh machine but not the steady-state cost; warm is the honest
number for comparing against the reference's purely numerical timings).

The `metrics` list carries the full scorecard:

* N=100k Krylov setup cold/warm + evals/s (BASELINE row 1);
* N=4096 derivative-method total cold/warm vs the reference's 72.5 s
  (data/VariousNumberOfPoints-dense.pickle);
* tapered-sparse totals at N=2^16/2^18/2^20 vs the reference's
  28 / 485 / 10,032 s — read from the driver artifact
  (drivers/compare_various_num_points.py --sparse ->
  data/various_number_of_points_sparse.pickle) or measured live at 2^16;
* HMC samples/s at the reference config n=900, chains in {8, 64, 256}
  (BASELINE row 3, 1-chip column; VERDICT r2 item 7);
* large-N posterior sampling: samples/s at N=100k with 64 chains on the
  amortized Krylov surface (BASELINE config 5; VERDICT r2 item 2);
* matrix-free grid-batched Krylov: amortized setup s/point at n=100k
  (multi-rho fused kernel; VERDICT r2 item 4);
* achieved TFLOP/s of the fused Pallas Matern matvec at N=100k measured
  inside a jitted dependent chain (independent repeated dispatches
  overlap on the tunneled backend and under-read ~7x);
* single-chip ring-vs-allgather sharded step delta (VERDICT r2 item 9).

Each section is fault-isolated: a failing section reports an "error"
metric instead of killing the whole scorecard.
"""

import functools
import json
import os
import pickle
import time
import traceback

import numpy as np

V5E_F32_PEAK_TFLOPS = 49.2   # 197 TFLOP/s bf16 / 4 (f32 multiplier passes)

_REPO = os.path.dirname(os.path.abspath(__file__))


def bench_der1_n100k():
    from gppe_tpu.models.large_scale import KrylovProfileLikelihood
    from gppe_tpu.ops import operators
    from gppe_tpu.utils import data as data_utils

    n = 100_000
    rng = np.random.RandomState(7)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)

    op = operators.MaternOperator(pts, 0.1, nu=0.5)

    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=64,
                                  num_probes=16)
    setup_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=64,
                                  num_probes=16)
    setup_warm = time.perf_counter() - t0

    # warm + measure the per-eta evaluation rate (the optimizer's inner
    # loop cost)
    eng.der1(1.0)
    n_evals = 100
    t0 = time.perf_counter()
    for i in range(n_evals):
        eng.der1(0.5 + 2.0 * (i / n_evals))
    eval_s = (time.perf_counter() - t0) / n_evals

    t0 = time.perf_counter()
    res = eng.fit()
    fit_s = time.perf_counter() - t0
    return {
        "evals_per_s": 1.0 / eval_s,
        "setup_cold_seconds": setup_cold,
        "setup_warm_seconds": setup_warm,
        "fit_seconds": fit_s,
        "eta_star": res["eta"],
        "sigma0": res["sigma0"],
    }


def bench_n4096_total():
    """The reference's dense benchmark config: N=4096 (64x64 2-D grid),
    rho=0.1, nu=0.5, derivative method. Reference totals: 35.5 s
    precompute + 37.0 s root-find = 72.5 s (real numerical work on its
    CPU — compare against our WARM total; the cold total additionally
    carries XLA compilation, reported separately)."""
    from gppe_tpu.models.large_scale import KrylovProfileLikelihood
    from gppe_tpu.ops import operators
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(64, dimension=2)   # N = 4096
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    op = operators.MaternOperator(pts, 0.1, nu=0.5)

    def once():
        t0 = time.perf_counter()
        eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=48,
                                      num_probes=16)
        setup_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = eng.fit()
        return setup_s, time.perf_counter() - t0, res

    setup_cold, fit_cold, res = once()
    setup_warm, fit_warm, res = once()
    return {"setup_cold_seconds": setup_cold,
            "setup_warm_seconds": setup_warm,
            "total_cold_seconds": setup_cold + fit_cold,
            "total_warm_seconds": setup_warm + fit_warm,
            "eta_star": res["eta"]}


def bench_sparse_scaling():
    """Tapered-sparse totals vs the reference's sparse race. Prefers the
    driver artifact (the full N sweep run once, pickled); measures
    N=2^16 live when absent so the metric never silently disappears."""
    ref = {65536: 28.0, 262144: 485.0, 1048576: 10032.0}
    path = os.path.join(_REPO, "data",
                        "various_number_of_points_sparse.pickle")
    rows = []
    if os.path.exists(path):
        with open(path, "rb") as f:
            saved = pickle.load(f)
        for r in saved.get("sparse", []):
            rows.append({"n": r["n"], "total_seconds": r["total_s"],
                         "pre_seconds": r["pre_s"], "opt_seconds":
                         r["opt_s"], "reference_seconds": ref.get(r["n"]),
                         "source": "artifact"})
    else:
        import drivers.compare_various_num_points as cvnp
        t0 = time.perf_counter()
        r = cvnp.run_krylov(65536, scale=0.005, density=1e-3, grid=True)
        rows.append({"n": 65536, "total_seconds": r["pre_s"] + r["opt_s"],
                     "pre_seconds": r["pre_s"], "opt_seconds": r["opt_s"],
                     "reference_seconds": ref[65536], "source": "live"})
    return rows


def bench_hmc_sweep(chain_counts=(8, 64, 256), n_side=30,
                    num_samples=100, num_warmup=100):
    """HMC samples/s at the reference config n=900 (30x30 grid,
    FindOptimalCovarianceParameters.py) per chain count — BASELINE row
    3's one-chip column (VERDICT r2 item 7).

    The sweep target is the amortized Krylov surface — the framework's
    recommended posterior target at any n (per-leapfrog cost independent
    of n and of the chain count's O(n^3) alternative). A dense-Cholesky
    target anchors the moments at 8 chains: at 256 chains x 200 scan
    steps x 16 leapfrogs the dense target is ~10^15 FLOPs of batched
    Cholesky — beyond the tunneled chip's per-program ceiling (it faults
    the device), and exactly the regime the surface exists for.
    num_samples is a static scan length, so the compile warm-up must run
    the SAME shapes: run twice, time the second."""
    import jax

    from gppe_tpu.models import hmc
    from gppe_tpu.models.krylov_posterior import KrylovPosteriorSurface
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(n_side, dimension=2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)

    surface = KrylovPosteriorSurface(pts, z, X, nu=0.5,
                                     log10_rho_bounds=(-1.5, -0.5))

    out = []
    for num_chains in chain_counts:
        kwargs = dict(nu=0.5, num_chains=num_chains,
                      num_samples=num_samples, num_warmup=num_warmup,
                      key=0, surface=surface,
                      log10_eta_bounds=(-3.0, 4.0))
        res, _ = hmc.sample_posterior_large(pts, z, X, **kwargs)
        jax.block_until_ready(res.samples)                # compile + warm
        t0 = time.perf_counter()
        res, _ = hmc.sample_posterior_large(pts, z, X, **kwargs)
        jax.block_until_ready(res.samples)
        wall = time.perf_counter() - t0
        s = np.asarray(res.samples).reshape(-1, 2)
        out.append({"chains": num_chains, "target": "surface",
                    "samples_per_s": num_chains * num_samples / wall,
                    "wall_seconds": wall,
                    "log10_eta_mean": float(s[:, 0].mean()),
                    "accept_rate": float(np.mean(
                        np.asarray(res.accept_rate)))})

    # dense-target anchor (8 chains): cross-method moment check. Same
    # posterior as the surface rows: flat in log10(eta, rho) inside the
    # support box (a uniform-in-LINEAR-eta prior would put mass ~ eta in
    # log space and drag the mean up the flat high-eta profile tail —
    # the two targets must disagree only by their lp approximation).
    support = ((-3.0, 4.0), (-1.5, -0.5))   # the surface rows' box
    kwargs = dict(nu=0.5, num_chains=8, num_samples=num_samples,
                  num_warmup=num_warmup, key=0, log_prior=None,
                  support_log10=support)
    res = hmc.sample_posterior(pts, z, X, **kwargs)
    jax.block_until_ready(res.samples)
    t0 = time.perf_counter()
    res = hmc.sample_posterior(pts, z, X, **kwargs)
    jax.block_until_ready(res.samples)
    wall = time.perf_counter() - t0
    s = np.asarray(res.samples).reshape(-1, 2)
    out.append({"chains": 8, "target": "dense",
                "samples_per_s": 8 * num_samples / wall,
                "wall_seconds": wall,
                "log10_eta_mean": float(s[:, 0].mean()),
                "accept_rate": float(np.mean(np.asarray(res.accept_rate)))})
    return out


def bench_posterior_large_n100k(num_chains=64, num_samples=200,
                                num_warmup=100):
    """Large-N posterior sampling (BASELINE config 5): HMC over
    (log10 eta, log10 rho) at N=100k on the amortized matrix-free Krylov
    surface — all O(n) work in setup, per-leapfrog cost independent of
    n (models.krylov_posterior)."""
    import jax

    from gppe_tpu.models import hmc
    from gppe_tpu.utils import data as data_utils

    n = 100_000
    rng = np.random.RandomState(7)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)

    t0 = time.perf_counter()
    res, surface = hmc.sample_posterior_large(
        pts, z, X, nu=0.5, num_chains=num_chains, num_samples=1,
        num_warmup=0, key=0)
    jax.block_until_ready(res.samples)
    setup_s = time.perf_counter() - t0          # surface + first compile

    t0 = time.perf_counter()
    res, _ = hmc.sample_posterior_large(
        pts, z, X, nu=0.5, num_chains=num_chains,
        num_samples=num_samples, num_warmup=num_warmup, key=0,
        surface=surface)
    jax.block_until_ready(res.samples)
    wall = time.perf_counter() - t0
    s = np.asarray(res.samples).reshape(-1, 2)
    return {"samples_per_s": num_chains * num_samples / wall,
            "setup_seconds": setup_s,
            "sampling_wall_seconds": wall,
            "chains": num_chains,
            "accept_rate": float(np.mean(np.asarray(res.accept_rate))),
            "log10_eta_mean": float(s[:, 0].mean()),
            "log10_rho_mean": float(s[:, 1].mean())}


def bench_grid_krylov_n100k(num_points=8):
    """Matrix-free grid-batched Krylov at n=100k: amortized setup
    seconds/point over one multi-rho chunk (VERDICT r2 item 4 — the
    dense (b, n, n) chunk died around n ~ 3e4; the reference rebuilds
    its whole precompute per grid point)."""
    from gppe_tpu.models.grid_krylov import GridKrylovProfileLikelihood
    from gppe_tpu.utils import data as data_utils

    n = 100_000
    rng = np.random.RandomState(7)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    rhos = np.linspace(0.05, 0.3, num_points)
    nus = np.full(num_points, 0.5)

    t0 = time.perf_counter()
    g = GridKrylovProfileLikelihood(pts, X, z, rhos, nus, nu_static=0.5,
                                    lanczos_steps=40, num_probes=8,
                                    matrix_free=True, chunk=num_points)
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    results = g.fit_all()
    fit_s = time.perf_counter() - t0
    best = max(results, key=lambda r: r["lp"])
    return {"points": num_points, "setup_seconds": setup_s,
            "seconds_per_point": setup_s / num_points,
            "fit_all_seconds": fit_s,
            "best_rho": best["rho"], "best_lp": best["lp"]}


def bench_pallas_matvec():
    """Achieved FLOP/s of the fused Matern matvec at N=100k, steady
    state measured INSIDE a jitted dependent chain (independent repeated
    dispatches overlap on the tunneled backend and under-read ~7x; the
    chained number is what Lanczos actually pays)."""
    import jax
    import jax.numpy as jnp

    from gppe_tpu.ops import operators
    from gppe_tpu.utils.config import is_tpu

    n, r, d = 100_000, 23, 2
    rng = np.random.RandomState(3)
    pts = rng.rand(n, 2)
    V = np.asarray(rng.standard_normal((n, r)), np.float32)
    op = operators.MaternOperator(pts, 0.1, nu=0.5)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(V, k):
        def body(j, V):
            W = op.matmat(V)
            return W / jnp.linalg.norm(W, axis=0)
        return jax.lax.fori_loop(0, k, body, V)

    jax.block_until_ready(chain(V, 4))             # compile + warm
    reps = 30
    t0 = time.perf_counter()
    jax.block_until_ready(chain(V, reps))
    secs = (time.perf_counter() - t0) / reps

    if op.use_pallas:
        from gppe_tpu.ops.pallas_kernels import DEFAULT_TILE
        n_pad = -(-n // DEFAULT_TILE) * DEFAULT_TILE
        r_pad = max(128, -(-r // 128) * 128)
        flops = 2 * n_pad * n_pad * (r_pad + d + 4)
    else:
        flops = 2 * n * n * (r + d + 4)
    tflops = flops / secs / 1e12
    return {"tflops": tflops, "seconds": secs,
            "pallas": bool(op.use_pallas), "tpu": bool(is_tpu())}


def bench_ring_vs_allgather(n=4096):
    """Single-chip sharded-step time under both communication schedules
    (VERDICT r2 item 9). On one device the collectives are degenerate —
    the delta measures schedule overhead only; the multi-device deltas
    are correctness-grade on the virtual CPU mesh (see
    drivers/scaling_efficiency.py)."""
    from drivers import scaling_efficiency as se

    out = {}
    for comm in ("ring", "allgather"):
        out[comm + "_seconds"] = se.measure(1, n, comm=comm)
    out["delta_seconds"] = (out["ring_seconds"]
                            - out["allgather_seconds"])
    return out


def _safe(fn, *args, **kwargs):
    try:
        return fn(*args, **kwargs), None
    except Exception:
        return None, traceback.format_exc(limit=3)


def main():
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    metrics = []
    errors = {}

    head, err = _safe(bench_der1_n100k)
    if err:
        errors["der1_n100k"] = err
        head = {"evals_per_s": 0.0, "setup_cold_seconds": -1,
                "setup_warm_seconds": -1, "fit_seconds": -1,
                "eta_star": None, "sigma0": None}
    evals_per_s = head["evals_per_s"]
    baseline = 10.0  # BASELINE.json target: >= 10 evals/s at N=100k
    metrics.append(
        {"metric": "profile_loglik_derivative_evals_per_s_n100k",
         "value": round(evals_per_s, 2), "unit": "evals/s",
         "vs_baseline": round(evals_per_s / baseline, 2)})
    if head["setup_cold_seconds"] > 0:
        # no same-N reference number exists; the reference's largest
        # DENSE precompute is 35.5 s at N=4096 — vs_baseline is that
        # number over this 24x-larger problem's setup (>1 = faster than
        # the reference was at 1/24 the size). Warm is the steady-state
        # comparison; cold additionally pays XLA/Mosaic compilation.
        metrics.append(
            {"metric": "krylov_setup_warm_seconds_n100k",
             "value": round(head["setup_warm_seconds"], 2), "unit": "s",
             "vs_baseline": round(35.5 / head["setup_warm_seconds"], 2)})
        metrics.append(
            {"metric": "krylov_setup_cold_seconds_n100k",
             "value": round(head["setup_cold_seconds"], 2), "unit": "s",
             "vs_baseline": round(35.5 / head["setup_cold_seconds"], 2)})

    n4096, err = _safe(bench_n4096_total)
    if err:
        errors["n4096"] = err
    else:
        # reference total at the same config: 72.5 s
        # (data/VariousNumberOfPoints-dense.pickle); >1 = speedup
        metrics.append(
            {"metric": "derivative_method_total_warm_seconds_n4096",
             "value": round(n4096["total_warm_seconds"], 2), "unit": "s",
             "vs_baseline": round(72.5 / n4096["total_warm_seconds"], 2)})
        metrics.append(
            {"metric": "derivative_method_total_cold_seconds_n4096",
             "value": round(n4096["total_cold_seconds"], 2), "unit": "s",
             "vs_baseline": round(72.5 / n4096["total_cold_seconds"], 2)})

    sparse, err = _safe(bench_sparse_scaling)
    if err:
        errors["sparse"] = err
    else:
        for row in sparse:
            ref_s = row["reference_seconds"]
            metrics.append(
                {"metric": f"sparse_derivative_total_seconds_n{row['n']}",
                 "value": round(row["total_seconds"], 2), "unit": "s",
                 "vs_baseline": (round(ref_s / row["total_seconds"], 1)
                                 if ref_s else None),
                 "source": row["source"]})

    post, err = _safe(bench_posterior_large_n100k)
    if err:
        errors["posterior_large"] = err
    else:
        metrics.append(
            {"metric": "posterior_samples_per_s_n100k_64chains",
             "value": round(post["samples_per_s"], 2), "unit": "samples/s",
             # BASELINE config 5: unreachable for the reference (its
             # outer loop rebuilds an O(n^3) precompute per point)
             "vs_baseline": None,
             "setup_seconds": round(post["setup_seconds"], 2),
             "accept_rate": round(post["accept_rate"], 3)})

    grid, err = _safe(bench_grid_krylov_n100k)
    if err:
        errors["grid_krylov"] = err
    else:
        metrics.append(
            {"metric": "grid_krylov_setup_s_per_point_n100k",
             "value": round(grid["seconds_per_point"], 2), "unit": "s",
             # the reference pays a full fresh precompute per grid point;
             # our single-point N=100k setup (warm) is the self-baseline
             "vs_baseline": (round(head["setup_warm_seconds"]
                                   / grid["seconds_per_point"], 2)
                             if head["setup_warm_seconds"] > 0 else None),
             "points": grid["points"]})

    mv, err = _safe(bench_pallas_matvec)
    if err:
        errors["pallas_matvec"] = err
    else:
        metrics.append(
            {"metric": "pallas_matern_matvec_tflops_n100k",
             "value": round(mv["tflops"], 2), "unit": "TFLOP/s",
             "vs_baseline": round(mv["tflops"] / V5E_F32_PEAK_TFLOPS, 3)})

    ring, err = _safe(bench_ring_vs_allgather)
    if err:
        errors["ring_allgather"] = err
    else:
        metrics.append(
            {"metric": "sharded_step_ring_minus_allgather_seconds_1chip",
             "value": round(ring["delta_seconds"], 4), "unit": "s",
             "vs_baseline": None,
             "ring_seconds": round(ring["ring_seconds"], 4),
             "allgather_seconds": round(ring["allgather_seconds"], 4)})

    # last: the n=900 chain sweep (its dense anchor is the heaviest
    # single XLA program in the scorecard)
    hmc_rows, err = _safe(bench_hmc_sweep)
    if err:
        errors["hmc_sweep"] = err
        hmc_rows = []
    for row in hmc_rows:
        tgt = "" if row["target"] == "surface" else "_dense"
        metrics.append(
            {"metric":
             f"hmc_samples_per_s_n900_1chip{tgt}_c{row['chains']}",
             "value": round(row["samples_per_s"], 2), "unit": "samples/s",
             # BASELINE row 3: "measured" — no reference number exists
             "vs_baseline": None,
             "accept_rate": round(row["accept_rate"], 3),
             "log10_eta_mean": round(row["log10_eta_mean"], 3)})

    out = {
        "metric": "profile_loglik_derivative_evals_per_s_n100k",
        "value": round(evals_per_s, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / baseline, 2),
        "setup_cold_seconds": round(head["setup_cold_seconds"], 2),
        "setup_warm_seconds": round(head["setup_warm_seconds"], 2),
        "fit_seconds": round(head["fit_seconds"], 2),
        "eta_star": head["eta_star"],
        "sigma0": head["sigma0"],
        "n": 100_000,
        "metrics": metrics,
    }
    if errors:
        out["errors"] = {k: v.splitlines()[-1] for k, v in errors.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
