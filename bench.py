"""BASELINE scorecard benchmark (one JSON line, multiple metrics).

Headline (BASELINE.json north-star): profile log-likelihood derivative
evaluations/s at N=100k Matern points on one TPU chip, target >= 10/s.
The reference's own benchmark methodology
(examples/CompareVariousNumberOfPoints.py:241-280) times a
"pre-computation" phase (trace interpolation / eigendecomposition)
separately from the "maximize likelihood" phase; the numbers here follow
the same split. The `metrics` list carries the rest of the scorecard
(VERDICT r1 item 3):

* device setup (one Krylov factorization) + full MLE at N=4096, the
  reference's dense benchmark point (35.5 s precompute + 37.0 s
  root-find = 72.5 s total, data/VariousNumberOfPoints-dense.pickle);
* HMC samples/s at one chip (BASELINE row 3 — measured, no reference
  number exists);
* achieved TFLOP/s of the fused Pallas Matern matvec at N=100k, from its
  own CostEstimate FLOP formula, vs the v5e MXU f32 peak.
"""

import json
import time

import numpy as np

V5E_F32_PEAK_TFLOPS = 49.2   # 197 TFLOP/s bf16 / 4 (f32 multiplier passes)


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
    setup_s = time.perf_counter() - t0

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
        "setup_seconds": setup_s,
        "fit_seconds": fit_s,
        "eta_star": res["eta"],
        "sigma0": res["sigma0"],
    }


def bench_n4096_total():
    """The reference's dense benchmark config: N=4096 (64x64 2-D grid),
    rho=0.1, nu=0.5, derivative method. Reference totals: 35.5 s
    precompute + 37.0 s root-find = 72.5 s."""
    from gppe_tpu.models.large_scale import KrylovProfileLikelihood
    from gppe_tpu.ops import operators
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(64, dimension=2)   # N = 4096
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    op = operators.MaternOperator(pts, 0.1, nu=0.5)

    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=48,
                                  num_probes=16)
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = eng.fit()
    fit_s = time.perf_counter() - t0
    return {"setup_seconds": setup_s, "fit_seconds": fit_s,
            "total_seconds": setup_s + fit_s, "eta_star": res["eta"]}


def bench_hmc_samples():
    """HMC samples/s at one chip, n=400. (num_samples is a static scan
    length, so the compile warm-up must run the SAME shapes: run twice,
    time the second. The tunneled dev chip kills single XLA programs
    beyond ~10 min, which bounds n x iterations here; a directly attached
    chip runs the reference-size n=900 config fine.)"""
    import jax

    from gppe_tpu.models import hmc, priors
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(20, dimension=2)   # n = 400
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)

    def log_prior(eta, rho):
        return (priors.uniform_log_prior(eta, (1e-3, 1e4))
                + priors.uniform_log_prior(rho, (0.02, 0.6)))

    support = ((np.log10(1e-3), np.log10(1e4)),
               (np.log10(0.02), np.log10(0.6)))
    num_chains, num_samples, num_warmup = 8, 100, 100

    kwargs = dict(nu=0.5, num_chains=num_chains, num_samples=num_samples,
                  num_warmup=num_warmup, key=0, log_prior=log_prior,
                  support_log10=support)
    res = hmc.sample_posterior(pts, z, X, **kwargs)      # compile + warm
    jax.block_until_ready(res.samples)
    t0 = time.perf_counter()
    res = hmc.sample_posterior(pts, z, X, **kwargs)
    jax.block_until_ready(res.samples)
    wall = time.perf_counter() - t0
    return {"samples_per_s": num_chains * num_samples / wall,
            "wall_seconds": wall,
            "accept_rate": float(np.mean(np.asarray(res.accept_rate)))}


def bench_pallas_matvec():
    """Achieved FLOP/s of the fused Matern matvec at N=100k (the FLOP
    count of the kernel's own CostEstimate, pallas_kernels.py)."""
    import jax

    from gppe_tpu.ops import operators
    from gppe_tpu.utils.config import is_tpu

    n, r, d = 100_000, 16, 2
    rng = np.random.RandomState(3)
    pts = rng.rand(n, 2)
    V = np.asarray(rng.standard_normal((n, r)), np.float32)
    op = operators.MaternOperator(pts, 0.1, nu=0.5)
    out = op.matmat(V)
    jax.block_until_ready(out)                     # compile + warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = op.matmat(V)
    jax.block_until_ready(out)
    secs = (time.perf_counter() - t0) / reps

    if op.use_pallas:
        tile = 512
        n_pad = -(-n // tile) * tile
        r_pad = max(128, -(-r // 128) * 128)
        flops = 2 * n_pad * n_pad * (r_pad + d + 4)
    else:
        flops = 2 * n * n * (r + d + 4)
    tflops = flops / secs / 1e12
    return {"tflops": tflops, "seconds": secs,
            "pallas": bool(op.use_pallas), "tpu": bool(is_tpu())}


def main():
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    head = bench_der1_n100k()
    n4096 = bench_n4096_total()
    hmc_m = bench_hmc_samples()
    mv = bench_pallas_matvec()

    evals_per_s = head["evals_per_s"]
    baseline = 10.0  # BASELINE.json target: >= 10 evals/s at N=100k
    metrics = [
        {"metric": "profile_loglik_derivative_evals_per_s_n100k",
         "value": round(evals_per_s, 2), "unit": "evals/s",
         "vs_baseline": round(evals_per_s / baseline, 2)},
        {"metric": "krylov_setup_seconds_n100k",
         "value": round(head["setup_seconds"], 2), "unit": "s",
         # no same-N reference number exists; the reference's largest
         # DENSE precompute is 35.5 s at N=4096 — ratio quoted at N=4096
         # below; here vs_baseline is the N=4096 reference number over
         # this 24x-larger problem's setup (>1 means faster than the
         # reference was at 1/24 the size)
         "vs_baseline": round(35.5 / head["setup_seconds"], 2)},
        {"metric": "derivative_method_total_seconds_n4096",
         "value": round(n4096["total_seconds"], 2), "unit": "s",
         # reference total at the same config: 72.5 s
         # (data/VariousNumberOfPoints-dense.pickle); >1 = speedup
         "vs_baseline": round(72.5 / n4096["total_seconds"], 2)},
        {"metric": "hmc_samples_per_s_n400_1chip",
         "value": round(hmc_m["samples_per_s"], 2), "unit": "samples/s",
         # BASELINE row 3: "measured" — no reference number exists
         "vs_baseline": None},
        {"metric": "pallas_matern_matvec_tflops_n100k",
         "value": round(mv["tflops"], 2), "unit": "TFLOP/s",
         "vs_baseline": round(mv["tflops"] / V5E_F32_PEAK_TFLOPS, 3)},
    ]
    print(json.dumps({
        "metric": "profile_loglik_derivative_evals_per_s_n100k",
        "value": round(evals_per_s, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_s / baseline, 2),
        "setup_seconds": round(head["setup_seconds"], 2),
        "fit_seconds": round(head["fit_seconds"], 2),
        "eta_star": head["eta_star"],
        "sigma0": head["sigma0"],
        "n": 100_000,
        "n4096_setup_seconds": round(n4096["setup_seconds"], 2),
        "hmc_accept_rate": round(hmc_m["accept_rate"], 3),
        "matvec_seconds": round(mv["seconds"], 4),
        "metrics": metrics,
    }))


if __name__ == "__main__":
    main()
