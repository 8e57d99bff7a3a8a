"""Posterior sampling driver (BASELINE config 5): HMC or NUTS chains over
(log10 eta, log10 rho), chain axis sharded over the device mesh."""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def main(num_points=30, noise=0.2, num_chains=8, num_samples=500,
         num_warmup=400, use_mesh=True, sampler="hmc",
         results_path="data/posterior_samples.pickle", verbose=True):
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    import jax

    from gppe_tpu.models import hmc, nuts, priors
    from gppe_tpu.parallel import mesh as mesh_mod
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(num_points, dimension=2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, 2)

    def log_prior(eta, rho):
        return (priors.uniform_log_prior(eta, (1e-3, 1e4))
                + priors.uniform_log_prior(rho, (0.02, 0.6)))

    # sample in sigmoid-transformed coordinates over the prior box: no
    # hard boundary for the integrator (-> no boundary divergences)
    support = ((np.log10(1e-3), np.log10(1e4)),
               (np.log10(0.02), np.log10(0.6)))

    mesh = None
    if use_mesh and len(jax.devices()) > 1:
        mesh = mesh_mod.make_mesh(probe=min(num_chains,
                                            len(jax.devices())))

    if sampler not in ("hmc", "nuts"):
        raise ValueError(f"sampler must be 'hmc' or 'nuts', got {sampler!r}")
    sampler_mod = {"hmc": hmc, "nuts": nuts}[sampler]
    t0 = time.perf_counter()
    res = sampler_mod.sample_posterior(
        pts, z, X, nu=0.5, num_chains=num_chains,
        num_samples=num_samples, num_warmup=num_warmup, key=0,
        log_prior=log_prior, mesh=mesh, support_log10=support)
    wall = time.perf_counter() - t0

    samples = np.asarray(res.samples)          # (S, C, 2)
    flat = samples.reshape(-1, 2)
    total = num_chains * num_samples
    out = {
        "samples": samples,
        "accept_rate": np.asarray(res.accept_rate),
        "step_size": np.asarray(res.step_size),
        "posterior_mean_log10_eta": float(flat[:, 0].mean()),
        "posterior_mean_log10_rho": float(flat[:, 1].mean()),
        "posterior_std": flat.std(0),
        "samples_per_second": total / wall,
        "wall_seconds": wall,
    }
    if hasattr(res, "divergences"):          # NUTS diagnostics
        out["divergences"] = np.asarray(res.divergences)
        out["mean_tree_depth"] = np.asarray(res.mean_tree_depth)
    if verbose:
        print(f"{total} samples in {wall:.1f}s "
              f"({out['samples_per_second']:.1f} samples/s); "
              f"accept {out['accept_rate'].mean():.2f}; "
              f"eta* ~ 10^{out['posterior_mean_log10_eta']:.2f}, "
              f"rho* ~ 10^{out['posterior_mean_log10_rho']:.2f}")
    checkpoint.save_results(out, results_path, verbose=verbose)
    checkpoint.save_hmc_state(res, results_path + ".state")
    return out


def main_nu(num_points=30, noise=0.05, num_chains=8, num_samples=400,
            num_warmup=300, num_leapfrog=16,
            results_path="data/posterior_nu_samples.pickle",
            verbose=True):
    """Full (log10 eta, log10 rho, nu) posterior at the reference's
    flagship config (n=900, noise 0.05 — the dataset of the golden MAP
    sweep, reference examples/FindOptimalCovarianceParameters.py:640-666,
    data/OptimalCovariance_WithPrior.pickle). With the golden priors
    (inverse-square on rho and on nu/25) the MAP sits at rho ~ 0.177,
    nu ~ 3.03; the sampled posterior concentrates on the same
    rho-nu ridge, and the profile-lp argmax over the SAMPLES recovers
    the golden mode (reported as map_rho / map_nu)."""
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    from gppe_tpu.models import hmc
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(num_points, dimension=2)
    z = data_utils.generate_data(pts, noise)
    X = data_utils.generate_basis_functions(pts, 2)

    t0 = time.perf_counter()
    res = hmc.sample_posterior_nu(
        pts, z, X, num_chains=num_chains, num_samples=num_samples,
        num_warmup=num_warmup, num_leapfrog=num_leapfrog, key=0,
        log_prior="reference", log10_rho_bounds=(-1.3, -0.3),
        nu_bounds=(1.0, 25.0))
    wall = time.perf_counter() - t0

    samples = np.asarray(res.samples)           # (S, C, 3)
    flat = samples.reshape(-1, 3)
    lps = np.asarray(res.log_probs).ravel()
    i_map = int(np.argmax(lps))
    total = num_chains * num_samples
    out = {
        "samples": samples,
        "accept_rate": np.asarray(res.accept_rate),
        "posterior_mean": flat.mean(0),
        "posterior_std": flat.std(0),
        "map_log10_eta": float(flat[i_map, 0]),
        "map_rho": float(10.0 ** flat[i_map, 1]),
        "map_nu": float(flat[i_map, 2]),
        "nu_mode": float(np.median(flat[:, 2])),
        "samples_per_second": total / wall,
        "wall_seconds": wall,
        "golden_map": {"rho": 0.1767, "nu": 3.034},
    }
    if verbose:
        print(f"{total} samples in {wall:.1f}s "
              f"({out['samples_per_second']:.1f}/s); accept "
              f"{out['accept_rate'].mean():.2f}; sample-MAP rho "
              f"{out['map_rho']:.4f} nu {out['map_nu']:.3f} "
              f"(golden 0.1767 / 3.034); nu median {out['nu_mode']:.3f}")
    checkpoint.save_results(out, results_path, verbose=verbose)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=30)
    p.add_argument("--num-chains", type=int, default=8)
    p.add_argument("--num-samples", type=int, default=500)
    p.add_argument("--sampler", choices=("hmc", "nuts"), default="hmc")
    p.add_argument("--nu", action="store_true",
                   help="sample the full (eta, rho, nu) posterior at the "
                        "golden MAP config (n=900, noise 0.05)")
    a = p.parse_args()
    if a.nu:
        main_nu(a.num_points, num_chains=a.num_chains,
                num_samples=a.num_samples)
    else:
        main(a.num_points, num_chains=a.num_chains,
             num_samples=a.num_samples, sampler=a.sampler)
