"""Optimal kernel-parameter search over (rho, nu) — grid, MAP, global
optimizer (reference examples/FindOptimalCovarianceParameters.py:278-754;
goldens data/OptimalCovariance_{Without,With}Prior.pickle).

The reference evaluates a 61x60 (rho, nu) grid on a multiprocessing pool
(:676-690) and offers differential_evolution(workers=-1) (:347-349).
Here the grid is chunked vmapped batches of the fused
assembly+Cholesky profile likelihood (general nu runs through the
pure-JAX Bessel K_nu), and the global optimizer is the on-device
differential evolution of gppe_tpu.ops.global_opt.
"""

import argparse

import numpy as np


def build_objective(pts, z, X, with_prior):
    import jax.numpy as jnp

    from gppe_tpu.models import profile_likelihood  # noqa: F401
    from gppe_tpu.models.priors import uniform_log_prior
    from gppe_tpu.ops import kernels
    from gppe_tpu.utils.config import compute_dtype

    dtype = compute_dtype()
    pts_j = jnp.asarray(pts, dtype=dtype)
    z_j = jnp.asarray(z, dtype=dtype)
    X_j = jnp.asarray(X, dtype=dtype)
    n, m = X.shape

    def lp(rho, nu):
        """Profile likelihood maximized over (sigma, eta) analytically in
        sigma and by a small fixed golden grid in eta (the reference's
        inner FindOptimalSigmaSigma0 role, :45-67)."""
        import jax

        dist = kernels.pairwise_scaled_distance(pts_j, pts_j, rho)
        K = kernels.matern(dist, nu)   # traced nu -> Bessel branch
        lam, Q = jnp.linalg.eigh(K)
        lam = jnp.maximum(lam, 0.0)
        Xt = Q.T @ X_j
        zt = Q.T @ z_j

        def neg_prof(log10_eta):
            eta = jnp.power(10.0, log10_eta)
            D = 1.0 / (lam + eta)
            Yt = D[:, None] * Xt
            B = Xt.T @ Yt
            LB = jnp.linalg.cholesky(0.5 * (B + B.T))
            logdet_B = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB)))
            c = jax.scipy.linalg.cho_solve((LB, True), Yt.T @ zt)
            zMz = zt @ (D * zt) - (Yt.T @ zt) @ c
            sigma2 = zMz / (n - m)
            logdet_Kn = jnp.sum(jnp.log(lam + eta))
            return -(-0.5 * (n - m) * jnp.log(sigma2) - 0.5 * logdet_Kn
                     - 0.5 * logdet_B - 0.5 * (n - m))

        # inner eta optimization: coarse grid + golden refinement
        grid = jnp.linspace(-4.0, 3.0, 29)
        vals = jax.vmap(neg_prof)(grid)
        i0 = jnp.argmin(vals)
        lo = grid[jnp.maximum(i0 - 1, 0)]
        hi = grid[jnp.minimum(i0 + 1, 28)]
        gr = 0.5 * (jnp.sqrt(5.0) - 1.0)

        def golden(_, st):
            lo, hi = st
            x1 = hi - gr * (hi - lo)
            x2 = lo + gr * (hi - lo)
            f1 = neg_prof(x1)
            f2 = neg_prof(x2)
            lo = jnp.where(f1 < f2, lo, x1)
            hi = jnp.where(f1 < f2, x2, hi)
            return (lo, hi)

        lo, hi = jax.lax.fori_loop(0, 25, golden, (lo, hi))
        best = 0.5 * (lo + hi)
        return -neg_prof(best)

    def objective(params):
        """negative log posterior over params = [rho, nu]."""
        rho, nu = params[0], params[1]
        val = lp(rho, nu)
        if with_prior:
            # reference :119-130: uniform rho >= 0, nu in [0, 25]
            val = val + uniform_log_prior(rho, (1e-3, jnp.inf))
            val = val + uniform_log_prior(nu, (1e-2, 25.0))
        return -val

    return lp, objective


def main(num_points=30, noise=0.05, with_prior=False, grid_rho=25,
         grid_nu=24, results_path=None, use_saved=False, verbose=True,
         run_de=True):
    from gppe_tpu.utils import checkpoint
    from gppe_tpu.utils import config as cfg
    from gppe_tpu.utils import data as data_utils
    cfg.setup()

    import jax
    import jax.numpy as jnp

    from gppe_tpu.ops.global_opt import differential_evolution

    if results_path is None:
        tag = "with" if with_prior else "without"
        results_path = f"data/optimal_covariance_{tag}_prior.pickle"

    def compute():
        pts = data_utils.generate_points(num_points, dimension=2)
        z = data_utils.generate_data(pts, noise)
        X = data_utils.generate_basis_functions(pts, polynomial_degree=2)
        lp, objective = build_objective(pts, z, X, with_prior)

        # grid over (rho, nu) — the reference's 61x60 grid (:664-666),
        # sized by arguments; vmapped in row chunks
        rhos = np.linspace(0.1, 0.3, grid_rho)
        nus = np.linspace(1.0, 25.0, grid_nu)
        lp_rows = []
        lp_v = jax.jit(jax.vmap(lp, in_axes=(None, 0)))
        for rho in rhos:
            lp_rows.append(np.asarray(
                lp_v(jnp.asarray(rho), jnp.asarray(nus))))
        Lp = np.stack(lp_rows)  # (grid_rho, grid_nu)
        i, j = np.unravel_index(np.nanargmax(Lp), Lp.shape)
        out = {
            "rhos": rhos, "nus": nus, "Lp": Lp,
            "max_lp": float(Lp[i, j]),
            "optimal_rho": float(rhos[i]),
            "optimal_nu": float(nus[j]),
        }
        if verbose:
            print(f"grid optimum: Lp={out['max_lp']:.3f} at "
                  f"rho={out['optimal_rho']:.4f} nu={out['optimal_nu']:.3f}")

        if run_de:
            res = differential_evolution(
                objective, jnp.asarray([[0.1, 0.3], [1.0, 25.0]]),
                key=31, popsize=24, max_generations=40, tol=1e-5)
            out["de_rho"] = float(res.x[0])
            out["de_nu"] = float(res.x[1])
            out["de_lp"] = -float(res.fun)
            out["de_generations"] = int(res.num_generations)
            if verbose:
                print(f"DE optimum: Lp={out['de_lp']:.3f} at "
                      f"rho={out['de_rho']:.4f} nu={out['de_nu']:.3f} "
                      f"({out['de_generations']} generations)")
        return out

    return checkpoint.run_or_resume(results_path, compute,
                                    use_saved=use_saved, verbose=verbose)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-points", type=int, default=30)
    p.add_argument("--noise", type=float, default=0.05)
    p.add_argument("--with-prior", action="store_true")
    p.add_argument("--use-saved", action="store_true")
    a = p.parse_args()
    main(a.num_points, a.noise, a.with_prior, use_saved=a.use_saved)
