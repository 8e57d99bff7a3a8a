"""Driver smoke tests at reduced sizes (the reference's de-facto
integration testing style, SURVEY.md §4) + GCV + global optimizer."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")  # drivers/ is not a package


def test_maximize_likelihood_driver(tmp_path):
    from drivers import maximize_likelihood_direct_method as drv
    res = drv.main(num_points=15, verbose=False)  # n=225: eta identifiable
    assert 0.1 < res["direct"]["sigma0"] < 0.35
    np.testing.assert_allclose(res["direct"]["eta"],
                               res["profiled"]["eta"], rtol=5e-2)


def test_plot_matern_kernel_driver():
    from drivers import plot_matern_kernel as drv
    err = drv.main(test=True)
    assert err < 0.02  # nu=25 close to Gaussian (reference :93-96)


def test_noise_level_driver(tmp_path):
    from drivers import compare_various_noise_level as drv
    res = drv.main(num_points=10, num_levels=12,
                   results_path=str(tmp_path / "noise.pickle"),
                   verbose=False)
    for fam in ("poly0", "poly2trig"):
        r = res[fam]
        # at high noise the estimated sigma0 tracks the injected noise
        ratio = r["sigma0"][-4:] / r["noise_levels"][-4:]
        assert 0.7 < np.nanmean(ratio) < 1.3
        # GCV agrees on the noise scale at high noise
        gratio = r["gcv_sigma0"][-4:] / r["noise_levels"][-4:]
        assert 0.6 < np.nanmean(gratio) < 1.4


def test_num_points_driver(tmp_path):
    from drivers import compare_various_num_points as drv
    res = drv.main(dense_sides=(15, 20), krylov_ns=(512,),
                   results_path=str(tmp_path / "np.pickle"), verbose=False)
    assert len(res["dense"]) == 2
    for r in res["dense"]:
        # cross-method oracle on the robust parameter
        np.testing.assert_allclose(r["derivative"]["sigma0"],
                                   r["direct"]["sigma0"], rtol=1e-2)
    assert res["krylov"][0]["success"]


def test_find_optimal_covariance_driver(tmp_path):
    from drivers import find_optimal_covariance as drv
    res = drv.main(num_points=10, noise=0.05, grid_rho=5, grid_nu=4,
                   results_path=str(tmp_path / "oc.pickle"),
                   verbose=False, run_de=False)
    assert np.isfinite(res["max_lp"])
    assert 0.1 <= res["optimal_rho"] <= 0.3


def test_find_optimal_covariance_four_param_consistency(tmp_path):
    """The 4-param direct objective evaluated at the profiled optimum
    (sigma(eta*), sigma0(eta*)) must reproduce the 2-param profiled lp —
    the reference's own cross-mode oracle (FindOptimalCovarianceParameters
    2- vs 4-param modes)."""
    from drivers import find_optimal_covariance as drv
    from gppe_tpu.models import direct_likelihood as dl
    from gppe_tpu.models import profile_likelihood as pl
    from gppe_tpu.models.mixed_correlation import MixedCorrelation
    from gppe_tpu.utils import data as data_utils

    import gppe_tpu

    pts = data_utils.generate_points(10, dimension=2)
    z = data_utils.generate_data(pts, 0.1)
    X = data_utils.generate_basis_functions(pts, 2)
    lp, objective = drv.build_objective(pts, z, X, with_prior=False)

    rho, nu = 0.15, 1.5
    K = gppe_tpu.generate_correlation(pts, rho, nu=nu)
    sd = dl.make_spectral_data(MixedCorrelation(K, method="eigenvalue"),
                               X, z)
    r = pl.find_log_likelihood_der1_zeros(sd, [1e-4, 1e3])

    lp2 = float(lp(rho, nu))
    lp4 = float(objective.lp4(rho, nu, r["sigma"], max(r["sigma0"],
                                                       1e-12)))
    # lp() omits the (n-m)/2 log(2pi) constant (legacy-surface parity);
    # lp4 is the full direct likelihood
    n, m = X.shape
    const = 0.5 * (n - m) * np.log(2.0 * np.pi)
    # lp() maximizes eta by grid+golden search, so it sits at most ~1e-2
    # below the exact profiled optimum that lp4 is evaluated at
    np.testing.assert_allclose(lp4 + const, lp2, atol=2e-2)
    assert lp4 + const >= lp2 - 1e-6

    # uniform support enforcement of the 4-param posterior
    neg = float(objective.four_param(np.array([rho, 26.0, 0.1, 0.1])))
    assert neg == np.inf


def test_scaling_efficiency_driver():
    from drivers import scaling_efficiency as drv
    res = drv.main(n=256, device_counts=[1, 2], verbose=False)
    assert set(res) == {1, 2, "grade", "platform"}
    assert res[2]["seconds"] > 0
    # virtual CPU mesh timings must be stamped correctness-grade
    # (VERDICT r2 item 9)
    assert res["grade"] == "correctness"


def test_gcv_recovers_noise():
    from gppe_tpu.models import direct_likelihood as dl
    from gppe_tpu.models import gcv
    from gppe_tpu.models.mixed_correlation import MixedCorrelation
    from gppe_tpu.ops import assembly
    from gppe_tpu.utils import data as data_utils

    pts = data_utils.generate_points(15, dimension=2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    K = assembly.dense_correlation(pts, 0.1, 0.5)
    data = dl.make_spectral_data(MixedCorrelation(K), X, z)
    res = gcv.minimize_gcv(data)
    assert 0.1 < res["sigma0"] < 0.3   # injected noise 0.2


def test_differential_evolution_quadratic():
    import jax.numpy as jnp

    from gppe_tpu.ops.global_opt import differential_evolution

    target = jnp.asarray([0.3, -1.2])

    def obj(x):
        return jnp.sum((x - target) ** 2)

    res = differential_evolution(obj, jnp.asarray([[-2.0, 2.0],
                                                   [-2.0, 2.0]]),
                                 key=0, popsize=30, max_generations=150)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(target),
                               atol=1e-3)


def test_minimize_terminator():
    from gppe_tpu.ops.global_opt import MinimizeTerminator
    mt = MinimizeTerminator(atol=1e-3, patience=2)
    mt([1.0, 1.0])
    mt([1.0001, 1.0])
    with pytest.raises(MinimizeTerminator.Terminated):
        mt([1.0001, 1.0])


def test_sample_posterior_driver(tmp_path):
    from drivers import sample_posterior as drv
    res = drv.main(num_points=8, num_chains=2, num_samples=50,
                   num_warmup=80, use_mesh=False,
                   results_path=str(tmp_path / "post.pickle"),
                   verbose=False)
    assert res["samples"].shape == (50, 2, 2)
    assert np.isfinite(res["posterior_mean_log10_eta"])


def test_docs_and_packaging_infra():
    """The docs/packaging layer (reference docs/conf.py, conda/meta.yaml,
    tox.ini — SURVEY §2 #26): conf.py parses and points at real sources,
    the toctree entries exist, and the conda recipe names the package.
    (sphinx itself is not in the benchmark image; CI's docs job runs the
    actual build.)"""
    import ast
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = os.path.join(root, "docs", "conf.py")
    tree = ast.parse(open(conf).read())          # syntax-valid
    names = {t.targets[0].id for t in tree.body
             if isinstance(t, ast.Assign)
             and isinstance(t.targets[0], ast.Name)}
    assert {"project", "extensions", "source_suffix",
            "master_doc"} <= names

    index = open(os.path.join(root, "docs", "index.md")).read()
    for entry in re.findall(r"^(QUICKSTART|API|ARCHITECTURE)$", index,
                            re.M):
        assert os.path.exists(os.path.join(root, "docs", entry + ".md"))

    meta = open(os.path.join(root, "conda", "meta.yaml")).read()
    assert "name: gppe-tpu" in meta and "jax" in meta
    tox = open(os.path.join(root, "tox.ini")).read()
    assert "docs" in tox and "pytest" in tox
