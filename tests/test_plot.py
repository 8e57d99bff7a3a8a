"""Headless smoke tests for the plotting utilities (reference components
#5 matrix plot, #9 likelihood surface, #10 der1 plot with bounds and
asymptotes — SURVEY §2). Matplotlib runs on the agg backend; each test
checks a file is actually produced."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

import gppe_tpu  # noqa: E402
from gppe_tpu.models import direct_likelihood as dl  # noqa: E402
from gppe_tpu.models.mixed_correlation import MixedCorrelation  # noqa: E402
from gppe_tpu.utils import data as data_utils  # noqa: E402
from gppe_tpu.utils import plot as plot_utils  # noqa: E402


@pytest.fixture(scope="module")
def small_problem():
    pts = data_utils.generate_points(8, dimension=2)   # n = 64
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 1)
    K = gppe_tpu.generate_correlation(pts, 0.15, nu=0.5)
    return pts, z, X, K


def test_plot_matrix(tmp_path, small_problem, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _, _, _, K = small_problem
    plot_utils.plot_matrix(np.asarray(K), filename="mat_test")
    assert os.path.isfile("mat_test.svg")


def test_plot_der1_eta(tmp_path, small_problem, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _, z, X, K = small_problem
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)
    plot_utils.plot_log_likelihood_der1_eta(
        data, np.asarray(K, dtype=np.float64), np.asarray(X),
        np.asarray(z), optimal_eta=5.0, filename="der1_test")
    assert os.path.isfile("der1_test.svg")


def test_plot_contour_grid(tmp_path, monkeypatch):
    """Smoothed + cubic-upsampled contour (reference
    FindOptimalCovarianceParameters.py:475-626)."""
    monkeypatch.chdir(tmp_path)
    x = np.linspace(0.1, 0.3, 8)
    y = np.linspace(1.0, 25.0, 10)
    Xg, Yg = np.meshgrid(x, y, indexing="ij")
    Z = -((Xg - 0.2) ** 2 + ((Yg - 10.0) / 50.0) ** 2)
    Zf = plot_utils.plot_contour_grid(x, y, Z, "rho", "nu",
                                      optimum=(0.2, 10.0),
                                      filename="contour_test")
    assert os.path.isfile("contour_test.svg")
    # upsampled surface is finer and preserves the maximum location
    assert Zf.shape[0] >= 4 * len(x) and Zf.shape[1] >= 4 * len(y)
    i, j = np.unravel_index(np.argmax(Zf), Zf.shape)
    assert abs(np.linspace(x[0], x[-1], Zf.shape[0])[i] - 0.2) < 0.03
    assert abs(np.linspace(y[0], y[-1], Zf.shape[1])[j] - 10.0) < 3.0


def test_plot_likelihood_surface(tmp_path, small_problem, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _, z, X, K = small_problem
    Km = MixedCorrelation(K)
    data = dl.make_spectral_data(Km, X, z)

    def lp(sigma, sigma0):
        return float(dl.log_likelihood(data, sigma, sigma0))

    plot_utils.plot_likelihood_surface(
        lp, np.linspace(0.05, 0.3, 6), np.linspace(0.05, 0.3, 6),
        "sigma", "sigma0", filename="surf_test")
    assert os.path.isfile("surf_test.svg")
