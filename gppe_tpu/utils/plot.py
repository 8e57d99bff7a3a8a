"""Plotting utilities (headless-safe).

Covers the reference's plotting surface: matrix spy/matshow
(generate_correlation.py:229-281), the 3-D likelihood surfaces
(_direct_likelihood.py:411-450, _profile_likelihood.py:421-450), and the
publication derivative plot with bounds, asymptotes, optimum marker and
the zoomed inset around the root (_profile_likelihood.py:548-732). All
functions degrade to saving SVG when no display is available
(plot_utilities.py:104-143).
"""

import numpy as np

from . import display


def _get_plt():
    import matplotlib
    if not display.has_display():
        matplotlib.use("agg")
    import matplotlib.pyplot as plt
    return plt


def save_plot(plt, filename, pdf=False, verbose=False):
    """Save SVG (and optionally PDF) next to the CWD (reference
    plot_utilities.py:104-143)."""
    plt.savefig(filename + ".svg", bbox_inches="tight")
    if pdf:
        plt.savefig(filename + ".pdf", bbox_inches="tight")
    if verbose:
        print(f"saved {filename}.svg")


def plot_matrix(matrix, sparse=False, verbose=False, filename="matrix"):
    """Spy plot for sparse, matshow for dense (reference
    generate_correlation.py:229-281)."""
    plt = _get_plt()
    fig, ax = plt.subplots()
    try:
        import scipy.sparse
        is_sp = scipy.sparse.issparse(matrix)
    except ImportError:
        is_sp = False
    if is_sp:
        ax.spy(matrix, markersize=0.5)
    else:
        im = ax.matshow(np.asarray(matrix))
        fig.colorbar(im, ax=ax)
    ax.set_title("Correlation matrix")
    if display.has_display():
        plt.show()
    else:
        save_plot(plt, filename, verbose=verbose)
    plt.close(fig)


def plot_likelihood_surface(lp_fn, x_vals, y_vals, xlabel, ylabel,
                            optimum=None, filename="log_likelihood"):
    """2-D surface of a likelihood over a parameter grid (role of
    reference _direct_likelihood.plot_log_likelihood:411-450)."""
    plt = _get_plt()
    Z = np.asarray([[float(lp_fn(x, y)) for x in x_vals] for y in y_vals])
    X, Y = np.meshgrid(x_vals, y_vals)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    p = ax.plot_surface(X, Y, Z, linewidth=0, antialiased=False)
    fig.colorbar(p, ax=ax)
    if optimum is not None:
        ax.scatter([optimum[0]], [optimum[1]], [optimum[2]], color="red")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title("Log likelihood")
    if display.has_display():
        plt.show()
    else:
        save_plot(plt, filename)
    plt.close(fig)
    return Z


def plot_contour_grid(x_vals, y_vals, Z, xlabel, ylabel, optimum=None,
                      smooth_sigma=1.0, upsample=4,
                      filename="parameter_contour", title=None):
    """Filled contour of a (rho, nu)-style parameter grid with Gaussian
    smoothing and cubic spline upsampling (reference
    FindOptimalCovarianceParameters.py:475-626: gaussian_filter +
    RectBivariateSpline refinement before contouring).

    Z is (len(x_vals), len(y_vals)); returns the refined surface.
    """
    from scipy.interpolate import RectBivariateSpline
    from scipy.ndimage import gaussian_filter

    plt = _get_plt()
    Z = np.asarray(Z, dtype=float)
    Zs = gaussian_filter(Z, sigma=smooth_sigma) if smooth_sigma else Z
    x = np.asarray(x_vals, dtype=float)
    y = np.asarray(y_vals, dtype=float)
    if upsample and upsample > 1 and len(x) > 3 and len(y) > 3:
        spl = RectBivariateSpline(x, y, Zs, kx=3, ky=3)
        x_f = np.linspace(x[0], x[-1], len(x) * upsample)
        y_f = np.linspace(y[0], y[-1], len(y) * upsample)
        Zf = spl(x_f, y_f)
    else:
        x_f, y_f, Zf = x, y, Zs

    fig, ax = plt.subplots()
    Xg, Yg = np.meshgrid(x_f, y_f, indexing="ij")
    cs = ax.contourf(Xg, Yg, Zf, levels=30)
    ax.contour(Xg, Yg, Zf, levels=10, colors="black", linewidths=0.4)
    fig.colorbar(cs, ax=ax)
    if optimum is not None:
        ax.plot([optimum[0]], [optimum[1]], "o", color="red",
                markersize=6, label="optimum")
        ax.legend(frameon=False)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)
    if display.has_display():
        plt.show()
    else:
        save_plot(plt, filename)
    plt.close(fig)
    return Zf


def plot_log_likelihood_der1_eta(data, K, X, z, optimal_eta=None,
                                 filename="log_likelihood_first_derivative"):
    """d lp/d eta vs eta with analytic bounds, large-eta asymptotes, and
    a zoomed inset around the root (reference
    _profile_likelihood.py:548-732)."""
    import jax.numpy as jnp

    from ..models import profile_likelihood as pl_mod

    plt = _get_plt()
    eta = np.logspace(-3, 3, 100)
    der1 = np.asarray(pl_mod.log_likelihood_der1_eta(
        data, jnp.log10(jnp.asarray(eta))))
    ub, lb = [], []
    for e in eta:
        u, l = pl_mod.compute_bounds_der1_eta(data, e)
        ub.append(float(u))
        lb.append(float(l))
    x_asym = np.logspace(1, 3, 50)
    asym1, asym2, roots1, roots2 = pl_mod.compute_asymptote_der1_eta(
        K, X, z, x_asym)

    fig, ax = plt.subplots()
    ax.semilogx(eta, ub, "--", color="black", label="Upper bound")
    ax.semilogx(eta, lb, "-.", color="black", label="Lower bound")
    ax.semilogx(eta, der1, color="black", label="Exact")
    ax.semilogx(x_asym, asym1, color="chocolate",
                label="1st order asymptote")
    ax.semilogx(x_asym, asym2, color="olivedrab",
                label="2nd order asymptote")
    if optimal_eta is not None and np.isfinite(optimal_eta) \
            and optimal_eta > 0:
        ax.semilogx([optimal_eta], [0.0], "o", color="black",
                    label=rf"root $\hat\eta = {optimal_eta:.3g}$")
    lim = max(10.0, np.abs(der1[np.isfinite(der1)]).max() * 0.1)
    ax.set_ylim([-lim, lim])
    ax.set_xlabel(r"$\eta$")
    ax.set_ylabel(r"$d\ell/d\eta$")
    ax.grid(True)
    ax.legend(frameon=False, fontsize="small")

    # zoomed inset around the root (reference's inset_axes block)
    if optimal_eta is not None and np.isfinite(optimal_eta) \
            and optimal_eta > 0:
        try:
            axins = ax.inset_axes([0.12, 0.12, 0.4, 0.3])
            e_in = np.logspace(np.log10(optimal_eta) - 0.5,
                               np.log10(optimal_eta) + 0.5, 60)
            d_in = np.asarray(pl_mod.log_likelihood_der1_eta(
                data, jnp.log10(jnp.asarray(e_in))))
            axins.semilogx(e_in, d_in, color="black")
            axins.axhline(0.0, lw=0.5, color="gray")
            axins.plot([optimal_eta], [0.0], "o", color="black",
                       markersize=3)
            axins.tick_params(labelsize="x-small")
            ax.indicate_inset_zoom(axins, edgecolor="gray")
        except Exception:
            pass  # inset is decoration; never fail the plot over it
    if display.has_display():
        plt.show()
    else:
        save_plot(plt, filename)
    plt.close(fig)


def plot_likelihood_result(likelihood, z, results):
    """Dispatcher used by Likelihood.maximize_log_likelihood(plot=True)."""
    from ..models import direct_likelihood as dl

    data = dl.make_spectral_data(likelihood.K_mixed, likelihood.X, z)
    if likelihood.likelihood_method == "direct":
        sig, sig0 = results["sigma"], results["sigma0"]
        lp_fn = lambda s, s0: dl.log_likelihood(data, s, s0)  # noqa: E731
        plot_likelihood_surface(
            lp_fn, np.linspace(max(sig * 0.2, 1e-4), sig * 2, 15),
            np.linspace(max(sig0 * 0.5, 1e-4), sig0 * 1.5, 15),
            r"$\sigma$", r"$\sigma_0$",
            optimum=(sig, sig0, results.get("max_lp", 0.0)))
    else:
        plot_log_likelihood_der1_eta(
            data, np.asarray(likelihood.K), np.asarray(likelihood.X),
            np.asarray(z), optimal_eta=results.get("eta"))
