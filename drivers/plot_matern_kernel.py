"""Matern kernel family plot (reference examples/plot_matern_kernel.py:
27-149): k(r; nu) for nu in {0.1, 0.5, 1, 3.2, 25, inf}, showing the
convergence to the Gaussian kernel for large nu."""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse

import numpy as np


def main(test=False, filename="matern_kernel"):
    import jax.numpy as jnp

    from gppe_tpu.ops import kernels
    from gppe_tpu.utils import plot as plot_utils

    plt = plot_utils._get_plt()
    x = np.linspace(0, 4, 400)
    fig, ax = plt.subplots()
    for nu, style in [(0.1, "-"), (0.5, "-"), (1.0, "-"), (3.2, "-"),
                      (25.0, "--"), (1000.0, ":")]:
        k = np.asarray(kernels.matern(jnp.asarray(x), float(nu)))
        label = r"$\nu=\infty$" if nu >= 100 else rf"$\nu={nu}$"
        ax.plot(x, k, style, label=label)
    ax.set_xlabel(r"$r/\rho$")
    ax.set_ylabel(r"$k(r)$")
    ax.set_title("Matern correlation family")
    ax.legend(frameon=False)
    if not test:
        from gppe_tpu.utils import display
        if display.has_display():
            plt.show()
        else:
            plot_utils.save_plot(plt, filename)
    plt.close(fig)

    # the convergence claim of the reference (:93-96): nu=25 is close to
    # Gaussian
    k25 = np.asarray(kernels.matern(jnp.asarray(x), 25.0))
    kinf = np.exp(-0.5 * x ** 2)
    return float(np.abs(k25 - kinf).max())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--test", action="store_true")
    a = p.parse_args()
    err = main(test=a.test)
    print(f"max |k_25 - k_gauss| = {err:.4f}")
