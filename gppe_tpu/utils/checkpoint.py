"""Result artifacts and resumable state.

The reference's discipline (SURVEY.md §5.4): every long driver pickles a
results dict and can resume into plotting/analysis without recompute
(reference: examples/CompareVariousNumberOfPoints.py:605-641,
FindOptimalCovarianceParameters.py:714-754). Same discipline here, plus
chain-state checkpointing for HMC runs.
"""

import os
import pickle

import numpy as np


def save_results(results, path, verbose=False):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(results, f)
    if verbose:
        print(f"saved results to {path}")


def load_results(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def results_exist(path):
    return os.path.isfile(path)


def run_or_resume(path, compute_fn, use_saved=True, verbose=False):
    """The reference's UseSavedResults pattern: load the artifact when
    present, else compute and save."""
    if use_saved and results_exist(path):
        if verbose:
            print(f"resuming from {path}")
        return load_results(path)
    results = compute_fn()
    save_results(results, path, verbose=verbose)
    return results


def save_hmc_state(result, path, verbose=False):
    """Persist the full HMC chain state — (theta, PRNG key, step size,
    inverse mass) — so a follow-up run continues sampling EXACTLY where
    this one stopped (models.hmc.resume_hmc / sample_posterior's
    ``resume_state``)."""
    state = {k: np.asarray(v) for k, v in result.state().items()}
    state["accept_rate"] = np.asarray(result.accept_rate)
    save_results(state, path, verbose=verbose)


def load_hmc_state(path):
    """Load a state saved by :func:`save_hmc_state`; pass it as
    ``resume_state`` to models.hmc.sample_posterior (or to
    models.hmc.resume_hmc with the same log-prob closure)."""
    return load_results(path)
