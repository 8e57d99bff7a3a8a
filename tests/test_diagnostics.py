"""Diagnostics sanity: R-hat ~ 1 and ESS ~ S*C for iid chains; R-hat
large for disjoint chains; ESS collapses under strong autocorrelation."""

import numpy as np

from gppe_tpu.models.diagnostics import (effective_sample_size,
                                         split_rhat, summarize)


def test_iid_chains():
    rng = np.random.RandomState(0)
    s = rng.standard_normal((500, 4, 2))
    rhat = split_rhat(s)
    ess = effective_sample_size(s)
    assert np.all(np.abs(rhat - 1.0) < 0.05)
    assert np.all(ess > 0.5 * 500 * 4)


def test_disjoint_chains_flagged():
    rng = np.random.RandomState(1)
    s = rng.standard_normal((300, 4, 1)) * 0.1
    s[:, 0, 0] += 5.0                       # one chain far away
    assert split_rhat(s)[0] > 1.5


def test_autocorrelated_ess_small():
    rng = np.random.RandomState(2)
    S, C = 800, 4
    x = np.zeros((S, C))
    e = rng.standard_normal((S, C))
    for t in range(1, S):
        x[t] = 0.97 * x[t - 1] + e[t]       # AR(1), tau ~ 65
    ess = effective_sample_size(x[:, :, None])
    assert ess[0] < 0.15 * S * C


def test_summarize_shape():
    rng = np.random.RandomState(3)
    s = rng.standard_normal((200, 4, 3))
    out = summarize(s, names=["a", "b", "c"])
    assert set(out) >= {"a", "b", "c", "num_samples", "num_chains"}
    assert abs(out["a"]["mean"]) < 0.2
    assert out["b"]["ess"] > 100
