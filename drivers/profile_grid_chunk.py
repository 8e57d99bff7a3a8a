"""Phase-split profile of the grid-batched Krylov chunk setup at n=100k
(VERDICT r4 item 5: amortization measured 1.9x, design claim ~5x — find
where the chunk time actually goes).

Phases isolated by running VARIANTS of the full Lanczos program and
differencing (measured finding: on the tunneled backend,
block_until_ready on small standalone programs returns early — a bare
40-matvec chain "timed" at 0.000 s while the same matvecs inside the
Lanczos program cost ~29 s — so only wall times of big programs and
DELTAS between program variants are trustworthy):

  lanczos(ps, reorth) — the batched factorization program with
      precise_sums / reorthogonalization toggled; deltas isolate the
      f64-emulated coefficient sums and the reorth basis traffic
  full — _factorize_chunk_matrixfree (adds the tk2 pass,
      f64-accumulated U/G/P projections, host transfer)

Measured r5 (n=100k, B=8, k=40, C=16): lanczos 28.8-29.0 s of the
~30-31 s total; reorth delta 0.22 s, precise-sums delta ~0.01 s,
projections+transfer ~1.1 s. The dominant cost is the multirho matvec
itself at ~0.72 s/step — 128-lane-padded MXU dots (16 real columns per
node), see ARCHITECTURE "Grid-chunk economics".

Writes data/grid_chunk_profile.json.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np


def main(n=100_000, num_points=8, k=40, num_probes=8,
         out_path="data/grid_chunk_profile.json", verbose=True):
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    import jax
    import jax.numpy as jnp

    from gppe_tpu.models.grid_krylov import _factorize_chunk_matrixfree
    from gppe_tpu.ops import pallas_kernels, stochastic
    from gppe_tpu.utils import data as data_utils

    rng = np.random.RandomState(7)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    rhos = np.linspace(0.05, 0.3, num_points)
    nus = np.full(num_points, 0.5)

    dtype = jnp.float32
    pts_d = jnp.asarray(pts, dtype)
    rhos_d = jnp.asarray(rhos, dtype)
    A = np.concatenate([z[:, None], X], axis=1)
    s = A.shape[1]
    probes = np.asarray(rng.choice([-1.0, 1.0], size=(n, num_probes)),
                        np.float32)
    v_defl = np.asarray(rng.standard_normal((n, 1)), np.float32)
    AB = jnp.asarray(np.concatenate([A, v_defl, probes], axis=1), dtype)
    C = AB.shape[1]
    B = num_points
    out = {"n": n, "B": B, "k": k, "C": int(C)}

    def timed(label, fn, *args, reps=1):
        jax.block_until_ready(fn(*args))           # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        out[label] = round(dt, 3)
        if verbose:
            print(f"{label}: {dt:.3f}s")
        return dt

    # --- Lanczos program variants (deltas isolate components) -----------
    def mv_flat(Q):
        Qb = jnp.transpose(Q.reshape(n, B, C), (1, 0, 2))
        Wb = pallas_kernels.matern_matmat_multirho(pts_d, rhos_d, Qb, 0.5)
        return jnp.transpose(Wb.astype(Q.dtype),
                             (1, 0, 2)).reshape(n, B * C)

    flat0 = jnp.tile(AB[:, None, :], (1, B, 1)).reshape(n, B * C)
    for ps in (True, False):
        for reo in (True, False):
            f = functools.partial(stochastic.lanczos, mv_flat, flat0, k,
                                  reorthogonalize=reo, precise_sums=ps)
            timed(f"lanczos_ps_{ps}_reorth_{reo}", lambda f=f: f())

    # --- the full chunk factorization -----------------------------------
    def full():
        r = _factorize_chunk_matrixfree(
            pts_d, rhos_d, jnp.asarray(nus, dtype), AB, k, s, 0.5, True,
            512)
        return [np.asarray(x) for x in r]           # include host pull

    timed("full_factorize_chunk", full)
    out["s_per_point_full"] = round(out["full_factorize_chunk"] / B, 3)
    base = out["lanczos_ps_True_reorth_True"]
    out["derived"] = {
        "reorth_cost": round(base - out["lanczos_ps_True_reorth_False"],
                             3),
        "precise_sums_cost": round(base
                                   - out["lanczos_ps_False_reorth_True"],
                                   3),
        "matvec_plus_recurrence_per_step": round(
            out["lanczos_ps_False_reorth_False"] / k, 3),
        "projection_and_transfer": round(out["full_factorize_chunk"]
                                         - base, 3),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    if verbose:
        print(json.dumps(out["derived"]))
        print(f"wrote {out_path}")
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--points", type=int, default=8)
    p.add_argument("--k", type=int, default=40)
    a = p.parse_args()
    main(n=a.n, num_points=a.points, k=a.k)
