"""Phase-split profile of the grid-batched Krylov chunk setup at n=100k
(VERDICT r4 item 5: amortization measured 1.9x, design claim ~5x — find
where the chunk time actually goes).

Phases isolated by running progressively larger subsets of the chunk
program as standalone jitted chains (steady state inside one program —
independent dispatches overlap on the tunneled backend and under-read):

  matvec    — k multirho Pallas matvecs alone (the design-claim cost)
  lanczos   — full Lanczos (matvec + 3-term recurrence + reorth) on the
              same block, reorthogonalize on/off
  full      — _factorize_chunk_matrixfree (adds tk2 pass, f64-accumulated
              U/G/P projections, host transfer)

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

    # --- phase 1: k multirho matvecs alone (dependent chain) -----------
    @functools.partial(jax.jit, static_argnames=("steps",))
    def matvec_chain(pts_d, rhos_d, W, steps):
        def body(i, W):
            Wn = pallas_kernels.matern_matmat_multirho(pts_d, rhos_d, W,
                                                       0.5)
            nrm = jnp.sqrt(jnp.sum(Wn * Wn, axis=1, keepdims=True))
            return Wn / jnp.maximum(nrm, 1e-30)
        return jax.lax.fori_loop(0, steps, body, W)

    W0 = jnp.transpose(jnp.tile(AB[:, None, :], (1, B, 1)),
                       (1, 0, 2))                   # (B, n, C)
    timed("matvec_only_k_steps", matvec_chain, pts_d, rhos_d, W0, k)

    # --- phase 2: full batched Lanczos, reorth on/off -------------------
    def mv_flat(Q):
        Qb = jnp.transpose(Q.reshape(n, B, C), (1, 0, 2))
        Wb = pallas_kernels.matern_matmat_multirho(pts_d, rhos_d, Qb, 0.5)
        return jnp.transpose(Wb.astype(Q.dtype),
                             (1, 0, 2)).reshape(n, B * C)

    flat0 = jnp.tile(AB[:, None, :], (1, B, 1)).reshape(n, B * C)
    for reo in (True, False):
        f = functools.partial(stochastic.lanczos, mv_flat, flat0, k,
                              reorthogonalize=reo)
        timed(f"lanczos_reorth_{reo}", lambda f=f: f())

    # --- phase 3: the full chunk factorization --------------------------
    def full():
        r = _factorize_chunk_matrixfree(
            pts_d, rhos_d, jnp.asarray(nus, dtype), AB, k, s, 0.5, True,
            512)
        return [np.asarray(x) for x in r]           # include host pull

    timed("full_factorize_chunk", full)
    out["s_per_point_full"] = round(out["full_factorize_chunk"] / B, 3)
    out["derived"] = {
        "reorth_cost": round(out["lanczos_reorth_True"]
                             - out["lanczos_reorth_False"], 3),
        "recurrence_cost": round(out["lanczos_reorth_False"]
                                 - out["matvec_only_k_steps"], 3),
        "projection_and_transfer": round(out["full_factorize_chunk"]
                                         - out["lanczos_reorth_True"], 3),
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
