"""On-chip (tile x dot_mode) measurement for the fused Matern matvec.

Produces the data behind pallas_kernels.DEFAULT_TILE / DEFAULT_DOT_MODE
(VERDICT r2 item 1: the r2 defaults shipped an 8x regression of the
flagship N=100k Krylov setup because the (tile=1024, bf16x3,
dimension_semantics) config triggers a pathological XLA compile of the
reorthogonalized-Lanczos loop; this driver measures what actually
matters — the cold full-constructor time, its warm-cache rerun, and the
honest steady-state matvec inside a jitted dependent chain).

Methodology notes:
* Steady-state is measured as a DEPENDENT chain inside one jitted
  fori_loop. Timing independent repeated calls on the tunneled backend
  under-reads ~7x (identical dispatches overlap); chained timing is the
  number Lanczos actually pays.
* Each config runs in its own subprocess with its own fresh compilation
  cache, so "cold" includes the full XLA+Mosaic compile the BENCH driver
  pays on a fresh machine.

Usage:
  python drivers/profile_pallas_matrix.py            # run the matrix
  python drivers/profile_pallas_matrix.py one TILE MODE CACHE_DIR
"""

import functools
import json
import os
import shutil
import subprocess
import sys
import time

CONFIGS = [(512, "highest"), (512, "bf16x3"), (512, "bf16"),
           (1024, "highest"), (1024, "bf16x3"), (1024, "bf16")]


def run_one(tile, mode, cache_dir):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gppe_tpu.utils import config as cfg
    cfg.setup(cache_dir=cache_dir)
    from gppe_tpu.ops import operators, pallas_kernels as pk
    from gppe_tpu.models.large_scale import KrylovProfileLikelihood
    from gppe_tpu.utils import data as data_utils

    pk.DEFAULT_TILE = tile
    pk.DEFAULT_DOT_MODE = mode

    n = 100_000
    rng = np.random.RandomState(7)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    op = operators.MaternOperator(pts, 0.1, nu=0.5)

    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=64, num_probes=16)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    eng = KrylovProfileLikelihood(op, X, z, lanczos_steps=64, num_probes=16)
    warm = time.perf_counter() - t0

    # honest steady-state matvec: dependent chain, r = 23 (the merged
    # Lanczos block width), one jitted loop
    V = jnp.asarray(rng.standard_normal((n, 23)), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(V, k):
        def body(j, V):
            W = op.matmat(V)
            return W / jnp.linalg.norm(W, axis=0)
        return jax.lax.fori_loop(0, k, body, V)

    out = chain(V, 4)
    jax.block_until_ready(out)
    reps = 30
    t0 = time.perf_counter()
    out = chain(V, reps)
    jax.block_until_ready(out)
    per_mv = (time.perf_counter() - t0) / reps

    # correctness cross-check vs the exact XLA path at small n
    kp = operators.MaternOperator(pts[:4096], 0.1, nu=0.5, use_pallas=True)
    kx = operators.MaternOperator(pts[:4096], 0.1, nu=0.5, use_pallas=False)
    v = jnp.asarray(rng.standard_normal((4096, 4)), jnp.float32)
    rel = float(jnp.linalg.norm(kp.matmat(v) - kx.matmat(v))
                / jnp.linalg.norm(kx.matmat(v)))

    print(json.dumps({
        "tile": tile, "mode": mode,
        "constructor_cold_s": round(cold, 2),
        "constructor_warm_s": round(warm, 2),
        "matvec_ms_chain_r23": round(per_mv * 1000, 1),
        "rel_err_vs_xla": float(f"{rel:.2e}"),
        "eta_dbg": float(eng.der1(1.0)),
    }), flush=True)


def main():
    results = []
    for tile, mode in CONFIGS:
        cache = f"/tmp/gppe_profcache_{tile}_{mode}"
        shutil.rmtree(cache, ignore_errors=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", str(tile),
             mode, cache],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            results.append(json.loads(line[-1]))
            print(line[-1], flush=True)
        else:
            print(json.dumps({"tile": tile, "mode": mode, "error":
                              proc.stderr[-500:]}), flush=True)
    with open("pallas_matrix.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        run_one(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
