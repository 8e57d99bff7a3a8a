"""Roofline sweep for the fused Matern matvec (VERDICT r4 item 7).

Question: the bench reports 25.4 TFLOP/s = 51.6% of the 49.2 TFLOP/s
f32 MXU peak at the headline config (n = 100k, r = 23 padded to 128) —
is the other half lost, or is the kernel limited by a different unit?

Decomposition at tile 512, r_pad = 128, n_pad = 100352:
* MXU: 2 n^2 r_pad = 2.58 TFLOP per matvec;
* VPU: one fused distance(d=2) + sqrt + exp per n^2 element — work the
  MXU-FLOP metric cannot see.

The sweep varies r_pad (more MXU work per distance tile — if the VPU is
the floor, seconds barely move and the metric's TFLOP/s RISES), the
dot precision (highest = 6 bf16 MXU passes, bf16x3 = 3 — if the MXU is
the floor, bf16x3 halves the time), and dist_mode (gram moves the
per-element distance work onto the MXU — if the VPU is the floor, THIS
is the lever that moves wall time). Steady state measured inside one
jitted dependent chain (independent dispatches overlap on the tunneled
backend and under-read ~7x).

Writes data/roofline_matvec.json; summarized in docs/ARCHITECTURE.md.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np

V5E_F32_PEAK_TFLOPS = 49.2


def main(n=100_000, out_path="data/roofline_matvec.json", verbose=True):
    from gppe_tpu.utils import config as cfg
    cfg.setup()

    import jax
    import jax.numpy as jnp

    from gppe_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(3)
    pts = rng.rand(n, 2).astype(np.float32)
    n_pad = -(-n // pk.DEFAULT_TILE) * pk.DEFAULT_TILE

    rows = []
    for r in (23, 151, 279):
        r_pad = max(128, -(-r // 128) * 128)
        V = jnp.asarray(rng.standard_normal((n, r)), jnp.float32)
        for dist_mode in ("diff", "gram"):
            for dot_mode in ("highest", "bf16x3"):
                @functools.partial(jax.jit, static_argnames=("k",))
                def chain(V, k, dist_mode=dist_mode, dot_mode=dot_mode):
                    def body(j, V):
                        W = pk.matern_matmat(pts, 0.1, V, 0.5,
                                             dot_mode=dot_mode,
                                             dist_mode=dist_mode)
                        return W / jnp.linalg.norm(W, axis=0)
                    return jax.lax.fori_loop(0, k, body, V)

                jax.block_until_ready(chain(V, 3))
                reps = 20 if r_pad == 128 else 10
                t0 = time.perf_counter()
                jax.block_until_ready(chain(V, reps))
                secs = (time.perf_counter() - t0) / reps
                flops = 2 * n_pad * n_pad * (r_pad + 2 + 4)
                mxu_tf = 2 * n_pad * n_pad * r_pad / 1e12
                row = {
                    "r": r, "r_pad": r_pad, "dist_mode": dist_mode,
                    "dot_mode": dot_mode,
                    "seconds": round(secs, 4),
                    "tflops_metric": round(flops / secs / 1e12, 2),
                    "pct_f32_peak": round(100 * flops / secs / 1e12
                                          / V5E_F32_PEAK_TFLOPS, 1),
                    "mxu_tflop_per_mv": round(mxu_tf, 2),
                }
                rows.append(row)
                if verbose:
                    print(json.dumps(row), flush=True)

    out = {"n": n, "n_pad": n_pad, "tile": pk.DEFAULT_TILE,
           "peak_denominator_tflops": V5E_F32_PEAK_TFLOPS, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    if verbose:
        print(f"wrote {out_path}")
    return out


if __name__ == "__main__":
    main()
