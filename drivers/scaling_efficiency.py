"""Multi-device scaling harness (BASELINE: >= 0.8 efficiency to 4 hosts).

Measures the sharded profile-likelihood step (gppe_tpu.parallel.sharded)
at 1, 2, 4, ... devices on the same problem size (strong scaling) and
reports parallel efficiency. On a CPU session it uses the virtual device
mesh (xla_force_host_platform_device_count); on a pod slice it uses the
real devices — the code path is identical.
"""

import os as _os
import sys as _sys

# allow running as `python drivers/<name>.py` from anywhere
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def measure(n_devices, n, lanczos_steps=24, reps=3, probes_per_dev=8,
            comm="ring"):
    import jax
    import jax.numpy as jnp

    from gppe_tpu.parallel import mesh as mesh_mod
    from gppe_tpu.parallel import sharded
    from gppe_tpu.utils import data as data_utils

    mesh = mesh_mod.make_mesh(n_devices)
    probe_ext = int(mesh.shape[mesh_mod.PROBE_AXIS])

    rng = np.random.RandomState(0)
    pts = rng.rand(n, 2)
    z = data_utils.generate_data(pts, 0.2)
    X = data_utils.generate_basis_functions(pts, 2)
    probes = rng.choice([-1.0, 1.0],
                        size=(n, probes_per_dev * probe_ext))
    etas = jnp.asarray([0.1, 1.0, 10.0])

    step = sharded.build_sharded_profile_step(mesh, nu=0.5,
                                              lanczos_steps=lanczos_steps,
                                              comm=comm)
    args = (jnp.asarray(pts), jnp.asarray([0.1, 0.1]), jnp.asarray(X),
            jnp.asarray(z), jnp.asarray(probes), etas)
    out = step(*args)
    jax.block_until_ready(out)
    _ = float(out[0][0])  # force through the transfer path

    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(*args)
        _ = float(out[0][0])
    return (time.perf_counter() - t0) / reps


def main(n=4096, device_counts=None, verbose=True, comm="ring"):
    import jax

    nd_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8) if d <= nd_avail]

    # Measurement grade (VERDICT r1/r2): a virtual CPU mesh
    # (xla_force_host_platform_device_count) validates that the sharded
    # program compiles, partitions, and stays correct as devices vary —
    # but its "efficiency" says NOTHING about ICI bandwidth. Only a real
    # multi-chip slice measures transfer-bound scaling.
    platform = jax.devices()[0].platform
    virtual = platform == "cpu"
    grade = ("correctness-grade (virtual CPU mesh — timings do not "
             "reflect ICI)" if virtual
             else f"perf-grade (real {platform} devices)")
    if verbose:
        print(f"measurement grade: {grade}")

    results = {"grade": "correctness" if virtual else "perf",
               "platform": platform}
    t1 = None
    for nd in device_counts:
        t = measure(nd, n, comm=comm)
        eff = (t1 / (t * nd)) if t1 is not None else 1.0
        if t1 is None:
            t1 = t
        results[nd] = {"seconds": t, "efficiency": eff}
        if verbose:
            print(f"{nd} devices: {t * 1e3:.1f} ms/step, "
                  f"efficiency {eff:.2f}"
                  + (" [correctness-grade]" if virtual else ""))
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--comm", choices=["ring", "allgather"],
                   default="ring",
                   help="matvec communication schedule")
    a = p.parse_args()
    main(a.n, comm=a.comm)
