"""Pallas TPU kernels: fused Matern assembly + matmul.

The hot operation of the whole framework is K @ V where K is the Matern
correlation of n points. The reference materializes K with OpenMP Cython
(reference: _generate_dense_correlation.pyx:76-91) and hands it to BLAS;
at n = 10^5 that is 40 GB — impossible in HBM. This kernel computes each
(TM, TN) correlation tile *in VMEM* from the scaled points, immediately
multiplies it into the right-hand-side block on the MXU, and accumulates:
HBM traffic is O(n (d + r)) per matvec instead of O(n^2).

Layout: points are pre-scaled by 1/scale and stored transposed (d_pad, n)
with d padded to the sublane width 8, so tiles are (8, TN) — native TPU
tiling. The pairwise distance uses the exact difference form per
dimension (d <= 8, cancellation-free), the Matern branch is selected
statically from nu, and the tile-dot precision is selectable (see
``DOT_MODES``; defaults ``DEFAULT_TILE``/``DEFAULT_DOT_MODE`` are set
from on-chip measurement — the table lives next to them below).

'bf16x3' splits both operands into bf16 high + residual parts and drops
only the lo*lo term — the classical compensated-product scheme, f32-level
accuracy (~4e-6 rel) cheaper than HIGHEST's 6-pass product. Caveat: the
operand split ROUNDS v, so the map v -> K@v is not exactly linear and
u.(Kv) != v.(Ku) at the ~1e-6 level — harmless for Lanczos/CG which
re-measure residuals, but exact-symmetry consumers should pass
dot_mode='highest' (see tests/test_kernels.py::test_bf16x3_symmetry).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUBLANE = 8

DOT_MODES = ("highest", "bf16x3", "bf16")

# Defaults, set from on-chip measurement (v5e-1, n = 100k, r = 23 padded
# to 128 lanes; produced by drivers/profile_pallas_matrix.py, artifact
# data/pallas_matrix_r3.json, 2026-08-20). "matvec" is steady-state ms
# INSIDE a jitted dependent chain — independent repeated calls overlap on
# the tunneled backend and under-read ~7x, so these are the honest
# numbers. "cold"/"warm" are the full N=100k Krylov-setup constructor in
# a fresh process with an empty / populated persistent compile cache:
#
#   tile  dot_mode  cold s  warm s  matvec ms  rel-err vs exact XLA
#   512   highest    39.2     7.2     151.9         1.5e-7
#   512   bf16x3     68.5     6.3     147.2         4.7e-6
#   512   bf16       64.2     4.0     111.1         2.2e-3  (eta* off 4%)
#   1024  highest    57.3     7.3     187.7         1.7e-7
#   1024  bf16x3     62.5     5.7     152.4         4.7e-6  (r2 default)
#   1024  bf16       74.1     3.6     113.6         2.2e-3
#
# Conclusion: the matvec is transcendental/VPU-bound, not MXU-bound, so
# dot_mode barely moves steady state (bf16x3 buys 3% at +29 s cold
# compile and a non-linear operator; bf16's 2e-3 error visibly shifts
# the MLE). (512, highest) wins cold compile outright, is exact, and is
# within 3% of the fastest accurate steady state -> the default.
DEFAULT_TILE = 512
DEFAULT_DOT_MODE = "highest"


def _tile_dot(k_tile, v, dot_mode: str):
    """k_tile @ v on the MXU at the requested precision (see module
    docstring for the measured speed/accuracy of each mode)."""
    if dot_mode == "highest":
        return jnp.dot(k_tile, v, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if dot_mode == "bf16":
        return jnp.dot(k_tile, v, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    if dot_mode == "bf16x3":
        k_hi = k_tile.astype(jnp.bfloat16)
        k_lo = (k_tile - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        v_hi = v.astype(jnp.bfloat16)
        v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(k_hi, v_hi, preferred_element_type=jnp.float32)
                + jnp.dot(k_lo, v_hi, preferred_element_type=jnp.float32)
                + jnp.dot(k_hi, v_lo, preferred_element_type=jnp.float32))
    raise ValueError(f"dot_mode must be one of {DOT_MODES}; got {dot_mode}")


def _matern_tile(d2, nu: float):
    """Matern correlation of squared scaled distance, static-nu branch
    (same branch structure as the reference _kernels.pyx:76-93)."""
    if nu == 0.5:
        r = jnp.sqrt(d2)
        return jnp.exp(-r)
    if nu == 1.5:
        sr3 = jnp.sqrt(3.0 * d2)
        return (1.0 + sr3) * jnp.exp(-sr3)
    if nu == 2.5:
        sr5 = jnp.sqrt(5.0 * d2)
        return (1.0 + sr5 + (d2 * 5.0) / 3.0) * jnp.exp(-sr5)
    if nu >= 100.0:
        return jnp.exp(-0.5 * d2)
    raise ValueError(
        f"pallas matern path supports nu in {{0.5, 1.5, 2.5, inf}}; "
        f"got {nu} (general nu uses the blocked XLA path)")


def _matmat_kernel(pr_ref, pc_ref, v_ref, out_ref, *, nu, d, dot_mode):
    j = pl.program_id(1)

    pr = pr_ref[:]            # (TM, 8) scaled row points
    pc = pc_ref[:]            # (8, TN) scaled col points (transposed)
    d2 = jnp.zeros((pr.shape[0], pc.shape[1]), dtype=jnp.float32)
    for dim in range(d):
        # (TM,1) - (1,TN) broadcast: no transposes or gathers in-kernel
        diff = pr[:, dim:dim + 1] - pc[dim:dim + 1, :]
        d2 = d2 + diff * diff
    k_tile = _matern_tile(d2, nu)

    acc = _tile_dot(k_tile, v_ref[:], dot_mode)

    first = j == jnp.int32(0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


def _matmat_kernel_gram(pr_ref, pc_ref, nr_ref, nc_ref, v_ref, out_ref, *,
                        nu, d, dot_mode):
    """Gram-form distance variant (roofline experiment, round 5):
    d^2 = |x_r|^2 + |x_c|^2 - 2 x_r . x_c puts the O(TM TN d) pairwise
    work on the MXU (one (TM, 8) x (8, TN) dot) instead of d
    broadcast-subtract/FMA passes on the VPU — the fused matvec is
    VPU/transcendental-bound (see ARCHITECTURE roofline), so shaving
    VPU cycles per element is the only lever that moves it.

    The price is CANCELLATION: |x|^2 ~ 50 after centering while d^2 can
    be ~1e-6, so f32 rounding of the norm terms puts ~3e-6 absolute
    error on d^2 — sqrt amplifies that to ~1.7e-3 on NEAR-COINCIDENT
    pairs (exact-zero diagonals clamp to ~1e-3-distance kernel values).
    Far pairs are unaffected. Opt-in via dist_mode='gram'; the default
    difference form stays exact (1.5e-7 rel)."""
    j = pl.program_id(1)

    pr = pr_ref[:]            # (TM, 8) scaled, centered row points
    pc = pc_ref[:]            # (8, TN) scaled, centered col points
    # -2 x_r . x_c on the MXU; HIGHEST so the only error left is the
    # norm-term rounding (the d <= 8 contraction is cheap regardless)
    d2 = (nr_ref[:] + nc_ref[:]
          - 2.0 * jnp.dot(pr, pc, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST))
    d2 = jnp.maximum(d2, 0.0)
    k_tile = _matern_tile(d2, nu)

    acc = _tile_dot(k_tile, v_ref[:], dot_mode)

    first = j == jnp.int32(0)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("nu", "d", "tile_m", "tile_n",
                                              "dot_mode", "interpret"))
def _matern_matmat_padded(pts_rows, pts_cols_t, V, nu, d, tile_m, tile_n,
                          dot_mode, interpret=False):
    """pts_rows: (nr_pad, 8); pts_cols_t: (8, nc_pad); V: (nc_pad, r_pad)."""
    n_pad = pts_rows.shape[0]
    nc_pad = pts_cols_t.shape[1]
    r_pad = V.shape[1]
    grid = (n_pad // tile_m, nc_pad // tile_n)

    kernel = functools.partial(_matmat_kernel, nu=nu, d=d, dot_mode=dot_mode)

    flops = 2 * n_pad * n_pad * (r_pad + d + 4)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, _SUBLANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, r_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, r_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (n_pad + nc_pad) * (r_pad + 8),
            transcendentals=n_pad * nc_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pts_rows, pts_cols_t, V)


@functools.partial(jax.jit, static_argnames=("nu", "d", "tile_m", "tile_n",
                                              "dot_mode", "interpret"))
def _matern_matmat_padded_gram(pts_rows, pts_cols_t, nr, nc, V, nu, d,
                               tile_m, tile_n, dot_mode, interpret=False):
    """Gram-form distance variant: extra (nr_pad, 128) / (8, nc_pad)
    norm inputs (row norms broadcast over a 128-lane tile, col norms on
    the sublane axis — both native layouts, no in-kernel transposes)."""
    n_pad = pts_rows.shape[0]
    nc_pad = pts_cols_t.shape[1]
    r_pad = V.shape[1]
    grid = (n_pad // tile_m, nc_pad // tile_n)

    kernel = functools.partial(_matmat_kernel_gram, nu=nu, d=d,
                               dot_mode=dot_mode)

    flops = 2 * n_pad * n_pad * (r_pad + d + 4)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, _SUBLANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, r_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, r_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * (n_pad + nc_pad) * (r_pad + 9),
            transcendentals=n_pad * nc_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(pts_rows, pts_cols_t, nr, nc, V)


def matern_matmat(points, scale, V, nu, tile_m=None, tile_n=None,
                  points_cols=None, dot_mode=None, dist_mode="diff",
                  interpret=False):
    """K @ V with K the Matern correlation — fused, K never materialized.

    ``points`` are the row points (nr, d); ``points_cols`` defaults to the
    same set (square K) but may differ — the rectangular form is the
    building block of the row-block-sharded multi-chip matvec
    (gppe_tpu.parallel). ``V``: (nc, r). Returns (nr, r) float32.

    ``dist_mode``: 'diff' (default — exact broadcast-difference distance,
    1.5e-7 rel) or 'gram' (|x|^2 + |y|^2 - 2 x.y on the MXU — shaves the
    per-element VPU distance work off the transcendental-bound kernel at
    the price of ~1e-3 kernel error on near-coincident pairs; see
    _matmat_kernel_gram and the ARCHITECTURE roofline page).

    Traced with x64 disabled: global x64 mode leaks i64 grid indices into
    Mosaic, which fails to legalize them; this kernel is float32 by
    design anyway.
    """
    tile_m = DEFAULT_TILE if tile_m is None else tile_m
    tile_n = DEFAULT_TILE if tile_n is None else tile_n
    dot_mode = DEFAULT_DOT_MODE if dot_mode is None else dot_mode
    if dist_mode not in ("diff", "gram"):
        raise ValueError(f"dist_mode must be 'diff' or 'gram'; got "
                         f"{dist_mode}")
    with jax.enable_x64(False):
        return _matern_matmat_f32(points, scale, V, nu, tile_m, tile_n,
                                  points_cols, dot_mode, interpret,
                                  dist_mode=dist_mode)


def _pad_points(points, n_pad, d):
    n = points.shape[0]
    out = jnp.zeros((n_pad, _SUBLANE), dtype=jnp.float32)
    out = out.at[:n, :d].set(points)
    if n_pad > n:
        far = 1e6 * (2.0 + jnp.arange(n_pad - n, dtype=jnp.float32))
        out = out.at[n:, 0].set(far)
    return out


def _matern_matmat_f32(points, scale, V, nu, tile_m, tile_n, points_cols,
                       dot_mode, interpret=False, dist_mode="diff"):
    points = jnp.asarray(points, dtype=jnp.float32)
    scale = jnp.asarray(scale, dtype=jnp.float32)
    V = jnp.asarray(V, dtype=jnp.float32)
    pts_c = points if points_cols is None else jnp.asarray(
        points_cols, dtype=jnp.float32)
    nr, d = points.shape
    nc = pts_c.shape[0]
    if d > _SUBLANE:
        raise ValueError(f"pallas path supports dimension <= {_SUBLANE}")
    r = V.shape[1]

    nr_pad = -(-nr // tile_m) * tile_m
    nc_pad = -(-nc // tile_n) * tile_n
    r_pad = max(128, -(-r // 128) * 128)

    # scaled, padded points; padded points sit far away and mutually
    # apart so their correlation to everything real is ~0, and padded V
    # rows are zero anyway.
    scaled_rows = points / scale
    scaled_cols = pts_c / scale
    if dist_mode == "gram":
        # center on the scaled column mean: distances are translation-
        # invariant and smaller |x|^2 means less cancellation rounding
        # in |x|^2 + |y|^2 - 2 x.y (see _matmat_kernel_gram)
        center = jnp.mean(scaled_cols, axis=0, keepdims=True)
        scaled_rows = scaled_rows - center
        scaled_cols = scaled_cols - center
    pts_rows = _pad_points(scaled_rows, nr_pad, d)
    pts_cols_t = _pad_points(scaled_cols, nc_pad, d).T

    V_pad = jnp.zeros((nc_pad, r_pad), dtype=jnp.float32)
    V_pad = V_pad.at[:nc, :r].set(V)

    if dist_mode == "gram":
        nr_norm = jnp.sum(pts_rows * pts_rows, axis=1, keepdims=True)
        nc_norm = jnp.sum(pts_cols_t * pts_cols_t, axis=0, keepdims=True)
        out = _matern_matmat_padded_gram(
            pts_rows, pts_cols_t, nr_norm, nc_norm, V_pad, float(nu), d,
            tile_m, tile_n, dot_mode, interpret)
    else:
        out = _matern_matmat_padded(pts_rows, pts_cols_t, V_pad,
                                    float(nu), d, tile_m, tile_n,
                                    dot_mode, interpret)
    return out[:nr, :r]


def _matern_tile_from_r(r, nu: float):
    """Matern correlation from the scaled distance r (not squared) — the
    form used by the multi-rho kernel, where sqrt is hoisted out of the
    per-rho loop (r_b = r0 / rho_b shares one sqrt across the batch)."""
    if nu == 0.5:
        return jnp.exp(-r)
    if nu == 1.5:
        s = jnp.sqrt(3.0) * r
        return (1.0 + s) * jnp.exp(-s)
    if nu == 2.5:
        s = jnp.sqrt(5.0) * r
        return (1.0 + s + (s * s) / 3.0) * jnp.exp(-s)
    if nu >= 100.0:
        return jnp.exp(-0.5 * r * r)
    raise ValueError(
        f"pallas matern path supports nu in {{0.5, 1.5, 2.5, inf}}; "
        f"got {nu} (general nu uses the blocked XLA path)")


def _multirho_kernel(inv_ref, pr_ref, pc_ref, v_ref, out_ref, fro_ref, *,
                     nu, d, dot_mode):
    """One distance tile, B Matern tiles: the (rho_b) batch differs only
    by a scale on the distance, so the O(TM*TN*d) pairwise work and the
    sqrt are computed ONCE and each rho pays only one exp + one MXU dot.
    This is what makes the grid-batched Krylov factorization
    (models.grid_krylov) matrix-free at the same per-rho cost as the
    single-kernel matvec.

    ``fro_ref`` (B, 8, 128) per row-block accumulates sum(K_b^2) per rho
    alongside the matvec (the scalar spread over one (8, 128) register
    tile — Mosaic requires (8, 128)-aligned output blocks): trace(K^2)
    is the control-variate moment every grid engine needs, and riding
    this kernel amortizes its distance pass across the whole rho batch
    instead of re-deriving it per grid point (one extra VPU mul-add per
    element next to the exp)."""
    j = pl.program_id(1)
    pr = pr_ref[:]            # (TM, 8) raw row points
    pc = pc_ref[:]            # (8, TN) raw col points (transposed)
    d2 = jnp.zeros((pr.shape[0], pc.shape[1]), dtype=jnp.float32)
    for dim in range(d):
        diff = pr[:, dim:dim + 1] - pc[dim:dim + 1, :]
        d2 = d2 + diff * diff
    r0 = jnp.sqrt(d2)
    first = j == jnp.int32(0)
    B = v_ref.shape[0]
    for b in range(B):
        k_tile = _matern_tile_from_r(r0 * inv_ref[0, b], nu)
        acc = _tile_dot(k_tile, v_ref[b], dot_mode)
        fro = jnp.full((8, 128), jnp.sum(k_tile * k_tile) * (1.0 / 1024.0),
                       dtype=jnp.float32)

        @pl.when(first)
        def _(b=b, acc=acc, fro=fro):
            out_ref[b] = acc
            fro_ref[b] = fro

        @pl.when(jnp.logical_not(first))
        def _(b=b, acc=acc, fro=fro):
            out_ref[b] = out_ref[b] + acc
            fro_ref[b] = fro_ref[b] + fro


@functools.partial(jax.jit, static_argnames=("nu", "d", "tile", "dot_mode",
                                              "interpret"))
def _multirho_padded(inv_rho, pts_rows, pts_cols_t, V, nu, d, tile,
                     dot_mode, interpret=False):
    """inv_rho: (1, B); pts_rows: (n_pad, 8); pts_cols_t: (8, n_pad);
    V: (B, n_pad, r_pad)."""
    n_pad = pts_rows.shape[0]
    B, _, r_pad = V.shape
    grid = (n_pad // tile, n_pad // tile)

    kernel = functools.partial(_multirho_kernel, nu=nu, d=d,
                               dot_mode=dot_mode)
    flops = 2 * n_pad * n_pad * (B * r_pad + d + 4)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, _SUBLANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUBLANE, tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tile, r_pad), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, tile, r_pad), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 8, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, (n_pad // tile) * 8, 128),
                                 jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * n_pad * (B * 2 * r_pad + 16),
            transcendentals=B * n_pad * n_pad),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(inv_rho, pts_rows, pts_cols_t, V)


def matern_matmat_multirho(points, rhos, V, nu, tile=None, dot_mode=None,
                           interpret=False, return_frobenius=False):
    """K(rho_b) @ V_b for a batch of isotropic correlation scales, fused.

    ``points``: (n, d) RAW (unscaled) points; ``rhos``: (B,) scalar
    scales; ``V``: (B, n, r). Returns (B, n, r) float32. The pairwise
    distance tile is computed once per (i, j) block and shared across the
    whole rho batch (rho is just a scale on distance), so the marginal
    cost of each extra grid point is one exp + one (tile x tile x r_pad)
    MXU dot — the engine of the matrix-free grid-batched Krylov path
    (models.grid_krylov; the reference rebuilds K per grid point instead,
    examples/FindOptimalCovarianceParameters.py:87-117).

    ``return_frobenius=True`` additionally returns trace(K_b^2) (B,) —
    accumulated inside the kernel, so the whole rho batch shares one
    distance pass (the control-variate moment of the grid engines).
    """
    tile = DEFAULT_TILE if tile is None else tile
    dot_mode = DEFAULT_DOT_MODE if dot_mode is None else dot_mode
    with jax.enable_x64(False):
        points = jnp.asarray(points, dtype=jnp.float32)
        V = jnp.asarray(V, dtype=jnp.float32)
        inv = (1.0 / jnp.asarray(rhos, dtype=jnp.float32)).reshape(1, -1)
        n, d = points.shape
        B, _, r = V.shape
        if d > _SUBLANE:
            raise ValueError(f"pallas path supports dimension <= {_SUBLANE}")
        n_pad = -(-n // tile) * tile
        r_pad = max(128, -(-r // 128) * 128)
        pts8 = _pad_points(points, n_pad, d)
        V_pad = jnp.zeros((B, n_pad, r_pad), dtype=jnp.float32)
        V_pad = V_pad.at[:, :n, :r].set(V)
        out, fro = _multirho_padded(inv, pts8, pts8.T, V_pad, float(nu),
                                    d, tile, dot_mode, interpret)
        if return_frobenius:
            # each far padded point contributes exactly its unit
            # self-correlation (pad-pad and pad-real pairs are ~0)
            tk2 = fro.reshape(B, -1).sum(axis=1) - (n_pad - n)
            return out[:, :n, :r], tk2
        return out[:, :n, :r]


def _blocksparse_kernel(pair_i_ref, pair_j_ref, pr_ref, pc_ref, v_ref,
                        out_ref, *, nu, d, tau, dot_mode):
    p = pl.program_id(0)
    i_cur = pair_i_ref[p]
    i_prev = pair_i_ref[jnp.maximum(p - 1, 0)]
    first = jnp.logical_or(p == jnp.int32(0), i_prev != i_cur)

    pr = pr_ref[:]
    pc = pc_ref[:]
    d2 = jnp.zeros((pr.shape[0], pc.shape[1]), dtype=jnp.float32)
    for dim in range(d):
        diff = pr[:, dim:dim + 1] - pc[dim:dim + 1, :]
        d2 = d2 + diff * diff
    k_tile = _matern_tile(d2, nu)
    # hard taper: exact parity with the reference's threshold drop
    k_tile = jnp.where(k_tile >= tau, k_tile, 0.0)

    acc = _tile_dot(k_tile, v_ref[:], dot_mode)

    @pl.when(first)
    def _():
        out_ref[:] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[:] = out_ref[:] + acc


@functools.partial(jax.jit,
                   static_argnames=("nu", "d", "tau", "tile", "dot_mode",
                                    "interpret"))
def _blocksparse_padded(pts_rows, pts_cols_t, V, pair_i, pair_j, nu, d,
                        tau, tile, dot_mode, interpret=False):
    n_pad = pts_rows.shape[0]
    r_pad = V.shape[1]
    num_pairs = pair_i.shape[0]

    kernel = functools.partial(_blocksparse_kernel, nu=nu, d=d, tau=tau,
                               dot_mode=dot_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pairs,),
        in_specs=[
            pl.BlockSpec((tile, _SUBLANE),
                         lambda p, pi, pj: (pi[p], 0)),
            pl.BlockSpec((_SUBLANE, tile),
                         lambda p, pi, pj: (0, pj[p])),
            pl.BlockSpec((tile, r_pad),
                         lambda p, pi, pj: (pj[p], 0)),
        ],
        out_specs=pl.BlockSpec((tile, r_pad),
                               lambda p, pi, pj: (pi[p], 0)),
    )
    flops = 2 * num_pairs * tile * tile * (r_pad + d + 4)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, r_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * num_pairs * tile * (2 * r_pad + 16),
            transcendentals=num_pairs * tile * tile),
        interpret=interpret,
    )(pair_i, pair_j, pts_rows, pts_cols_t, V)


def matern_matmat_blocksparse(points_sorted, V, nu, tau, pair_i, pair_j,
                              tile, dot_mode=None, interpret=False):
    """Tapered (block-sparse) K @ V over active tile pairs only.

    ``points_sorted``: (n_pad, d) spatially sorted, *already scaled*
    points (padded to a tile multiple); ``pair_i/pair_j``: active tile
    index pairs sorted by row tile (gppe_tpu.ops.taper builds them).
    ``dot_mode`` follows :func:`matern_matmat` (default
    ``DEFAULT_DOT_MODE``).
    """
    dot_mode = DEFAULT_DOT_MODE if dot_mode is None else dot_mode
    with jax.enable_x64(False):
        pts = jnp.asarray(points_sorted, dtype=jnp.float32)
        n_pad, d = pts.shape
        V = jnp.asarray(V, dtype=jnp.float32)
        r = V.shape[1]
        r_pad = max(128, -(-r // 128) * 128)
        V_pad = jnp.zeros((n_pad, r_pad), dtype=jnp.float32)
        V_pad = V_pad.at[:, :r].set(V)
        pts8 = jnp.zeros((n_pad, _SUBLANE), dtype=jnp.float32)
        pts8 = pts8.at[:, :d].set(pts)
        out = _blocksparse_padded(
            pts8, pts8.T, V_pad,
            jnp.asarray(pair_i, dtype=jnp.int32),
            jnp.asarray(pair_j, dtype=jnp.int32),
            float(nu), d, float(tau), int(tile), dot_mode, interpret)
        return out[:, :r]
