"""Kernel tapering ("sparse" correlation) — TPU-native block-sparse form.

The reference sparsifies K by dropping entries whose kernel value falls
below a threshold estimated from the requested density via d-ball
geometry, building CSR with OpenMP threads and a retry-on-overflow loop
(reference: gaussian_proc/generate_correlation/_generate_sparse_correlation.pyx:
294-465 threshold math, :129-197 locked COO assembly, :550-577 retries).

Here the same statistical object is expressed two ways:

* ``generate_tapered_correlation`` — host-side exact CSR (scipy) via
  blocked evaluation, for API parity and moderate n;
* ``TaperedMaternOperator`` — the scalable path: points are spatially
  sorted (grid-cell keys) so near points share tiles, a tile-pair
  adjacency mask is computed from tile bounding boxes and the taper
  radius, and matvecs touch only active tiles. The kernel value mask
  (k >= threshold) matches the reference's hard taper exactly. On TPU
  the active tiles run through the fused Pallas kernel; K is never
  materialized.

Since k(.; nu) is monotone decreasing, the taper "k >= threshold" is the
distance ball "d <= kernel_radius" — tiles are pruned on distance,
entries masked on kernel value.
"""

import numpy as np

import jax.numpy as jnp

from . import kernels


# -- d-ball threshold math (reference :208-465, formulas preserved; the
#    reference's missing-argument bug at :390 is fixed) -------------------

def gamma_function(dimension):
    """Gamma(dimension/2 + 1) by half-integer recursion
    (reference :208-233)."""
    if dimension % 2 == 0:
        k = 0.5 * dimension
        gamma = 1.0
        while k > 0.0:
            gamma *= k
            k -= 1.0
    else:
        k = np.ceil(0.5 * dimension)
        gamma = np.sqrt(np.pi)
        while k > 0.0:
            gamma *= k - 0.5
            k -= 1.0
    return gamma


def ball_radius(volume, dimension):
    """Radius of the d-ball of given volume (reference :240-260)."""
    return (gamma_function(dimension) * volume) ** (1.0 / dimension) \
        / np.sqrt(np.pi)


def ball_volume(radius, dimension):
    """Volume of the d-ball of given radius (reference :267-287)."""
    return (radius * np.sqrt(np.pi)) ** dimension / gamma_function(dimension)


def estimate_kernel_radius(matrix_size, dimension, density,
                           correlation_scale):
    """Scaled taper radius (in units of d/rho) for a target density.

    Geometry (the intent of reference _estimate_kernel_threshold:294-413):
    a point should keep ``a = density * n`` neighbors; for ~uniform points
    in the unit hypercube with spacing ``l = 1/(n^{1/d}-1)``, those
    neighbors occupy a d-ball of volume ``a * l^d``, whose radius is the
    physical taper radius. (Note: the reference's own implementation also
    divides the adjacency by the correlation-ellipsoid volume and calls
    _ball_volume with a missing argument (:388-390) — a latent bug that
    would crash and, if patched literally, inflates the density ~100x;
    the clean derivation is used here and is validated against the
    *requested* density in tests.)
    """
    adjacency = density * matrix_size
    if adjacency < 1.0:
        raise ValueError(
            f"Adjacency {adjacency:.2f} < 1: correlation matrix "
            "would become identity. Increase density or correlation_scale.")

    scale = np.atleast_1d(np.asarray(correlation_scale, dtype=float))
    geometric_mean_scale = np.prod(scale) ** (1.0 / dimension)

    grid_axis_num_points = matrix_size ** (1.0 / dimension)
    grid_size = 1.0 / max(grid_axis_num_points - 1.0, 1.0)
    kernel_radius = ball_radius(adjacency * grid_size ** dimension,
                                dimension)
    # physical radius -> scaled-distance radius
    return kernel_radius / geometric_mean_scale


def estimate_kernel_threshold(matrix_size, dimension, density,
                              correlation_scale, nu):
    """Taper threshold tau = k(kernel_radius; nu) (reference :294-413)."""
    r = estimate_kernel_radius(matrix_size, dimension, density,
                               correlation_scale)
    return float(kernels.matern(np.asarray(r), float(nu)))


def estimate_max_nnz(matrix_size, correlation_scale, dimension, density):
    """Upper estimate of nnz (reference _estimate_max_nnz:420-465);
    informational here — the builders below size arrays exactly."""
    estimated_nnz = int(np.ceil(density * matrix_size ** 2))
    scale = np.atleast_1d(np.asarray(correlation_scale, dtype=float))
    normalized = scale / scale.max()
    geometric_mean_radius = np.prod(normalized) ** (1.0 / dimension)
    safety = 1.0 / ball_radius(geometric_mean_radius, dimension)
    return int(np.ceil(safety * estimated_nnz))


# -- host CSR builder (API parity with the reference) ---------------------

def generate_tapered_correlation(points, scale, nu, density, verbose=False,
                                 block_rows=2048):
    """Exact tapered correlation as scipy CSR (reference
    generate_sparse_correlation:472-594 semantics: keep k >= tau)."""
    import scipy.sparse

    points = np.asarray(points, dtype=float)
    n, d = points.shape
    scale = np.atleast_1d(np.asarray(scale, dtype=float))
    if scale.size == 1:
        scale = np.repeat(scale, d)
    tau = estimate_kernel_threshold(n, d, density, scale, nu)
    radius = estimate_kernel_radius(n, d, density, scale)
    pts_scaled = points / scale

    # native C++/OpenMP cell-binned builder (O(n k)); k >= tau is
    # equivalent to distance <= radius since the kernel is monotone
    from .. import native
    res = native.taper_csr(pts_scaled, radius, nu)
    if res is not None:
        values, indices, indptr = res
        csr = scipy.sparse.csr_matrix((values, indices, indptr),
                                      shape=(n, n))
        if verbose:
            print(f"tapered correlation (native, "
                  f"{native.num_threads()} threads): n={n} "
                  f"tau={tau:.3e} nnz={csr.nnz} "
                  f"density={csr.nnz / n ** 2:.3e}")
        return csr

    rows, cols, vals = [], [], []
    for start in range(0, n, block_rows):
        stop = min(start + block_rows, n)
        diff = pts_scaled[start:stop, None, :] - pts_scaled[None, :, :]
        dist = np.sqrt((diff ** 2).sum(-1))
        kblk = np.asarray(kernels.matern(dist, float(nu)))
        r, c = np.nonzero(kblk >= tau)
        rows.append(r + start)
        cols.append(c)
        vals.append(kblk[r, c])
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals)
    csr = scipy.sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))
    if verbose:
        print(f"tapered correlation: n={n} tau={tau:.3e} "
              f"nnz={csr.nnz} density={csr.nnz / n ** 2:.3e}")
    return csr


# -- spatial sorting and the block-sparse operator ------------------------

def spatial_sort(points, cell_size):
    """Sort points by grid-cell key (row-major cells of width cell_size in
    scaled coordinates) so that spatial neighbors are contiguous.
    Returns the permutation."""
    pts = np.asarray(points)
    cells = np.floor(pts / cell_size).astype(np.int64)
    # lexicographic cell key, then original index for determinism
    order = np.lexsort(tuple(cells[:, k] for k in range(pts.shape[1] - 1,
                                                        -1, -1)))
    return order


class TaperedMaternOperator:
    """Block-sparse tapered Matern operator: matvec touches only tile
    pairs within the taper radius. The TPU-scaling replacement for the
    reference's CSR path (N = 2^20 with O(density n^2) work)."""

    def __init__(self, points, scale, nu=0.5, density=0.001, tile=512,
                 dtype=None, use_pallas=None):
        from ..utils.config import compute_dtype, is_tpu
        dtype = dtype or compute_dtype()
        points = np.asarray(points, dtype=np.float64)
        n, d = points.shape
        scale_arr = np.atleast_1d(np.asarray(scale, dtype=float))
        if scale_arr.size == 1:
            scale_arr = np.repeat(scale_arr, d)

        self.nu = float(nu)
        self.density = density
        self.tile = int(min(tile, n))
        self.radius = estimate_kernel_radius(n, d, density, scale_arr)
        self.threshold = estimate_kernel_threshold(n, d, density,
                                                   scale_arr, nu)

        # sort by spatial cells of the taper radius (scaled coordinates)
        pts_scaled = points / scale_arr
        self.perm = spatial_sort(pts_scaled, max(self.radius, 1e-12))
        self.inv_perm = np.argsort(self.perm)
        pts_sorted = pts_scaled[self.perm]

        # pad to a tile multiple with far-away points
        t = self.tile
        n_pad = -(-n // t) * t
        if n_pad > n:
            pad = np.zeros((n_pad - n, d))
            pad[:, 0] = 1e6 * (2.0 + np.arange(n_pad - n))
            pts_sorted = np.concatenate([pts_sorted, pad], axis=0)
        self._n = n
        self.n_pad = n_pad
        num_tiles = n_pad // t

        # tile bounding boxes -> active pairs (bbox distance <= radius)
        boxes_lo = pts_sorted.reshape(num_tiles, t, d).min(axis=1)
        boxes_hi = pts_sorted.reshape(num_tiles, t, d).max(axis=1)
        gap = np.maximum(
            np.maximum(boxes_lo[:, None, :] - boxes_hi[None, :, :],
                       boxes_lo[None, :, :] - boxes_hi[:, None, :]), 0.0)
        tile_dist = np.sqrt((gap ** 2).sum(-1))
        active = tile_dist <= self.radius
        pi, pj = np.nonzero(active)
        order = np.lexsort((pj, pi))      # sort by row tile then col tile
        self.pair_i = pi[order].astype(np.int32)
        self.pair_j = pj[order].astype(np.int32)
        self.num_tiles = num_tiles
        self.tile_density = len(self.pair_i) / num_tiles ** 2

        self.points_sorted = jnp.asarray(pts_sorted, dtype=dtype)
        self.dtype = dtype
        if use_pallas is None:
            use_pallas = is_tpu() and self.nu in (0.5, 1.5, 2.5)
        self.use_pallas = use_pallas

    @property
    def shape(self):
        return (self._n, self._n)

    def nnz_estimate(self):
        return estimate_max_nnz(self._n, 1.0, 2, self.density)

    def matmat(self, V):
        V = jnp.asarray(V, dtype=self.dtype)
        squeeze = V.ndim == 1
        if squeeze:
            V = V[:, None]
        # permute into sorted order, pad
        Vs = V[self.perm]
        if self.n_pad > self._n:
            Vs = jnp.concatenate(
                [Vs, jnp.zeros((self.n_pad - self._n, V.shape[1]),
                               dtype=self.dtype)], axis=0)
        if self.use_pallas:
            from . import pallas_kernels
            out = pallas_kernels.matern_matmat_blocksparse(
                self.points_sorted, Vs, self.nu, self.threshold,
                self.pair_i, self.pair_j, self.tile)
        else:
            out = self._matmat_blocked(Vs)
        out = out[:self._n][self.inv_perm]
        return out[:, 0] if squeeze else out

    def matvec(self, v):
        return self.matmat(v)

    def _matmat_blocked(self, Vs):
        """XLA fallback: loop over active tile pairs (scan), masked."""
        import jax
        t = self.tile
        pts = self.points_sorted
        pair_i = jnp.asarray(self.pair_i)
        pair_j = jnp.asarray(self.pair_j)
        out = jnp.zeros((self.n_pad, Vs.shape[1]), dtype=self.dtype)
        tau = self.threshold

        def body(out, pair):
            i, j = pair
            rows = jax.lax.dynamic_slice(pts, (i * t, 0), (t, pts.shape[1]))
            colsp = jax.lax.dynamic_slice(pts, (j * t, 0),
                                          (t, pts.shape[1]))
            vblk = jax.lax.dynamic_slice(Vs, (j * t, 0), (t, Vs.shape[1]))
            dist = kernels.pairwise_scaled_distance(rows, colsp, 1.0)
            kblk = kernels.matern(dist, self.nu)
            kblk = jnp.where(kblk >= tau, kblk, 0.0)
            acc = jnp.matmul(kblk, vblk, precision="highest")
            return jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(
                    out, (i * t, 0), (t, Vs.shape[1])) + acc,
                (i * t, 0)), None

        pairs = jnp.stack([pair_i, pair_j], axis=1).astype(
            jnp.asarray(0).dtype)  # match dynamic_slice index dtype
        out, _ = jax.lax.scan(body, out, pairs)
        return out

    def trace_pow(self, exponent):
        if exponent in (0, 1):
            return jnp.asarray(float(self._n), dtype=self.dtype)
        if exponent == 2:
            # sum of squared *tapered* entries over active tiles
            import jax
            t = self.tile
            pts = self.points_sorted
            tau = self.threshold

            def body(acc, pair):
                i, j = pair
                rows = jax.lax.dynamic_slice(pts, (i * t, 0),
                                             (t, pts.shape[1]))
                colsp = jax.lax.dynamic_slice(pts, (j * t, 0),
                                              (t, pts.shape[1]))
                dist = kernels.pairwise_scaled_distance(rows, colsp, 1.0)
                kblk = kernels.matern(dist, self.nu)
                kblk = jnp.where(kblk >= tau, kblk, 0.0)
                return acc + jnp.sum(kblk * kblk), None

            pairs = jnp.stack([jnp.asarray(self.pair_i),
                               jnp.asarray(self.pair_j)], axis=1).astype(
                jnp.asarray(0).dtype)
            acc, _ = jax.lax.scan(body, jnp.asarray(0.0, self.dtype), pairs)
            # padded diagonal tiles contribute matern(0)=1 per padded row
            return acc - (self.n_pad - self._n)
        raise ValueError("exponent must be 0, 1 or 2")
