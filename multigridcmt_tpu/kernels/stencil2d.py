"""Pallas TPU kernels for the hot 2D stencil operations.

These are the TPU-native equivalents of the reference's compiled SciPy
SpMV/relaxation routines (SURVEY.md §2 "Sparse formats / SpMV": the
performance tier of the build is Pallas kernels; BASELINE.json:5 "every
kernel at speed-of-light nnz/s per chip").

Layout: kernels operate on *aligned* grids — physical shape
``(round_up(n+2, 8), round_up(n+2, 128))`` with the logical padded grid in
the top-left corner and zeros elsewhere (`grids.aligned_shape`). Mosaic DMA
windows must be 8-aligned in rows and full-width multiples of 128 lanes
(verified empirically on v5e: unaligned `memref_slice` offsets/shapes are
compile errors), and 2^k+1 logical shapes cannot satisfy that — so the
Pallas solve path keeps every level in aligned layout end-to-end and
converts exactly once per solve.

Design (see /opt/skills/guides/pallas_guide.md):

* Grids up to 4095^2 fp32 (~68 MB) exceed VMEM (~16 MB), so each kernel is
  row-tiled: a single-program kernel walks 8-aligned row tiles with
  double-buffered async DMA (HBM -> VMEM -> compute -> HBM), overlapping
  the next tile's loads with the current tile's compute. Tiles carry an
  8-row halo and overlap-recompute at the (aligned) tail, so no inter-tile
  communication exists.

* The flagship fusion is `rbgs_sweep`: BOTH Gauss-Seidel colors in one HBM
  pass. The red half-sweep is recomputed on a 1-row-extended region so the
  black half-sweep's neighbor reads never leave the tile. A sweep costs
  ~3N of HBM traffic instead of the ~6N of two separate masked passes —
  these kernels are HBM-bandwidth bound (5 multiply-adds per point), so
  that is a ~2x wall-clock win on the dominant cost of the V-cycle.

* Neighbor access is `pltpu.roll` (native lane/sublane rotate; Mosaic has
  no general lane-dim pad/concat). Wrapped-around values land only in
  ghost/pad cells, which the interior mask zeroes — circular semantics are
  free correctness under the zero-ghost invariant.

h (mesh spacing) is a static Python float — one compiled kernel per
multigrid level, matching the static hierarchy. The optional shift sigma
(eigensolver path) is an SMEM scalar, so Rayleigh-quotient shifts don't
retrace.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Interior rows written per DMA round trip. 64 rows x 4224 lanes fp32 is
# ~1.1 MB; u/b/out double buffers total ~8 MB at the 4095^2 level.
_TILE_ROWS = 64
_HALO = 8  # loaded-halo rows per side; must be a multiple of 8 (DMA tiling)


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests, SURVEY.md §4.5)."""
    return jax.default_backend() != "tpu"


def _tile_plan(r: int):
    """(T, LT, nt): output rows per tile, loaded rows, number of tiles."""
    if r <= _TILE_ROWS + 2 * _HALO:
        return r, r, 1
    t = _TILE_ROWS
    return t, t + 2 * _HALO, -(-r // t)


def _neighbors(u):
    """(up, down, left, right) neighbor arrays via sublane/lane rotates."""
    rows, cols = u.shape
    up = pltpu.roll(u, 1, 0)            # result[i, j] = u[i-1, j]
    down = pltpu.roll(u, rows - 1, 0)   # u[i+1, j] (shifts must be >= 0)
    left = pltpu.roll(u, 1, 1)          # u[i, j-1]
    right = pltpu.roll(u, cols - 1, 1)  # u[i, j+1]
    return up, down, left, right


def _gs_vals(u, b, inv_den, h2):
    """Gauss-Seidel update value at every tile point (edge rows invalid)."""
    up, down, left, right = _neighbors(u)
    return (h2 * b + up + down + left + right) * inv_den


def _residual_vals(u, b, inv_h2, sigma):
    up, down, left, right = _neighbors(u)
    au = (4.0 * u - up - down - left - right) * inv_h2
    return b - au + sigma * u


def _make_tiled_kernel(compute_tile, n: int, r: int, c: int, dtype):
    """Double-buffered row-tiled driver around `compute_tile`.

    compute_tile(u_tile, b_tile, sigma, grow, gcol) -> full-tile values.
    All DMA windows are 8-row-aligned and full (128-multiple) width; output
    tiles exactly cover the r rows (the last tile overlap-recomputes).
    """
    t, lt, nt = _tile_plan(r)

    def kernel(sigma_ref, u_hbm, b_hbm, out_hbm, ubuf, bbuf, obuf,
               in_sems, out_sems):
        sigma = sigma_ref[0, 0]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)               # first output row
            ps = jnp.clip(oo - _HALO, 0, r - lt)         # first loaded row
            return (pl.multiple_of(oo, 8), pl.multiple_of(ps, 8))

        def in_copies(i, slot):
            _, ps = offsets(i)
            return (
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(ps, lt), :], ubuf.at[slot],
                    in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    b_hbm.at[pl.ds(ps, lt), :], bbuf.at[slot],
                    in_sems.at[slot, 1]),
            )

        for cp in in_copies(0, 0):
            cp.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                for cp in in_copies(i + 1, nxt):
                    cp.start()

            for cp in in_copies(i, slot):
                cp.wait()
            oo, ps = offsets(i)
            vals = compute_tile(ubuf[slot], bbuf[slot], sigma, ps)

            # Wait for the previous DMA out of this output slot before
            # overwriting the buffer.
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            co = pl.multiple_of(oo - ps, 8)
            obuf[slot, :, :] = vals
            # Mosaic can't dynamic-slice a vector value; DMA source refs
            # take (8-aligned) dynamic offsets — slice core rows at DMA time.
            pltpu.make_async_copy(
                obuf.at[slot, pl.ds(co, t), :],
                out_hbm.at[pl.ds(oo, t), :],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        # Drain the last (up to) two in-flight output DMAs.
        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2, pl.ds(0, t), :],
                    out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, lt, c), dtype),       # ubuf
        pltpu.VMEM((2, lt, c), dtype),       # bbuf
        pltpu.VMEM((2, lt, c), dtype),       # obuf (core sliced at DMA time)
        pltpu.SemaphoreType.DMA((2, 2)),     # input sems
        pltpu.SemaphoreType.DMA((2,)),       # output sems
    ]

    def call(sigma_arr, u, b):
        nnz = 5 * n * n
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, c), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz, transcendentals=0,
                bytes_accessed=3 * r * c * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, u, b)

    return call


def _tile_masks(n, ps, shape):
    """(interior, red) masks for a window at global row offset ps, built
    in one scope so the full-size int32 iotas die immediately instead of
    occupying Mosaic stack VMEM across the whole tile computation."""
    grow = ps + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior = (grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n)
    red = ((grow + gcol) % 2) == 0
    return interior, red


@functools.lru_cache(maxsize=None)
def _rbgs_call(n: int, r: int, c: int, h: float, dtype_name: str,
               sweeps: int = 1):
    """Fused multi-sweep RBGS: `sweeps` full red+black sweeps in ONE HBM
    pass. Dependency radius is 2 rows per sweep; the _HALO=8 loaded rows
    support sweeps <= 4 (staleness propagates inward 2 rows/sweep from the
    tile edge, never reaching the written core)."""
    assert 1 <= sweeps <= _HALO // 2
    dtype = jnp.dtype(dtype_name)
    h2 = h * h  # Python float: baked into the kernel as a literal

    def compute(u, b, sigma, ps):
        inv_den = 1.0 / (4.0 - sigma * h2)
        interior, red = _tile_masks(n, ps, u.shape)
        redm = interior & red
        blackm = interior & (~red)
        for _ in range(sweeps):
            u = jnp.where(redm, _gs_vals(u, b, inv_den, h2), u)
            u = jnp.where(blackm, _gs_vals(u, b, inv_den, h2), u)
        return u

    return _make_tiled_kernel(compute, n, r, c, dtype)


@functools.lru_cache(maxsize=None)
def _jacobi_call(n: int, r: int, c: int, h: float, omega: float,
                 dtype_name: str, sweeps: int = 1):
    """Fused multi-sweep weighted Jacobi (radius 1 row per sweep)."""
    assert 1 <= sweeps <= _HALO
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(u, b, sigma, ps):
        interior, _ = _tile_masks(n, ps, u.shape)
        for _ in range(sweeps):
            res = _residual_vals(u, b, inv_h2, sigma)
            vals = u + (omega / (4.0 * inv_h2 - sigma)) * res
            u = jnp.where(interior, vals, u)
        return u

    return _make_tiled_kernel(compute, n, r, c, dtype)


@functools.lru_cache(maxsize=None)
def _residual_call(n: int, r: int, c: int, h: float, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(u, b, sigma, ps):
        vals = _residual_vals(u, b, inv_h2, sigma)
        interior, _ = _tile_masks(n, ps, u.shape)
        return jnp.where(interior, vals, jnp.zeros_like(u))

    return _make_tiled_kernel(compute, n, r, c, dtype)


def _sigma_arr(sigma, dtype):
    return jnp.asarray(sigma, dtype=dtype).reshape(1, 1)


def _dims(u):
    """(n, r, c) of an aligned grid; n recovered from static logical size."""
    r, c = u.shape
    return r, c


def max_fused_sweeps(kind: str) -> int:
    """Most smoothing sweeps a single kernel invocation can fuse."""
    return _HALO // 2 if kind == "rbgs" else _HALO


def rbgs_sweep(u: jax.Array, b: jax.Array, n: int, h: float,
               sigma=0.0, sweeps: int = 1) -> jax.Array:
    """`sweeps` fused red+black Gauss-Seidel sweeps (single HBM pass).

    u, b: aligned grids (`grids.to_aligned`); n: logical interior size.
    """
    r, c = u.shape
    call = _rbgs_call(n, r, c, float(h), jnp.dtype(u.dtype).name, sweeps)
    return call(_sigma_arr(sigma, u.dtype), u, b)


def jacobi_sweep(u: jax.Array, b: jax.Array, n: int, h: float, omega: float,
                 sigma=0.0, sweeps: int = 1) -> jax.Array:
    """`sweeps` fused weighted-Jacobi sweeps (single HBM pass)."""
    r, c = u.shape
    call = _jacobi_call(n, r, c, float(h), float(omega),
                        jnp.dtype(u.dtype).name, sweeps)
    return call(_sigma_arr(sigma, u.dtype), u, b)


def residual(u: jax.Array, b: jax.Array, n: int, h: float,
             sigma=0.0) -> jax.Array:
    """r = b - (A - sigma I) u in one pass (aligned grids)."""
    r, c = u.shape
    call = _residual_call(n, r, c, float(h), jnp.dtype(u.dtype).name)
    return call(_sigma_arr(sigma, u.dtype), u, b)
