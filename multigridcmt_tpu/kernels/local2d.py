"""Pallas kernels for SHARD-LOCAL 2D smoothing inside ``shard_map``.

The distributed runtime (parallel/sharded.py) computes on owned row
tiles; its jnp color-masked RB-GS costs ~10x the single-device packed
kernels per point (measured: 12.5 ms vs 1.2 ms for the same k=12 cycle
on one chip). These kernels close that gap: the local tile is
halo-extended by ``HALO_ROWS`` pre-sweep rows (one ppermute pair per
fused smoothing stage instead of two per half-sweep), embedded in the
2D-aligned layout, and swept by a rectangular variant of the
stencil2d kernels that

  * recomputes updates inside the ghost region (the classic
    overlap-recompute argument: after s sweeps an owned row depends on
    pre-sweep values within 2s rows, and 2s <= HALO_ROWS, so owned
    output rows equal the global sweep EXACTLY — same contract as the
    re-exchanging jnp path, tested to fp64 equality);
  * takes the tile's GLOBAL (row, col) offsets as SMEM scalars:
    shard_map compiles one SPMD program, so per-shard quantities
    (offsets from ``axis_index``) must be runtime values. Interior
    bounds and the red/black parity derive from them; a row
    decomposition passes col_off = 0 (columns carry the global
    padding), a block decomposition passes both.

Cited behavior: the reference's RB-GS sweep order (SURVEY.md §2) — the
equivalence tests in tests/test_sharded.py pin sharded == unsharded
point-for-point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import (_HALO, _gs_vals, _interpret, _residual_vals,
                        _tile_plan)

# Ghost rows exchanged per fused smoothing stage (both sides). 8 rows
# supports 4 fused RB-GS sweeps (staleness 2 rows/sweep) or 8 Jacobi
# sweeps, and keeps the extended tile 8-row aligned when the owned row
# count is a multiple of 8.
HALO_ROWS = 8


def max_fused_sweeps(kind: str) -> int:
    return HALO_ROWS // 2 if kind == "rbgs" else HALO_ROWS


def _masks(n, grow0, gcol0, ps, shape):
    """(interior, red) for a window at local row ps of a tile whose local
    (row 0, col 0) has global indices (grow0, gcol0) — both traced; a row
    decomposition passes gcol0 = 0 (columns unsharded)."""
    grow = grow0 + ps + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gcol = gcol0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    interior = (grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n)
    red = ((grow + gcol) % 2) == 0
    return interior, red


def _make_local_kernel(compute_tile, n: int, r: int, c: int, dtype):
    """stencil2d's double-buffered row-tiled driver, plus an int32 SMEM
    scalar (the global row offset) threaded into the masks."""
    t, lt, nt = _tile_plan(r)

    def kernel(sigma_ref, off_ref, u_hbm, b_hbm, out_hbm, ubuf, bbuf, obuf,
               in_sems, out_sems):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - _HALO, 0, r - lt)
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
            vals = compute_tile(ubuf[slot], bbuf[slot], sigma, grow0, gcol0,
                                ps)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            co = pl.multiple_of(oo - ps, 8)
            obuf[slot, :, :] = vals
            pltpu.make_async_copy(
                obuf.at[slot, pl.ds(co, t), :],
                out_hbm.at[pl.ds(oo, t), :],
                out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

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
        pltpu.VMEM((2, lt, c), dtype),
        pltpu.VMEM((2, lt, c), dtype),
        pltpu.VMEM((2, lt, c), dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, u, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, c), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # Window + Mosaic stack temporaries sit right at the
                # 16 MB default scoped limit on 4k-wide tiles (measured
                # 16.61 MB); physical VMEM is ~128 MB — raise it.
                vmem_limit_bytes=48 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=10 * r * c, transcendentals=0,
                bytes_accessed=3 * r * c * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u, b)

    return call


@functools.lru_cache(maxsize=None)
def _rbgs_call(n: int, r: int, c: int, h: float, dtype_name: str,
               sweeps: int):
    assert 1 <= sweeps <= HALO_ROWS // 2
    dtype = jnp.dtype(dtype_name)
    h2 = h * h

    def compute(u, b, sigma, grow0, gcol0, ps):
        inv_den = 1.0 / (4.0 - sigma * h2)
        interior, red = _masks(n, grow0, gcol0, ps, u.shape)
        redm = interior & red
        blackm = interior & (~red)
        for _ in range(sweeps):
            u = jnp.where(redm, _gs_vals(u, b, inv_den, h2), u)
            u = jnp.where(blackm, _gs_vals(u, b, inv_den, h2), u)
        return u

    return _make_local_kernel(compute, n, r, c, dtype)


@functools.lru_cache(maxsize=None)
def _jacobi_call(n: int, r: int, c: int, h: float, omega: float,
                 dtype_name: str, sweeps: int):
    assert 1 <= sweeps <= HALO_ROWS
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(u, b, sigma, grow0, gcol0, ps):
        interior, _ = _masks(n, grow0, gcol0, ps, u.shape)
        for _ in range(sweeps):
            res = _residual_vals(u, b, inv_h2, sigma)
            vals = u + (omega / (4.0 * inv_h2 - sigma)) * res
            u = jnp.where(interior, vals, u)
        return u

    return _make_local_kernel(compute, n, r, c, dtype)


@functools.lru_cache(maxsize=None)
def _residual_call(n: int, r: int, c: int, h: float, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(u, b, sigma, grow0, gcol0, ps):
        vals = _residual_vals(u, b, inv_h2, sigma)
        interior, _ = _masks(n, grow0, gcol0, ps, u.shape)
        return jnp.where(interior, vals, jnp.zeros_like(u))

    return _make_local_kernel(compute, n, r, c, dtype)


def _scal(v, dtype):
    return jnp.asarray(v, dtype=dtype).reshape(1, 1)


def _offs(row_off, col_off):
    return jnp.stack([jnp.asarray(row_off, jnp.int32),
                      jnp.asarray(col_off, jnp.int32)]).reshape(1, 2)


def rbgs_sweep(u_ext: jax.Array, b_ext: jax.Array, n: int, h: float,
               row_off, col_off=0, sigma=0.0, sweeps: int = 1) -> jax.Array:
    """`sweeps` fused RB-GS sweeps on an aligned halo-extended tile.

    u_ext/b_ext: aligned (8k, 128k) embedding of the halo-extended local
    tile; n: GLOBAL interior size; row_off/col_off: global indices of
    local (row 0, col 0) (traced ints; from ``axis_index``; col_off = 0
    for a row decomposition, whose columns carry the global padding)."""
    r, c = u_ext.shape
    call = _rbgs_call(n, r, c, float(h), jnp.dtype(u_ext.dtype).name,
                      sweeps)
    return call(_scal(sigma, u_ext.dtype), _offs(row_off, col_off),
                u_ext, b_ext)


def jacobi_sweep(u_ext: jax.Array, b_ext: jax.Array, n: int, h: float,
                 omega: float, row_off, col_off=0, sigma=0.0,
                 sweeps: int = 1) -> jax.Array:
    """`sweeps` fused weighted-Jacobi sweeps on an aligned extended tile."""
    r, c = u_ext.shape
    call = _jacobi_call(n, r, c, float(h), float(omega),
                        jnp.dtype(u_ext.dtype).name, sweeps)
    return call(_scal(sigma, u_ext.dtype), _offs(row_off, col_off),
                u_ext, b_ext)


def residual(u_ext: jax.Array, b_ext: jax.Array, n: int, h: float,
             row_off, col_off=0, sigma=0.0) -> jax.Array:
    """r = b - (A - sigma I) u on an aligned extended tile (zero outside
    the global interior)."""
    r, c = u_ext.shape
    call = _residual_call(n, r, c, float(h), jnp.dtype(u_ext.dtype).name)
    return call(_scal(sigma, u_ext.dtype), _offs(row_off, col_off),
                u_ext, b_ext)
