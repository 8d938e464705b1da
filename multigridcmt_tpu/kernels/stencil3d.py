"""Pallas TPU kernels for the hot 3D (7-point) stencil operations.

3D Poisson is a capability extension over the reference (AndyMN/
MultigridCMT covers 1D/2D — SURVEY.md §0); BASELINE.json:5's "every
kernel at speed-of-light nnz/s" applies to it all the same, so the 3D
fine levels get the same Pallas treatment as 2D (VERDICT.md round-2
item 5).

Layout: aligned3 grids (`grids.aligned3_shape`) — shape ``(p, r, c)``
with ``p = n + 2`` z-planes, each plane a 2D-aligned ``(8k, 128k)``
grid. Only the trailing two dims carry Mosaic tiling constraints; the
plane dim is a plain array dim, so plane-granular DMA windows take
arbitrary dynamic offsets.

Design — *plane-rolling* stream (the 3D analog of stencil2d's row
tiles, but with zero traffic amplification):

* A 7-point stencil at plane g reads planes g-1, g, g+1. Instead of
  re-fetching a 3-plane window per step (which would read every u plane
  three times), the kernel keeps a ring of ``_S = 4`` resident u planes
  in VMEM: each iteration DMAs exactly ONE new plane (the g+2
  lookahead), computes plane g from the three resident ones, and writes
  one plane out. Every HBM byte moves once — the kernel runs at the
  3-array DMA floor, like the 2D sweeps.

* In-plane neighbors are `pltpu.roll` lane/sublane rotates (zero-ghost
  invariant makes circular semantics free, as in 2D); z-neighbors are
  the flanking ring slots.

* The fused RB-GS sweep pipelines the two colors one plane apart: at
  iteration g the kernel red-updates plane g+1 (red neighbors are
  black, i.e. not-yet-updated — original values are the correct GS
  reads) into a second ring, then black-updates plane g from the
  red-updated ring (black neighbors are red — updated values, exact GS
  ordering) and emits it. A full red+black sweep in ONE HBM pass,
  matching the reference sweep order point-for-point.

VMEM: ~12 resident planes. At k=8 (255^3, 264x384 planes) that is
~5 MB fp32; k=9 planes (520x640) push past the 16 MB scoped limit, so
the backend caps the kernel path at `MAX_PLANE_ELEMS` and falls back
to the jnp stencils above it.

h is a static Python float (one kernel per level); the eigensolver
shift sigma is an SMEM scalar (no retrace across RQI shifts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _interpret

_S = 4                       # resident u-plane ring slots (1 lookahead)

# VMEM budget for the plane rings. The v5e core has ~128 MB of physical
# VMEM (measured on this chip: XLA pins loop-carried arrays up to
# ~116 MB; the 16 MB figure is only Mosaic's *default scoped limit*,
# raised below via vmem_limit_bytes). The kernels keep ~12 resident
# planes plus compute temporaries (~3 planes); budget 14 planes against
# 80 MB, which covers 3D grids through k=10 (1040x1152 fp32 planes).
_VMEM_LIMIT = 100 * 1024 * 1024
_PLANE_BUDGET_BYTES = 80 * 1024 * 1024


def fits_vmem(r: int, c: int, dtype) -> bool:
    return 14 * r * c * jnp.dtype(dtype).itemsize <= _PLANE_BUDGET_BYTES


def _interior_mask(n, shape):
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (row >= 1) & (row <= n) & (col >= 1) & (col <= n)


def _color_mask(n, g, shape, parity):
    """(g + y + x) % 2 == parity within the interior."""
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    inter = (row >= 1) & (row <= n) & (col >= 1) & (col <= n)
    return inter & (((g + row + col) % 2) == parity)


def _nsum(zl, zm, zh):
    """Sum of the 6 face neighbors at every point of plane zm."""
    r, c = zm.shape
    s = zl + zh
    s = s + pltpu.roll(zm, 1, 0)        # y-1
    s = s + pltpu.roll(zm, r - 1, 0)    # y+1
    s = s + pltpu.roll(zm, 1, 1)        # x-1
    s = s + pltpu.roll(zm, c - 1, 1)    # x+1
    return s


def _make_plane_kernel(compute_plane, n: int, p: int, r: int, c: int,
                       dtype, extra_ring: bool):
    """Plane-rolling driver.

    compute_plane(g, ubuf, rbuf, bbuf, sigma) -> (r, c) plane-g output
    values, reading the u ring (and optionally writing/reading the
    second ring `rbuf` for the RB-GS pipeline). Output ghost planes
    (0 and p-1) are zeroed in the epilogue.
    """
    assert p >= 5, p

    def kernel(sigma_ref, u_hbm, b_hbm, out_hbm, ubuf, rbuf, bbuf, obuf,
               usems, bsems, osems):
        sigma = sigma_ref[0, 0]

        def ustart(g):
            s = jnp.int32(g) % _S
            pltpu.make_async_copy(u_hbm.at[pl.ds(g, 1)],
                                  ubuf.at[pl.ds(s, 1)], usems.at[s]).start()

        def uwait(g):
            s = jnp.int32(g) % _S
            pltpu.make_async_copy(u_hbm.at[pl.ds(g, 1)],
                                  ubuf.at[pl.ds(s, 1)], usems.at[s]).wait()

        def bstart(g):
            s = jnp.int32(g) % 3
            pltpu.make_async_copy(b_hbm.at[pl.ds(g, 1)],
                                  bbuf.at[pl.ds(s, 1)], bsems.at[s]).start()

        def bwait(g):
            s = jnp.int32(g) % 3
            pltpu.make_async_copy(b_hbm.at[pl.ds(g, 1)],
                                  bbuf.at[pl.ds(s, 1)], bsems.at[s]).wait()

        # DMA disciplines (each plane started and waited exactly once).
        #   extra_ring=False (residual / Jacobi — iteration g reads u
        #   planes g-1..g+1 and b(g)): prologue starts u(0..2), waits
        #   u(0..1), starts b(1); body g starts u(g+2)/b(g+1), waits
        #   u(g+1)/b(g).
        #   extra_ring=True (RB-GS two-color pipeline — iteration g
        #   red-updates plane g+1, reading u planes g+1, g+2 and b(g+1),
        #   then black-updates plane g from the red ring and b(g)):
        #   prologue starts u(0..3)/b(1..2), waits u(0..2)/b(1); body g
        #   starts u(g+3)/b(g+2), waits u(g+2)/b(g+1).
        ula = 3 if extra_ring else 2       # u lookahead start distance
        uw = 2 if extra_ring else 1        # u wait distance
        for g in range(ula + 1):
            if g <= p - 1:
                ustart(jnp.int32(g))
        bstart(jnp.int32(1))
        if extra_ring:
            bstart(jnp.int32(2))
            bwait(jnp.int32(1))
        for g in range(uw + 1):
            uwait(jnp.int32(g))

        def body(i, _):
            g = i + 1                      # core plane index, 1..n
            oslot = jnp.int32(g) % 2

            @pl.when(g + ula <= p - 1)
            def _():
                ustart(g + ula)

            nb = g + (2 if extra_ring else 1)

            @pl.when(nb <= n)
            def _():
                bstart(nb)

            @pl.when(g + uw <= p - 1)
            def _():
                uwait(g + uw)

            if extra_ring:
                @pl.when(g + 1 <= n)
                def _():
                    bwait(g + 1)
            else:
                bwait(g)
            vals = compute_plane(g, ubuf, rbuf, bbuf, sigma)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[pl.ds(oslot, 1)], out_hbm.at[pl.ds(g - 2, 1)],
                    osems.at[oslot]).wait()

            obuf[pl.ds(oslot, 1)] = vals.reshape(1, r, c)
            pltpu.make_async_copy(obuf.at[pl.ds(oslot, 1)],
                                  out_hbm.at[pl.ds(g, 1)],
                                  osems.at[oslot]).start()
            return 0

        jax.lax.fori_loop(0, n, body, 0, unroll=False)

        # Drain the last (up to) two output DMAs.
        def drain(j, _):
            @pl.when(j < jnp.minimum(n, 2))
            def _():
                s = jnp.int32(n - j) % 2
                pltpu.make_async_copy(obuf.at[pl.ds(s, 1)],
                                      out_hbm.at[pl.ds(0, 1)],
                                      osems.at[s]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

        # Ghost planes of the output are zero by invariant.
        obuf[pl.ds(0, 1)] = jnp.zeros((1, r, c), dtype)
        pltpu.make_async_copy(obuf.at[pl.ds(0, 1)],
                              out_hbm.at[pl.ds(0, 1)], osems.at[0]).start()
        pltpu.make_async_copy(obuf.at[pl.ds(0, 1)],
                              out_hbm.at[pl.ds(0, 1)], osems.at[0]).wait()
        obuf[pl.ds(1, 1)] = jnp.zeros((1, r, c), dtype)
        pltpu.make_async_copy(obuf.at[pl.ds(1, 1)],
                              out_hbm.at[pl.ds(p - 1, 1)],
                              osems.at[1]).start()
        pltpu.make_async_copy(obuf.at[pl.ds(1, 1)],
                              out_hbm.at[pl.ds(p - 1, 1)],
                              osems.at[1]).wait()

    scratch = [
        pltpu.VMEM((_S, r, c), dtype),              # u plane ring
        # Red-updated ring for the RB-GS pipeline; minimal dummy (Mosaic
        # still allocates declared scratch) for the one-stage kernels.
        pltpu.VMEM((3, r, c) if extra_ring else (1, 8, 128), dtype),
        pltpu.VMEM((3, r, c), dtype),               # b plane ring
        pltpu.VMEM((2, r, c), dtype),               # output double buffer
        pltpu.SemaphoreType.DMA((_S,)),
        pltpu.SemaphoreType.DMA((3,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, u, b):
        nnz = 7 * n * n * n
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((p, r, c), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz, transcendentals=0,
                bytes_accessed=3 * p * r * c * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, u, b)

    return call


def _ring(ubuf, g):
    return ubuf[jnp.int32(g) % _S]


@functools.lru_cache(maxsize=None)
def _residual_call(n: int, p: int, r: int, c: int, h: float,
                   dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(g, ubuf, rbuf, bbuf, sigma):
        zm = _ring(ubuf, g)
        au = (6.0 * zm - _nsum(_ring(ubuf, g - 1), zm,
                               _ring(ubuf, g + 1))) * inv_h2
        vals = bbuf[jnp.int32(g) % 3] - au + sigma * zm
        return jnp.where(_interior_mask(n, zm.shape), vals,
                         jnp.zeros_like(zm))

    return _make_plane_kernel(compute, n, p, r, c, dtype, extra_ring=False)


@functools.lru_cache(maxsize=None)
def _jacobi_call(n: int, p: int, r: int, c: int, h: float, omega: float,
                 dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)

    def compute(g, ubuf, rbuf, bbuf, sigma):
        zm = _ring(ubuf, g)
        au = (6.0 * zm - _nsum(_ring(ubuf, g - 1), zm,
                               _ring(ubuf, g + 1))) * inv_h2
        res = bbuf[jnp.int32(g) % 3] - au + sigma * zm
        vals = zm + (omega / (6.0 * inv_h2 - sigma)) * res
        return jnp.where(_interior_mask(n, zm.shape), vals, zm)

    return _make_plane_kernel(compute, n, p, r, c, dtype, extra_ring=False)


@functools.lru_cache(maxsize=None)
def _rbgs_call(n: int, p: int, r: int, c: int, h: float, dtype_name: str):
    """One full red+black GS sweep in one HBM pass (two-color pipeline).

    rbuf holds *red-updated* planes (red points updated, black original).
    At iteration g:
      1. red-update plane g+1 from ORIGINAL flanking planes — a red
         point's 6 neighbors are all black, and no black point has been
         touched yet, so original values are exactly what sequential GS
         reads. z-neighbors: rbuf[g] suffices for z-1 (its black points
         are original) and the ubuf ring for z+1.
      2. black-update plane g from rbuf planes g-1, g, g+1 — a black
         point's neighbors are all red, all red-updated by now: exact
         reference sweep order (red sweep, then black sweep).
    The iteration-0 step primes rbuf[1] before entering the loop... the
    prologue red-updates plane 1 (rbuf slot 1) so the first body
    iteration only runs stage 1 for plane 2 and stage 2 for plane 1.
    """
    dtype = jnp.dtype(dtype_name)
    h2 = h * h

    def red_update(g, ubuf, rbuf, bbuf, sigma):
        """Red-updated plane g (black points keep original values)."""
        inv_den = 1.0 / (6.0 - sigma * h2)
        zm = _ring(ubuf, g)
        gs = (h2 * bbuf[jnp.int32(g) % 3]
              + _nsum(rbuf[jnp.int32(g - 1) % 3], zm,
                      _ring(ubuf, g + 1))) * inv_den
        return jnp.where(_color_mask(n, g, zm.shape, 0), gs, zm)

    def compute(g, ubuf, rbuf, bbuf, sigma):
        # Stage 1: red-update plane g+1 (for g+1 <= n; the ghost plane
        # n+1 must stay all-zero, and red_update of it would leave
        # non-zero garbage at unmasked points — write zeros instead).
        @pl.when(g + 1 <= n)
        def _():
            rbuf[pl.ds(jnp.int32(g + 1) % 3, 1)] = red_update(
                g + 1, ubuf, rbuf, bbuf, sigma).reshape(
                    1, *ubuf.shape[1:])

        @pl.when(g + 1 > n)
        def _():
            rbuf[pl.ds(jnp.int32(g + 1) % 3, 1)] = jnp.zeros(
                (1,) + tuple(ubuf.shape[1:]), dtype)

        # Stage 2: black-update plane g from the red-updated ring.
        inv_den = 1.0 / (6.0 - sigma * h2)
        zm = rbuf[jnp.int32(g) % 3]
        gs = (h2 * bbuf[jnp.int32(g) % 3]
              + _nsum(rbuf[jnp.int32(g - 1) % 3], zm,
                      rbuf[jnp.int32(g + 1) % 3])) * inv_den
        return jnp.where(_color_mask(n, g, zm.shape, 1), gs, zm)

    def prime(g, ubuf, rbuf, bbuf, sigma):
        """Prologue stage: rbuf[g-1] (zero ghost) + red-update plane 1."""
        rbuf[pl.ds(0, 1)] = jnp.zeros((1,) + tuple(ubuf.shape[1:]), dtype)
        rbuf[pl.ds(1, 1)] = red_update(
            jnp.int32(1), ubuf, rbuf, bbuf, sigma).reshape(
                1, *ubuf.shape[1:])

    def compute_with_prime(g, ubuf, rbuf, bbuf, sigma):
        @pl.when(g == 1)
        def _():
            prime(g, ubuf, rbuf, bbuf, sigma)

        return compute(g, ubuf, rbuf, bbuf, sigma)

    return _make_plane_kernel(compute_with_prime, n, p, r, c, dtype,
                              extra_ring=True)


def _sigma_arr(sigma, dtype):
    return jnp.asarray(sigma, dtype=dtype).reshape(1, 1)


def residual(u: jax.Array, b: jax.Array, n: int, h: float,
             sigma=0.0) -> jax.Array:
    """r = b - (A - sigma I) u in one pass (aligned3 grids)."""
    p, r, c = u.shape
    call = _residual_call(n, p, r, c, float(h), jnp.dtype(u.dtype).name)
    return call(_sigma_arr(sigma, u.dtype), u, b)


def jacobi_sweep(u: jax.Array, b: jax.Array, n: int, h: float,
                 omega: float, sigma=0.0, sweeps: int = 1) -> jax.Array:
    """Weighted-Jacobi sweeps, one HBM pass each (aligned3 grids)."""
    p, r, c = u.shape
    call = _jacobi_call(n, p, r, c, float(h), float(omega),
                        jnp.dtype(u.dtype).name)
    s = _sigma_arr(sigma, u.dtype)
    for _ in range(sweeps):
        u = call(s, u, b)
    return u


def rbgs_sweep(u: jax.Array, b: jax.Array, n: int, h: float,
               sigma=0.0, sweeps: int = 1) -> jax.Array:
    """Full red+black GS sweeps, ONE HBM pass each (aligned3 grids)."""
    p, r, c = u.shape
    call = _rbgs_call(n, p, r, c, float(h), jnp.dtype(u.dtype).name)
    s = _sigma_arr(sigma, u.dtype)
    for _ in range(sweeps):
        u = call(s, u, b)
    return u
