"""Whole-leg fused Pallas kernels: one HBM pass per V-cycle leg.

A V-cycle level has exactly two data-flow legs (SURVEY.md §3.1):

  down:  u  -> smooth^nu1 -> residual -> restrict -> r_c
  up:    e_c -> prolong -> correct -> smooth^nu2  -> u'

Each leg is a chain of stencils over the same grid, so executing it as
separate kernels (even the pairwise-fused ones in stencil2d/transfer2d)
re-streams the full fine grid through HBM once per link. These kernels run
the ENTIRE leg per row tile while it sits in VMEM:

* `smooth_residual_restrict` — nu1 smoother sweeps, the residual, and
  full-weighting restriction in one pass: reads u, b; writes the smoothed
  u AND the quarter-size coarse RHS. ~2.4N HBM traffic vs ~5.25N for
  smooth + fused residual_restrict.

* `prolong_add_smooth` — bilinear interpolation of the coarse correction,
  the add, and nu2 smoother sweeps in one pass: reads x, e (quarter-size),
  b; writes x'. ~3.5N vs ~5.25N.

Correctness under tiling relies on halo staleness analysis: a red-black
sweep invalidates 2 rows per sweep inward from a tile edge (Jacobi: 1), the
residual one more, full-weighting one more. The loaded halo (8 rows for the
down leg, 16 for the up leg — 16 also keeps the coarse DMA windows 8-row
aligned) must cover 2*nu + 2, which bounds the sweeps a single invocation
can fuse (`max_down_sweeps`/`max_up_sweeps`); the backend composes longer
schedules from the unfused kernels.

Cross-resolution access inside a tile uses the same MXU selection/
interpolation-matrix tricks as transfer2d.py (Mosaic has no strided lane
access); the shift sigma rides in SMEM as in stencil2d.py. Layouts,
alignment rules, and the double-buffered DMA pipeline are as in
stencil2d.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _gs_vals, _interpret, _neighbors, _residual_vals

# Tile sizes are VMEM-budgeted: scratch buffers plus ~6 Mosaic stack
# temporaries of (window x width) must fit the ~16 MB VMEM at the 4095^2
# level (width 4224 fp32 = 16.9 KB/row) — measured, not guessed: T_DN=96
# (112-row windows) compiles to a 22.4 MB footprint and is rejected even
# with the masks scoped tightly; T_DN=64 (80-row windows) fits.
_HALO_DN = 8      # down-leg halo rows per side
_HALO_UP = 8      # up-leg halo rows per side
_T_DN = 64        # down-leg output rows per tile (multiple of 16)
_T_UP = 48        # up-leg output rows per tile (multiple of 16)


def max_down_sweeps(kind: str) -> int:
    """Sweeps one smooth_residual_restrict invocation can fuse."""
    return (_HALO_DN - 2) // 2 if kind == "rbgs" else _HALO_DN - 2


def max_up_sweeps(kind: str) -> int:
    """Sweeps one prolong_add_smooth invocation can fuse."""
    return _HALO_UP // 2 if kind == "rbgs" else _HALO_UP


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _imask(n, grow, gcol):
    return (grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n)


def _masks(n, ps, shape):
    """(interior, red) boolean masks for a window starting at global row
    ps. Built in one scope so the fat int32 iotas die immediately —
    keeping them live through the sweeps is pure VMEM-stack waste."""
    grow = ps + _iota2(shape, 0)
    gcol = _iota2(shape, 1)
    interior = (grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n)
    red = ((grow + gcol) % 2) == 0
    return interior, red


def _smooth_tile(u, b, sigma, interior, red, h2, kind, omega, sweeps):
    """nu masked smoother sweeps on a full tile (edges go stale inward)."""
    if kind == "rbgs":
        inv_den = 1.0 / (4.0 - sigma * h2)
        redm = interior & red
        blackm = interior & (~red)
        for _ in range(sweeps):
            u = jnp.where(redm, _gs_vals(u, b, inv_den, h2), u)
            u = jnp.where(blackm, _gs_vals(u, b, inv_den, h2), u)
    else:
        inv_h2 = 1.0 / h2
        for _ in range(sweeps):
            res = _residual_vals(u, b, inv_h2, sigma)
            u = jnp.where(interior, u + (omega / (4.0 * inv_h2 - sigma))
                          * res, u)
    return u


# ---------------------------------------------------------------------------
# Down leg: smooth^nu1 -> residual -> restrict, one pass.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _down_call(n: int, nc: int, r: int, c: int, rc: int, cc: int, h: float,
               kind: str, omega: float, sweeps: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    h2 = h * h
    inv_h2 = 1.0 / h2
    t = min(_T_DN, r)
    lt = min(t + 2 * _HALO_DN, r)
    nt = -(-r // t)
    tc = t // 2                      # coarse output rows per tile
    assert rc >= r // 2, (n, r, rc)
    nb = c // 256                    # full 256->128 lane blocks
    rem = (c % 256) // 128

    # Tiles cover coarse rows [0, r//2); aligned coarse grids can have up
    # to 8 more pad rows, which must come back zero (pad invariant).
    zr = rc - r // 2

    def kernel(sigma_ref, u_hbm, b_hbm, u_out, rc_out, ubuf, bbuf, obuf,
               cbuf, zbuf, in_sems, out_sems, z_sem):
        sigma = sigma_ref[0, 0]
        if zr > 0:
            zbuf[:, :] = jnp.zeros((zr, cc), dtype)
            zcp = pltpu.make_async_copy(
                zbuf, rc_out.at[pl.ds(r // 2, zr), :], z_sem)
            zcp.start()

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - _HALO_DN, 0, r - lt)
            return pl.multiple_of(oo, 16), pl.multiple_of(ps, 8)

        def in_copies(i, slot):
            _, ps = offsets(i)
            return (
                pltpu.make_async_copy(u_hbm.at[pl.ds(ps, lt), :],
                                      ubuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(ps, lt), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
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
            interior, red = _masks(n, ps, (lt, c))
            u = _smooth_tile(ubuf[slot], bbuf[slot], sigma, interior, red,
                             h2, kind, omega, sweeps)

            # Park the smoothed window in obuf right away (the slot's
            # previous DMA must have drained first) so its live range ends
            # here instead of spanning the restriction below.
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    u_out.at[pl.ds(0, t), :], out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()

            obuf[slot, :, :] = u

            # Residual on the smoothed window (stale only within
            # 2*sweeps+1 rows of the window edge, which the restriction
            # below never reads for its valid coarse rows).
            res = _residual_vals(obuf[slot], bbuf[slot], inv_h2, sigma)
            res = jnp.where(interior, res, jnp.zeros_like(res))

            # Row full-weighting at every window row.
            tvals = (0.25 * pltpu.roll(res, 1, 0) + 0.5 * res
                     + 0.25 * pltpu.roll(res, lt - 1, 0))

            # Coarse row extraction: local coarse q (global jc = oo//2 + q)
            # reads window row 2*jc - ps. Dynamic offsets -> 0/1 selection
            # matrix on the MXU (transfer2d.py pattern).
            co = oo - ps
            qsel = (_iota2((tc, lt), 1)
                    == co + 2 * _iota2((tc, lt), 0)).astype(dtype)
            rows_c = jax.lax.dot_general(
                qsel, tvals, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST).astype(dtype)

            scol = (0.25 * pltpu.roll(rows_c, 1, 1) + 0.5 * rows_c
                    + 0.25 * pltpu.roll(rows_c, c - 1, 1))
            esel = (_iota2((256, 128), 0)
                    == 2 * _iota2((256, 128), 1)).astype(dtype)
            # oo is a multiple of 16, so oo//2 is a multiple of 8 — Mosaic
            # can't derive that through the division, hence the hint.
            jc0 = pl.multiple_of(oo // 2, 8)
            gjc = jc0 + _iota2((tc, 128), 0)

            for blk in range(nb + rem):
                w = 256 if blk < nb else 128
                seg = scol[:, blk * 256: blk * 256 + w]
                sel = esel[:w, : w // 2]
                ext = jax.lax.dot_general(
                    seg, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                    precision=jax.lax.Precision.HIGHEST).astype(dtype)
                gcc = blk * 128 + _iota2((tc, w // 2), 1)
                cmask = ((gjc[:, : w // 2] >= 1) & (gjc[:, : w // 2] <= nc)
                         & (gcc >= 1) & (gcc <= nc))
                cbuf[slot, :, blk * 128: blk * 128 + w // 2] = jnp.where(
                    cmask, ext, jnp.zeros_like(ext))
            filled = 128 * nb + 64 * rem
            if filled < cc:
                cbuf[slot, :, filled:] = jnp.zeros((tc, cc - filled), dtype)

            pltpu.make_async_copy(
                obuf.at[slot, pl.ds(pl.multiple_of(co, 8), t), :],
                u_out.at[pl.ds(oo, t), :], out_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                cbuf.at[slot], rc_out.at[pl.ds(jc0, tc), :],
                out_sems.at[slot, 1]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                slot = (nt - 1 - j) % 2
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    u_out.at[pl.ds(0, t), :], out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)
        if zr > 0:
            zcp.wait()

    scratch = [
        pltpu.VMEM((2, lt, c), dtype),        # ubuf
        pltpu.VMEM((2, lt, c), dtype),        # bbuf
        pltpu.VMEM((2, lt, c), dtype),        # obuf (smoothed u window)
        pltpu.VMEM((2, tc, cc), dtype),       # cbuf (coarse rows)
        pltpu.VMEM((max(zr, 8), cc), dtype),  # zbuf (coarse pad-row zeros)
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]

    def call(sigma_arr, u, b):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((r, c), dtype),
                       jax.ShapeDtypeStruct((rc, cc), dtype)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=(12 * sweeps + 17) * n * n, transcendentals=0,
                bytes_accessed=(3 * r * c + rc * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, u, b)

    return call


def smooth_residual_restrict(u: jax.Array, b: jax.Array, n: int, h: float,
                             *, kind: str, omega: float, sweeps: int,
                             sigma=0.0):
    """(smooth^sweeps(u), restrict(b - A u')) in ONE HBM pass.

    Aligned-layout grids; requires sweeps <= max_down_sweeps(kind).
    """
    from ..grids import aligned_shape

    assert 0 <= sweeps <= max_down_sweeps(kind)
    nc = (n - 1) // 2
    r, c = u.shape
    rc, cc = aligned_shape(nc)
    call = _down_call(n, nc, r, c, rc, cc, float(h), kind, float(omega),
                      sweeps, jnp.dtype(u.dtype).name)
    sig = jnp.asarray(sigma, dtype=u.dtype).reshape(1, 1)
    return call(sig, u, b)


# ---------------------------------------------------------------------------
# Up leg: prolong -> correct -> smooth^nu2, one pass.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _up_call(n: int, nc: int, r: int, c: int, rc: int, cc: int, h: float,
             kind: str, omega: float, sweeps: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    h2 = h * h
    t = min(_T_UP, r)
    ltf = min(t + 2 * _HALO_UP, r)     # fine window rows
    ltc = min(t // 2 + 2 * _HALO_UP, rc)  # coarse window rows
    nt = -(-r // t)
    # Coverage of the coarse reads (see offsets()): every interior fine row
    # f in a window finds coarse rows (f +- 1)//2 inside the coarse window.
    # Proven for ltc = t//2 + 2*_HALO_UP given rc >= r//2, which holds for
    # all aligned_shape pairs (16-row rounding).
    assert rc >= r // 2, (n, r, rc)

    def kernel(sigma_ref, x_hbm, e_hbm, b_hbm, out_hbm, xbuf, bbuf, ebuf,
               rbuf, obuf, in_sems, out_sems):
        sigma = sigma_ref[0, 0]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            pf = jnp.clip(oo - _HALO_UP, 0, r - ltf)
            # Coarse window: chosen independently of pf (the in-kernel
            # interpolation matrix takes dynamic offsets), so it only
            # needs its own 8-row alignment. Coverage of every coarse row
            # (f +- 1)//2, f in [pf, pf + ltf), holds for ltc = t//2 + 16
            # because rc <= r//2 + 8 for all aligned_shape pairs.
            pc = jnp.clip(oo // 2 - _HALO_UP, 0, rc - ltc)
            return (pl.multiple_of(oo, 16), pl.multiple_of(pf, 8),
                    pl.multiple_of(pc, 8))

        def in_copies(i, slot):
            _, pf, pc = offsets(i)
            return (
                pltpu.make_async_copy(x_hbm.at[pl.ds(pf, ltf), :],
                                      xbuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[pl.ds(pf, ltf), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
                pltpu.make_async_copy(e_hbm.at[pl.ds(pc, ltc), :],
                                      ebuf.at[slot], in_sems.at[slot, 2]),
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
            oo, pf, pc = offsets(i)

            # Row interpolation straight to the fine window's rows: local
            # fine t0 (global f = pf + t0) takes coarse global f//2 (f
            # even) or the mean of (f-1)/2 and (f+1)/2 (f odd); coarse
            # global jc sits at window position jc - pc. Dynamic offsets ->
            # interpolation matrix from iotas, contracted on the MXU.
            t0 = _iota2((ltf, ltc), 0)
            q = _iota2((ltf, ltc), 1)
            f = pf + t0
            jq = pc + q
            even = (f % 2) == 0
            rsel = (jnp.where(even & (2 * jq == f), 1.0, 0.0)
                    + jnp.where((~even) & ((2 * jq == f - 1)
                                           | (2 * jq == f + 1)), 0.5, 0.0)
                    ).astype(dtype)
            rows_f = jax.lax.dot_general(
                rsel, ebuf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST).astype(dtype)

            # Column interpolation, 128 coarse -> 256 fine lanes per block
            # (transfer2d.py pattern; rolled input feeds the cross-block
            # neighbor term).
            m = _iota2((128, 256), 0)
            g = _iota2((128, 256), 1)
            m1 = ((g == 2 * m).astype(dtype)
                  + 0.5 * (g == 2 * m + 1).astype(dtype)
                  + 0.5 * (g == 2 * m - 1).astype(dtype))
            m2 = 0.5 * ((m == 127) & (g == 255)).astype(dtype)
            cs = pltpu.roll(rows_f, cc - 1, 1)
            interior, red = _masks(n, pf, (ltf, c))
            w = xbuf[slot]
            for blk in range(cc // 128):
                lo = blk * 256
                wdt = min(256, c - lo)
                if wdt <= 0:
                    break
                seg = rows_f[:, blk * 128:(blk + 1) * 128]
                segs = cs[:, blk * 128:(blk + 1) * 128]
                pe = (jax.lax.dot_general(
                          seg, m1, (((1,), (0,)), ((), ())),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST)
                      + jax.lax.dot_general(
                          segs, m2, (((1,), (0,)), ((), ())),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST))
                rbuf[:, lo:lo + wdt] = pe[:, :wdt].astype(dtype)
            w = jnp.where(interior, w + rbuf[:, :], w)

            # nu2 smoother sweeps on the corrected window.
            w = _smooth_tile(w, bbuf[slot], sigma, interior, red, h2, kind,
                             omega, sweeps)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    out_hbm.at[pl.ds(0, t), :], out_sems.at[slot]).wait()

            obuf[slot, :, :] = w
            pltpu.make_async_copy(
                obuf.at[slot, pl.ds(pl.multiple_of(oo - pf, 8), t), :],
                out_hbm.at[pl.ds(oo, t), :], out_sems.at[slot]).start()
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
        pltpu.VMEM((2, ltf, c), dtype),       # xbuf
        pltpu.VMEM((2, ltf, c), dtype),       # bbuf
        pltpu.VMEM((2, ltc, cc), dtype),      # ebuf
        pltpu.VMEM((ltf, c), dtype),          # rbuf (interpolated P e)
        pltpu.VMEM((2, ltf, c), dtype),       # obuf
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, x, e, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, c), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=(12 * sweeps + 4) * n * n, transcendentals=0,
                bytes_accessed=(3 * r * c + rc * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, x, e, b)

    return call


def prolong_add_smooth(x: jax.Array, e: jax.Array, b: jax.Array, n: int,
                       nc: int, h: float, *, kind: str, omega: float,
                       sweeps: int, sigma=0.0) -> jax.Array:
    """smooth^sweeps(x + P e) in ONE HBM pass (aligned grids).

    Requires sweeps <= max_up_sweeps(kind).
    """
    assert 0 <= sweeps <= max_up_sweeps(kind)
    r, c = x.shape
    rc, cc = e.shape
    call = _up_call(n, nc, r, c, rc, cc, float(h), kind, float(omega),
                    sweeps, jnp.dtype(x.dtype).name)
    sig = jnp.asarray(sigma, dtype=x.dtype).reshape(1, 1)
    return call(sig, x, e, b)
