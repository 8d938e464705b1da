"""COLOR-PACKED shard-local whole-leg kernels (VERDICT.md round-4 item 1).

The aligned whole-leg shard kernels (kernels/local2d.py) evaluate both
Gauss-Seidel colors full-width and mask — ~2x the VPU work the
color-packed layout (kernels/packed2d.py) eliminates. This module fuses
the two designs: each V-cycle leg of a SHARDED fine level runs as ONE
Pallas kernel over the halo-extended tile (local2d's ext-coordinate
ownership algebra, SMEM global offsets, ghost overlap-recompute), with
the tile stored COLOR-PACKED (packed2d's half-width red/black planes and
rolls-plus-parity-select neighbor algebra).

Packed extended layout. An aligned extended tile ``ua`` (rows ext by
HALO_ROWS per side, cols ext too on block decompositions) is stored as
``(2, r, cp)`` planes with

    P0[p, jj] = ua[p, 2*jj + s(p)]     (red: global i + j even)
    P1[p, jj] = ua[p, 2*jj + 1 - s(p)] (black)

The packing parity is STATIC in extended coordinates: the global indices
of ext (row 0, lane 0) are row_off = d*m + 1 - hh (always ODD — m even,
hh = 8) and col_off = d'*mcol + 1 - hh (ODD when columns are sharded, 0
when they carry the global padding), so

    s(p) = (gi + gcol0) % 2 = (p + 1 + cpar) % 2,   cpar = col_off % 2,

i.e. s alternates with p with a per-decomposition static phase. All of
packed2d's neighbor algebra carries over with its ``even`` argument
generalized to ``seven = (s == 0)`` (for a single device / row
decomposition s == gi % 2, so seven == "global row even" — the packed2d
convention, verbatim).

Cross-resolution lane algebra (the payoff — derived from the local2d
ownership formulas, device index cancelled):

* rows decomposition (cols unsharded): the fine center of coarse column
  J is global col 2J = packed lane J — coarse lanes ARE packed lanes
  (packed2d's observation), so the down leg needs NO lane extraction at
  all and the up leg's column interpolation is the packed2d roll
  algebra.
* block decomposition (cols in ext convention): coarse ext lane sc has
  global col gc = ccol0 + sc with ccol0 = (col_off - 7)/2; the fine
  center's packed lane is jj = gc - (col_off + 1)/2 = sc - 4 — a STATIC
  lane shift of 4, i.e. one pltpu.roll, replacing the aligned path's
  256<->128 MXU lane-selection matmuls entirely (the bulk of the
  block-mesh kernel tax measured in BASELINE.md round-4).

Both legs exchange coarse data in the ALIGNED extended convention of
local2d (the down leg emits it, the up leg consumes it), so every
coarser level runs the existing aligned whole-leg kernels unchanged and
exactly one level is packed — the measured optimum of the single-device
tier (kernels/__init__.py PACK_MIN_N notes).

Mixed precision: same _cdt rule as packed2d/local2d — sub-32-bit tiles
are widened to f32 in registers, the coarse RHS is emitted at f32, and
``out_dtype`` lets a preconditioner's top level emit f32. Here bf16
actually pays: the packed sweeps are HBM-bound (the whole reason to
pack), so halving the bytes halves the bottleneck (BASELINE.md round-3:
2.75x on the single-device packed sweep).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused2d import _iota2
from .packed2d import (_VMEM_LIMIT, _black_neighbor_sum, _cdt,
                       _red_neighbor_sum, _smooth_window, packed_width)
from .stencil2d import _interpret
from .local2d import (HALO_ROWS, _halos, _offs, _scal, ext_rows,
                      max_down_sweeps, max_up_sweeps)

_T_DN = 64        # down-leg fine output rows per tile (multiple of 16)
_T_UP = 48        # up-leg fine output rows per tile (multiple of 16)


# ---------------------------------------------------------------------------
# Host-side layout transforms (once per solve — the ext twin of
# packed2d.pack/unpack, with the static ext-coordinate parity phase).
# ---------------------------------------------------------------------------

def pack_ext(ua: jax.Array, cpar: int) -> jax.Array:
    """Aligned extended (r, c) -> color-packed (2, r, packed_width(c)).

    ``cpar``: parity of the tile's global column offset (0 for row
    decompositions, 1 for block decompositions — col_off is odd)."""
    r, c = ua.shape
    cpp = packed_width(c)
    s0 = (1 + cpar) % 2                   # s(p) at even ext rows p
    red = jnp.zeros((r, cpp), dtype=ua.dtype)
    red = red.at[0::2, : c // 2].set(ua[0::2, s0::2])
    red = red.at[1::2, : c // 2].set(ua[1::2, 1 - s0::2])
    blk = jnp.zeros((r, cpp), dtype=ua.dtype)
    blk = blk.at[0::2, : c // 2].set(ua[0::2, 1 - s0::2])
    blk = blk.at[1::2, : c // 2].set(ua[1::2, s0::2])
    return jnp.stack([red, blk])


def unpack_ext(s: jax.Array, c: int, cpar: int) -> jax.Array:
    """Color-packed (2, r, cpp) -> aligned extended (r, c)."""
    _, r, _ = s.shape
    s0 = (1 + cpar) % 2
    ua = jnp.zeros((r, c), dtype=s.dtype)
    ua = ua.at[0::2, s0::2].set(s[0, 0::2, : c // 2])
    ua = ua.at[1::2, 1 - s0::2].set(s[0, 1::2, : c // 2])
    ua = ua.at[0::2, 1 - s0::2].set(s[1, 0::2, : c // 2])
    ua = ua.at[1::2, s0::2].set(s[1, 1::2, : c // 2])
    return ua


# ---------------------------------------------------------------------------
# Masks. Global offsets are traced (SMEM scalars, as in local2d); the
# parity masks they produce are static-valued per decomposition but are
# computed from the traced values — correctness never depends on the
# static-parity argument, only the layout convention does.
# ---------------------------------------------------------------------------

def _masks_ext(n, grow0, gcol0, ps, shape):
    """(geven, seven, mask_r, mask_b) for a packed window whose local ext
    row 0 sits at window offset ps; (grow0, gcol0) are the global indices
    of the tile's ext (row 0, aligned lane 0)."""
    gi = grow0 + ps + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    s = (gi + gcol0) % 2
    jr = gcol0 + 2 * jj + s               # global col of P0[p, jj]
    jb = gcol0 + 2 * jj + 1 - s           # global col of P1[p, jj]
    rows = (gi >= 1) & (gi <= n)
    mask_r = rows & (jr >= 1) & (jr <= n)
    mask_b = rows & (jb >= 1) & (jb <= n)
    geven = (gi % 2) == 0
    seven = s == 0
    return geven, seven, mask_r, mask_b


def _residual_planes(red, blk, b_r, b_b, seven, mask_r, mask_b, inv_h2,
                     sigma):
    res_r = b_r - (4.0 * red - _red_neighbor_sum(blk, seven)) * inv_h2 \
        + sigma * red
    res_b = b_b - (4.0 * blk - _black_neighbor_sum(red, seven)) * inv_h2 \
        + sigma * blk
    return (jnp.where(mask_r, res_r, jnp.zeros_like(res_r)),
            jnp.where(mask_b, res_b, jnp.zeros_like(res_b)))


# ---------------------------------------------------------------------------
# Packed shard-local residual (solve-loop convergence checks, PCG apply).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _residual_call(n: int, r: int, cp: int, h: float, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    inv_h2 = 1.0 / (h * h)
    h_lo, _, _ = _halos(dtype)
    if r <= _T_DN + 2 * h_lo:
        t, lt, nt = r, r, 1
    else:
        t, lt, nt = _T_DN, _T_DN + 2 * h_lo, -(-r // _T_DN)

    def kernel(sigma_ref, off_ref, u_hbm, b_hbm, out_hbm, ubuf, bbuf, obuf,
               in_sems, out_sems):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - h_lo, 0, r - lt)
            return pl.multiple_of(oo, 8), pl.multiple_of(ps, h_lo)

        def in_copies(i, slot):
            _, ps = offsets(i)
            return (
                pltpu.make_async_copy(u_hbm.at[:, pl.ds(ps, lt), :],
                                      ubuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[:, pl.ds(ps, lt), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
            )

        for cpy in in_copies(0, 0):
            cpy.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                for cpy in in_copies(i + 1, nxt):
                    cpy.start()

            for cpy in in_copies(i, slot):
                cpy.wait()
            oo, ps = offsets(i)
            _, seven, mask_r, mask_b = _masks_ext(n, grow0, gcol0, ps,
                                                  (lt, cp))
            res_r, res_b = _residual_planes(
                ubuf[slot, 0].astype(cdt), ubuf[slot, 1].astype(cdt),
                bbuf[slot, 0].astype(cdt), bbuf[slot, 1].astype(cdt),
                seven, mask_r, mask_b, inv_h2, sigma)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            co = pl.multiple_of(oo - ps, 8)
            obuf[slot, 0, :, :] = res_r.astype(dtype)
            obuf[slot, 1, :, :] = res_b.astype(dtype)
            pltpu.make_async_copy(
                obuf.at[slot, :, pl.ds(co, t), :],
                out_hbm.at[:, pl.ds(oo, t), :], out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, u, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, r, cp), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=10 * r * cp, transcendentals=0,
                bytes_accessed=3 * 2 * r * cp * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u, b)

    return call


def residual(s: jax.Array, bs: jax.Array, n: int, h: float, row_off,
             col_off=0, sigma=0.0) -> jax.Array:
    """r = b - (A - sigma I) u on a packed halo-extended tile (zero
    outside the global interior)."""
    _, r, cp = s.shape
    call = _residual_call(n, r, cp, float(h), jnp.dtype(s.dtype).name)
    return call(_scal(sigma, _cdt(s.dtype)), _offs(row_off, col_off),
                s, bs)


# ---------------------------------------------------------------------------
# Packed down leg: smooth^nu1 -> residual -> restrict, one HBM pass.
# Coarse RHS out in local2d's ALIGNED extended convention.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _down_leg_call(n: int, nc: int, m: int, r: int, cp: int, cc: int,
                   h: float, kind: str, omega: float, sweeps: int,
                   dtype_name: str, mcol: int = 0):
    col_ext = mcol > 0
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    h_lo, h_hi, _ = _halos(dtype)
    h2 = h * h
    inv_h2 = 1.0 / h2
    rcr = ext_rows(m // 2)               # coarse output in EXT layout
    if r <= _T_DN + h_lo + h_hi:
        t, lt, nt = r, r, 1
    else:
        t = _T_DN
        lt = t + h_lo + h_hi
        nt = -(-r // t)
    tc = t // 2
    mc = m // 2
    mc2 = mcol // 2
    hh = HALO_ROWS
    zr_far = rcr - (r // 2 + hh)

    def kernel(sigma_ref, off_ref, u_hbm, b_hbm, u_out, rc_out,
               ubuf, bbuf, obuf, cbuf, zbuf, in_sems, out_sems, z_sem):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]

        zbuf[:, :] = jnp.zeros((hh, cc), cdt)
        zcp0 = pltpu.make_async_copy(
            zbuf, rc_out.at[pl.ds(0, hh), :], z_sem)
        zcp0.start()
        zcp0.wait()
        if zr_far > 0:
            zcp1 = pltpu.make_async_copy(
                zbuf.at[pl.ds(0, zr_far), :],
                rc_out.at[pl.ds(r // 2 + hh, zr_far), :], z_sem)
            zcp1.start()
            zcp1.wait()

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - h_lo, 0, r - lt)
            return pl.multiple_of(oo, 16), pl.multiple_of(ps, h_lo)

        def in_copies(i, slot):
            _, ps = offsets(i)
            return (
                pltpu.make_async_copy(u_hbm.at[:, pl.ds(ps, lt), :],
                                      ubuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[:, pl.ds(ps, lt), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
            )

        for cpy in in_copies(0, 0):
            cpy.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                for cpy in in_copies(i + 1, nxt):
                    cpy.start()

            for cpy in in_copies(i, slot):
                cpy.wait()
            oo, ps = offsets(i)
            geven, seven, mask_r, mask_b = _masks_ext(n, grow0, gcol0, ps,
                                                      (lt, cp))
            b_r = bbuf[slot, 0].astype(cdt)
            b_b = bbuf[slot, 1].astype(cdt)
            red, blk = _smooth_window(
                ubuf[slot, 0].astype(cdt), ubuf[slot, 1].astype(cdt),
                b_r, b_b, sigma, seven, mask_r, mask_b, h2, kind, omega,
                sweeps)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, :, pl.ds(0, t), :],
                    u_out.at[:, pl.ds(0, t), :],
                    out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()

            obuf[slot, 0, :, :] = red.astype(dtype)
            obuf[slot, 1, :, :] = blk.astype(dtype)

            # Residual of the STORED planes (mixed precision targets the
            # tile that actually goes up); full-weighting combine in
            # packed lane coordinates. With >= 1 closing RB-GS black
            # half-sweep, res_B == 0 exactly (the update solves the point
            # equation) — half the residual work and all res_B terms
            # vanish.
            rred = obuf[slot, 0].astype(cdt)
            rblk = obuf[slot, 1].astype(cdt)
            if kind == "rbgs" and sweeps >= 1:
                res_r = b_r - (4.0 * rred
                               - _red_neighbor_sum(rblk, seven)) * inv_h2 \
                    + sigma * rred
                res_r = jnp.where(mask_r, res_r, jnp.zeros_like(res_r))
                rr_r = pltpu.roll(res_r, cp - 1, 1)
                rl_r = pltpu.roll(res_r, 1, 1)
                a = jnp.where(geven, 4.0 * res_r,
                              res_r + jnp.where(seven, rr_r, rl_r))
            else:
                res_r, res_b = _residual_planes(
                    rred, rblk, b_r, b_b, seven, mask_r, mask_b, inv_h2,
                    sigma)
                rr_r = pltpu.roll(res_r, cp - 1, 1)
                rl_r = pltpu.roll(res_r, 1, 1)
                rr_b = pltpu.roll(res_b, cp - 1, 1)
                rl_b = pltpu.roll(res_b, 1, 1)
                a = jnp.where(
                    geven,
                    4.0 * res_r + 2.0 * (res_b
                                         + jnp.where(seven, rl_b, rr_b)),
                    2.0 * res_b + res_r + jnp.where(seven, rr_r, rl_r))
            comb = 0.0625 * (a + pltpu.roll(a, 1, 0)
                             + pltpu.roll(a, lt - 1, 0))

            # Coarse row extraction (local2d ext algebra): local coarse
            # ext row q0 + hh + qi centers at ext row 2*(q0 + qi) + hh + 1,
            # window coordinate wc + 2*qi.
            q0 = pl.multiple_of(oo // 2, 8)
            wc = 2 * q0 + hh + 1 - ps
            qsel = (_iota2((tc, lt), 1)
                    == wc + 2 * _iota2((tc, lt), 0)).astype(cdt)
            rows_c = jax.lax.dot_general(
                qsel, comb, (((1,), (0,)), ((), ())),
                preferred_element_type=cdt,
                precision=jax.lax.Precision.HIGHEST).astype(cdt)

            crow0 = (grow0 + hh + 1) // 2     # global jc of local q = 0
            gjc = crow0 + q0 + _iota2((tc, cc), 0)
            gq = q0 + _iota2((tc, cc), 0)
            if not col_ext:
                # rows decomposition: coarse ALIGNED lane == packed lane.
                gcc = _iota2((tc, cc), 1)
                cmask = ((gq < mc) & (gjc <= nc)
                         & (gcc >= 1) & (gcc <= nc))
                cbuf[slot, :, :] = jnp.where(cmask, rows_c[:, :cc],
                                             jnp.zeros((tc, cc), cdt))
            else:
                # block decomposition: coarse EXT lane sc reads packed
                # lane sc - 4 (static shift — see module notes). Ghost
                # and pad lanes masked to zero; the coarse level's
                # refresh exchanges them.
                shifted = pltpu.roll(rows_c, 4, 1)
                s_lane = _iota2((tc, cc), 1)
                ccol0 = (gcol0 - 7) // 2
                gcc = ccol0 + s_lane
                cmask = ((gq < mc) & (gjc <= nc)
                         & (s_lane >= hh) & (s_lane < hh + mc2)
                         & (gcc <= nc))
                cbuf[slot, :, :] = jnp.where(cmask, shifted[:, :cc],
                                             jnp.zeros((tc, cc), cdt))

            co = pl.multiple_of(oo - ps, 8)
            pltpu.make_async_copy(
                obuf.at[slot, :, pl.ds(co, t), :],
                u_out.at[:, pl.ds(oo, t), :], out_sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                cbuf.at[slot], rc_out.at[pl.ds(q0 + hh, tc), :],
                out_sems.at[slot, 1]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                slot = (nt - 1 - j) % 2
                pltpu.make_async_copy(
                    obuf.at[slot, :, pl.ds(0, t), :],
                    u_out.at[:, pl.ds(0, t), :],
                    out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, 2, lt, cp), dtype),    # ubuf
        pltpu.VMEM((2, 2, lt, cp), dtype),    # bbuf
        pltpu.VMEM((2, 2, lt, cp), dtype),    # obuf (smoothed planes)
        pltpu.VMEM((2, tc, cc), cdt),         # cbuf (coarse rows)
        pltpu.VMEM((hh, cc), cdt),            # zbuf (coarse ghost zeros)
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]

    def call(sigma_arr, off_arr, u, b):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((2, r, cp), dtype),
                       jax.ShapeDtypeStruct((rcr, cc), cdt)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=(6 * sweeps + 9) * r * cp, transcendentals=0,
                bytes_accessed=(3 * 2 * r * cp + rcr * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u, b)

    return call


def down_leg(s: jax.Array, bs: jax.Array, n: int, h: float, m: int,
             row_off, col_off=0, *, kind: str, omega: float, sweeps: int,
             sigma=0.0, mcol: int = 0):
    """(smooth^sweeps, residual, restrict) on a PACKED halo-extended
    shard tile in ONE kernel.

    s/bs: packed (2, r, cp) extended tiles; m: owned row count; n:
    GLOBAL fine interior size. Returns (u_smoothed_packed, rc_ext): the
    smoothed packed tile (ghosts STALE) and the coarse RHS in local2d's
    ALIGNED extended convention (shape (ext_rows(m/2), cc), owned rows
    at [HALO_ROWS, HALO_ROWS + m/2), ghost rows ZERO) — exactly what the
    aligned coarse machinery consumes."""
    from ..grids import aligned_shape

    assert 0 <= sweeps <= max_down_sweeps(kind), sweeps
    _, r, cp = s.shape
    assert r % 16 == 0, r
    nc = (n - 1) // 2
    if mcol:
        cc = -(-(mcol // 2 + 2 * HALO_ROWS) // 128) * 128
    else:
        cc = aligned_shape(nc)[1]
    assert cc <= cp, (cc, cp)
    call = _down_leg_call(n, nc, m, r, cp, cc, float(h), kind,
                          float(omega), sweeps,
                          jnp.dtype(s.dtype).name, mcol)
    return call(_scal(sigma, _cdt(s.dtype)), _offs(row_off, col_off),
                s, bs)


# ---------------------------------------------------------------------------
# Packed up leg: prolong (aligned-ext coarse) -> correct -> smooth^nu2.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _up_leg_call(n: int, nc: int, m: int, r: int, cp: int, rcr: int,
                 cc: int, h: float, kind: str, omega: float, sweeps: int,
                 dtype_name: str, out_dtype_name: str, mcol: int = 0):
    col_ext = mcol > 0
    dtype = jnp.dtype(dtype_name)
    odt = jnp.dtype(out_dtype_name)
    cdt = _cdt(dtype)
    _, _, h_up = _halos(dtype)
    h2 = h * h
    if r <= _T_UP + 2 * h_up:
        t, ltf, nt = r, r, 1
        ltc = rcr
    else:
        t = _T_UP
        ltf = t + 2 * h_up
        nt = -(-r // t)
        ltc = min(t // 2 + h_up + 16, rcr)

    def kernel(sigma_ref, off_ref, x_hbm, e_hbm, b_hbm, out_hbm,
               xbuf, bbuf, ebuf, gbuf, obuf, in_sems, out_sems):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            pf = jnp.clip(oo - h_up, 0, r - ltf)
            pc = jnp.clip(((pf // 2) // 8) * 8, 0, rcr - ltc)
            return (pl.multiple_of(oo, 16), pl.multiple_of(pf, h_up),
                    pl.multiple_of(pc, 8))

        def in_copies(i, slot):
            _, pf, pc = offsets(i)
            return (
                pltpu.make_async_copy(x_hbm.at[:, pl.ds(pf, ltf), :],
                                      xbuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[:, pl.ds(pf, ltf), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
                pltpu.make_async_copy(e_hbm.at[pl.ds(pc, ltc), :],
                                      ebuf.at[slot], in_sems.at[slot, 2]),
            )

        for cpy in in_copies(0, 0):
            cpy.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                for cpy in in_copies(i + 1, nxt):
                    cpy.start()

            for cpy in in_copies(i, slot):
                cpy.wait()
            oo, pf, pc = offsets(i)

            # Row interpolation in EXTENDED coordinates (the local2d
            # static mapping): fine ext row pp odd (global row EVEN —
            # row_off is odd) reads coarse ext row qq with pp = 2qq - 7;
            # pp even averages 2qq == pp + 6, pp + 8.
            pp = pf + _iota2((ltf, ltc), 0)
            qq = pc + _iota2((ltf, ltc), 1)
            podd = (pp % 2) == 1
            rsel = (jnp.where(podd & (2 * qq == pp + 7), 1.0, 0.0)
                    + jnp.where((~podd) & ((2 * qq == pp + 6)
                                           | (2 * qq == pp + 8)), 0.5, 0.0)
                    ).astype(cdt)
            g = jax.lax.dot_general(
                rsel, ebuf[slot].astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=cdt,
                precision=jax.lax.Precision.HIGHEST).astype(cdt)
            if cc < cp:
                gbuf[:, :cc] = g
                gbuf[:, cc:] = jnp.zeros((ltf, cp - cc), cdt)
            else:
                gbuf[:, :] = g
            gw = gbuf[:, :]

            geven, seven, mask_r, mask_b = _masks_ext(n, grow0, gcol0, pf,
                                                      (ltf, cp))
            if not col_ext:
                # rows: direct lane = G[jj] (fine even col 2jj), avg =
                # (G[jj] + G[jj+1]) / 2 — the packed2d lane algebra.
                direct = gw
                avg = 0.5 * (gw + pltpu.roll(gw, cp - 1, 1))
                # red direct at s == 0 (geven == seven here), black at
                # s == 1.
                corr_r = jnp.where(seven, direct, avg)
                corr_b = jnp.where(seven, avg, direct)
            else:
                # blocks: the +4 static lane shift (module notes); direct
                # lane = G[jj+4], avg = (G[jj+3] + G[jj+4]) / 2; red
                # direct at s == 1 (global col even there), black at
                # s == 0.
                g4 = pltpu.roll(gw, cp - 4, 1)
                g3 = pltpu.roll(gw, cp - 3, 1)
                avg = 0.5 * (g3 + g4)
                corr_r = jnp.where(seven, avg, g4)
                corr_b = jnp.where(seven, g4, avg)

            red = xbuf[slot, 0].astype(cdt)
            blk = xbuf[slot, 1].astype(cdt)
            red = jnp.where(mask_r, red + corr_r, red)
            blk = jnp.where(mask_b, blk + corr_b, blk)
            red, blk = _smooth_window(
                red, blk, bbuf[slot, 0].astype(cdt),
                bbuf[slot, 1].astype(cdt), sigma, seven, mask_r, mask_b,
                h2, kind, omega, sweeps)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            obuf[slot, 0, :, :] = red.astype(odt)
            obuf[slot, 1, :, :] = blk.astype(odt)
            pltpu.make_async_copy(
                obuf.at[slot, :, pl.ds(pl.multiple_of(oo - pf, 8), t), :],
                out_hbm.at[:, pl.ds(oo, t), :], out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, 2, ltf, cp), dtype),   # xbuf
        pltpu.VMEM((2, 2, ltf, cp), dtype),   # bbuf
        pltpu.VMEM((2, ltc, cc), cdt),        # ebuf (aligned-ext coarse)
        pltpu.VMEM((ltf, cp), cdt),           # gbuf (row-interp rows)
        pltpu.VMEM((2, 2, ltf, cp), odt),     # obuf
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, x, e, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, r, cp), odt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=(6 * sweeps + 3) * r * cp, transcendentals=0,
                bytes_accessed=(3 * 2 * r * cp + rcr * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, x, e, b)

    return call


def up_leg(x: jax.Array, e_ext: jax.Array, bs: jax.Array, n: int,
           nc: int, h: float, m: int, row_off, col_off=0, *, kind: str,
           omega: float, sweeps: int, sigma=0.0, out_dtype=None,
           mcol: int = 0) -> jax.Array:
    """smooth^sweeps(x + P e) on a PACKED halo-extended shard tile in ONE
    kernel.

    x/bs: packed (2, r, cp) extended tiles with EXACT ghosts; e_ext: the
    coarse correction in local2d's ALIGNED extended convention with
    EXACT ghosts (a refreshed aligned coarse output). Returns the packed
    smoothed tile (ghosts STALE). ``out_dtype`` widens the output store
    (mixed-precision top level — see local2d.up_leg)."""
    assert 0 <= sweeps <= max_up_sweeps(kind), sweeps
    _, r, cp = x.shape
    rcr, cc = e_ext.shape
    assert r % 16 == 0 and rcr == ext_rows(m // 2), (r, rcr, m)
    assert cc <= cp, (cc, cp)
    assert e_ext.dtype == _cdt(x.dtype), (e_ext.dtype, x.dtype)
    odt = jnp.dtype(out_dtype if out_dtype is not None else x.dtype)
    call = _up_leg_call(n, nc, m, r, cp, rcr, cc, float(h), kind,
                        float(omega), sweeps, jnp.dtype(x.dtype).name,
                        odt.name, mcol)
    return call(_scal(sigma, _cdt(x.dtype)), _offs(row_off, col_off),
                x, e_ext, bs)


# ---------------------------------------------------------------------------
# Fused residual NORM over the OWNED region: ||b - A u||^2 straight from
# the packed extended tiles — no residual array materialized (2 HBM read
# passes, zero writes; the packed2d residual_norm_sq pattern with the
# shard ownership masks). red_only=True is exact right after an RB-GS
# cycle (the closing black half-sweep zeroes the black residual).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _resnorm_call(n: int, r: int, cp: int, m: int, mcol: int, h: float,
                  red_only: bool, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    inv_h2 = 1.0 / (h * h)
    h_lo, _, _ = _halos(dtype)
    hh = HALO_ROWS
    if r <= _T_DN + 2 * h_lo:
        t, lt, nt = r, r, 1
    else:
        t, lt, nt = _T_DN, _T_DN + 2 * h_lo, -(-r // _T_DN)

    def kernel(sigma_ref, off_ref, u_hbm, b_hbm, out_ref, ubuf, bbuf,
               acc_ref, in_sems):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]
        acc_ref[0, 0] = jnp.zeros((), cdt)

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - h_lo, 0, r - lt)
            return oo, pl.multiple_of(ps, h_lo)

        def in_copies(i, slot):
            _, ps = offsets(i)
            return (
                pltpu.make_async_copy(u_hbm.at[:, pl.ds(ps, lt), :],
                                      ubuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(b_hbm.at[:, pl.ds(ps, lt), :],
                                      bbuf.at[slot], in_sems.at[slot, 1]),
            )

        for cpy in in_copies(0, 0):
            cpy.start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                for cpy in in_copies(i + 1, nxt):
                    cpy.start()

            for cpy in in_copies(i, slot):
                cpy.wait()
            oo, ps = offsets(i)
            _, seven, mask_r, mask_b = _masks_ext(n, grow0, gcol0, ps,
                                                  (lt, cp))
            # Ownership: count each ext row once (tile rows [oo, oo+t)
            # despite halo overlap) and only the OWNED region (rows
            # [hh, hh+m); for sharded columns, owned packed lanes
            # [hh/2, hh/2 + mcol/2)).
            p = ps + jax.lax.broadcasted_iota(jnp.int32, (lt, cp), 0)
            own = ((p >= oo) & (p < oo + t)
                   & (p >= hh) & (p < hh + m))
            if mcol:
                jj = jax.lax.broadcasted_iota(jnp.int32, (lt, cp), 1)
                own = own & (jj >= hh // 2) & (jj < hh // 2 + mcol // 2)
            red = ubuf[slot, 0].astype(cdt)
            blk = ubuf[slot, 1].astype(cdt)
            b_r = bbuf[slot, 0].astype(cdt)
            b_b = bbuf[slot, 1].astype(cdt)
            res_r = b_r - (4.0 * red
                           - _red_neighbor_sum(blk, seven)) * inv_h2 \
                + sigma * red
            res_r = jnp.where(mask_r & own, res_r, jnp.zeros_like(res_r))
            part = jnp.sum(res_r * res_r)
            if not red_only:
                res_b = b_b - (4.0 * blk
                               - _black_neighbor_sum(red, seven)) \
                    * inv_h2 + sigma * blk
                res_b = jnp.where(mask_b & own, res_b,
                                  jnp.zeros_like(res_b))
                part = part + jnp.sum(res_b * res_b)
            acc_ref[0, 0] = acc_ref[0, 0] + part
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)
        out_ref[0, 0] = acc_ref[0, 0]

    scratch = [
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.SMEM((1, 1), cdt),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]

    def call(sigma_arr, off_arr, u, b):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), cdt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=(5 if red_only else 10) * r * cp, transcendentals=0,
                bytes_accessed=2 * 2 * r * cp
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u, b)
        return out[0, 0]

    return call


def residual_norm_sq(s: jax.Array, bs: jax.Array, n: int, h: float,
                     m: int, row_off, col_off=0, *, mcol: int = 0,
                     red_only: bool = False, sigma=0.0) -> jax.Array:
    """Shard-local ||b - (A - sigma I) u||^2 over the OWNED region of a
    packed extended tile (psum over the mesh is the caller's job).
    Requires EXACT ghosts to depth 1 (a refreshed tile). red_only=True
    is exact when u just finished an RB-GS cycle."""
    _, r, cp = s.shape
    call = _resnorm_call(n, r, cp, m, mcol, float(h), bool(red_only),
                         jnp.dtype(s.dtype).name)
    return call(_scal(sigma, _cdt(s.dtype)), _offs(row_off, col_off),
                s, bs)


# ---------------------------------------------------------------------------
# Operator apply: (A - sigma I) u on a packed extended tile — the
# residual kernel minus the b stream (PCG's apply_a ran residual against
# a materialized ZERO b, wasting a third of its DMA traffic).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _apply_call(n: int, r: int, cp: int, h: float, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    inv_h2 = 1.0 / (h * h)
    h_lo, _, _ = _halos(dtype)
    if r <= _T_DN + 2 * h_lo:
        t, lt, nt = r, r, 1
    else:
        t, lt, nt = _T_DN, _T_DN + 2 * h_lo, -(-r // _T_DN)

    def kernel(sigma_ref, off_ref, u_hbm, out_hbm, ubuf, obuf,
               in_sems, out_sems):
        sigma = sigma_ref[0, 0]
        grow0 = off_ref[0, 0]
        gcol0 = off_ref[0, 1]

        def offsets(i):
            oo = jnp.minimum(i * t, r - t)
            ps = jnp.clip(oo - h_lo, 0, r - lt)
            return pl.multiple_of(oo, 8), pl.multiple_of(ps, h_lo)

        def in_copy(i, slot):
            _, ps = offsets(i)
            return pltpu.make_async_copy(u_hbm.at[:, pl.ds(ps, lt), :],
                                         ubuf.at[slot],
                                         in_sems.at[slot])

        in_copy(0, 0).start()

        def body(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nt)
            def _():
                in_copy(i + 1, nxt).start()

            in_copy(i, slot).wait()
            oo, ps = offsets(i)
            _, seven, mask_r, mask_b = _masks_ext(n, grow0, gcol0, ps,
                                                  (lt, cp))
            red = ubuf[slot, 0].astype(cdt)
            blk = ubuf[slot, 1].astype(cdt)
            au_r = (4.0 * red - _red_neighbor_sum(blk, seven)) * inv_h2 \
                - sigma * red
            au_b = (4.0 * blk - _black_neighbor_sum(red, seven)) \
                * inv_h2 - sigma * blk

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            co = pl.multiple_of(oo - ps, 8)
            obuf[slot, 0, :, :] = jnp.where(
                mask_r, au_r, jnp.zeros_like(au_r)).astype(dtype)
            obuf[slot, 1, :, :] = jnp.where(
                mask_b, au_b, jnp.zeros_like(au_b)).astype(dtype)
            pltpu.make_async_copy(
                obuf.at[slot, :, pl.ds(co, t), :],
                out_hbm.at[:, pl.ds(oo, t), :], out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2, :, pl.ds(0, t), :],
                    out_hbm.at[:, pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.VMEM((2, 2, lt, cp), dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, u):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, r, cp), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=8 * r * cp, transcendentals=0,
                bytes_accessed=2 * 2 * r * cp
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u)

    return call


def apply_op(s: jax.Array, n: int, h: float, row_off, col_off=0,
             sigma=0.0) -> jax.Array:
    """(A - sigma I) u on a packed halo-extended tile (zero outside the
    global interior; ghosts need depth-1 exactness). == -residual(u, 0)
    at a third less HBM traffic (no b stream)."""
    _, r, cp = s.shape
    call = _apply_call(n, r, cp, float(h), jnp.dtype(s.dtype).name)
    return call(_scal(sigma, _cdt(s.dtype)), _offs(row_off, col_off), s)
