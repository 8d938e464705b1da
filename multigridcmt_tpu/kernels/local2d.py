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

from .fused2d import _iota2, _smooth_tile
from .stencil2d import (_HALO, _gs_vals, _interpret, _residual_vals,
                        _tile_plan)

# Ghost rows exchanged per fused smoothing stage (both sides). 8 rows
# supports 4 fused RB-GS sweeps (staleness 2 rows/sweep) or 8 Jacobi
# sweeps, and keeps the extended tile 8-row aligned when the owned row
# count is a multiple of 8.
HALO_ROWS = 8

# Coarse tiles use the SAME extended convention as fine tiles (HALO_ROWS
# ghost entries per side): the down-leg kernel emits its coarse RHS
# directly in this layout, so a coarse level's input is one ghost-slab
# refresh away — and the coarse level's up-leg OUTPUT is, in turn,
# directly the parent's correction operand (zero relayout copies through
# the whole cycle). The fine<->coarse extended-coordinate mapping is
# static because the device index cancels out of the ownership formulas:
# global f = 2*jc maps to ext rows p = 2*q' + (1 + hh - 2*hc) = 2*q' - 7.
COARSE_HALO = HALO_ROWS


def max_fused_sweeps(kind: str) -> int:
    return HALO_ROWS // 2 if kind == "rbgs" else HALO_ROWS


def max_down_sweeps(kind: str) -> int:
    """Pre-sweeps one down_leg call fuses: the residual (+1) and the
    restriction (+1) eat two rows of the ghost-staleness budget."""
    return ((HALO_ROWS - 2) // 2 if kind == "rbgs" else HALO_ROWS - 2)


def max_up_sweeps(kind: str) -> int:
    """Post-sweeps one up_leg call fuses. The caller refreshes the fine
    tile's and the coarse operand's ghosts first; two rows of halo budget
    are reserved for the zero-filled 2-hop coarse ghosts a shallow
    (mc < HALO_ROWS) coarse fallback tile can carry
    (parallel.sharded._ext_coarse_tile)."""
    return ((HALO_ROWS - 2) // 2 if kind == "rbgs" else HALO_ROWS - 2)


def ext_rows(m: int) -> int:
    """Extended-tile physical rows for m owned entries: m + 2*HALO_ROWS
    rounded to 16 (the whole-leg kernels halve row offsets, which must
    stay 8-aligned)."""
    return -(-(m + 2 * HALO_ROWS) // 16) * 16


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


# ---------------------------------------------------------------------------
# Whole-leg shard-local kernels (VERDICT.md round-3 item 1): one kernel per
# V-cycle leg over the halo-extended tile, row decompositions.
#
# Index algebra (the reason these work at all): per sharded axis, device d
# owns fine entries d*m+1 .. (d+1)*m and coarse entries d*mc+1 .. (d+1)*mc
# (mc = m/2). The extended fine tile's row p is global g = row_off + p with
# row_off = d*m + 1 - hh; local coarse q is global jc = crow_off + q with
# crow_off = d*mc + 1 (down leg, owned-only output) or crow_off - hc (up
# leg, hc-extended input). Substituting, the device index d CANCELS:
#
#   down:  jc's full-weighting reads g = 2jc-1..2jc+1, i.e. extended rows
#          p = 2q + hh .. 2q + hh + 2 — a STATIC mapping;
#   up:    even global f (p odd, row_off is always odd) reads q' with
#          p = 2q' + 1 + hh - 2hc = 2q' + 1 (hc = hh/2); odd f (p even)
#          reads q' = p/2 and p/2 - 1.
#
# So the cross-resolution selection/interpolation matrices are the same
# static iota constructions as fused2d.py; only the interior/color masks
# carry the traced global offsets (SMEM, as in the kernels above).
#
# Ghost-staleness budget (hh = 8 rows exchanged per side):
#   down: nu1 sweeps cost 2*nu1 (RB-GS) or nu1 (Jacobi) rows, residual +1,
#         restriction +1 -> coarse owned rows exact iff 2*nu1 + 2 <= hh.
#   up:   the coarse ghost at local q' = -1 is NOT exchanged, so the
#         prolonged correction is exact only from fine ghost depth 2
#         inward; nu2 sweeps then need 2*nu2 <= hh - 2.
# ---------------------------------------------------------------------------

_T_DN = 64        # down-leg fine output rows per tile (multiple of 16)
_T_UP = 48        # up-leg fine output rows per tile (multiple of 16)


def _cdt(dtype):
    """In-register compute dtype for a storage dtype: float32 for
    sub-32-bit storage (bfloat16), else the storage dtype itself — the
    packed2d mixed-precision rule. bf16 lives only in HBM/VMEM; every
    tile is widened on read and narrowed on store, so the stencil
    algebra (1/h^2 ~ 4^k scale — catastrophic for an 8-bit mantissa)
    runs at full f32, and the coarse RHS a down leg emits is ALWAYS in
    this dtype, so coarser levels run at full precision automatically.
    HBM traffic — the kernels' bottleneck — still halves."""
    dt = jnp.dtype(dtype)
    return jnp.float32 if dt.itemsize < 4 else dt


def _halos(dtype):
    """(h_lo, h_hi, h_up) tile-halo rows for a storage dtype. Sub-32-bit
    tiling is (16, 128), so its DMA row offsets must be 16-aligned —
    deeper tile halos keep every window offset a multiple of 16. (h_hi
    covers the +hh+1 coarse row shift: a down tile's coarse rows read up
    to 8 rows past its fine output rows.)"""
    if jnp.dtype(dtype).itemsize < 4:
        return 16, 16, 16
    return 8, 16, 8


@functools.lru_cache(maxsize=None)
def _down_leg_call(n: int, nc: int, m: int, r: int, c: int, cc: int,
                   h: float, kind: str, omega: float, sweeps: int,
                   dtype_name: str, mcol: int = 0):
    # mcol > 0: columns are SHARDED too (block decomposition) — the tile
    # carries mcol owned + 2*HALO_ROWS ghost columns in ext convention,
    # and the coarse output's columns come out in ext convention as
    # well. The fine<->coarse lane mapping is the rows' algebra
    # transposed: out lane s centers at scol lane 2s - 7 (static).
    col_ext = mcol > 0
    dtype = jnp.dtype(dtype_name)
    cdt = _cdt(dtype)
    h_lo, h_hi, _ = _halos(dtype)
    h2 = h * h
    inv_h2 = 1.0 / h2
    rcr = ext_rows(m // 2)           # coarse output in EXT layout
    if r <= _T_DN + h_lo + h_hi:
        t, lt, nt = r, r, 1
    else:
        t = _T_DN
        lt = t + h_lo + h_hi
        nt = -(-r // t)
    tc = t // 2
    mc = m // 2
    hh = HALO_ROWS
    nb = c // 256                    # full 256->128 lane blocks
    rem = (c % 256) // 128
    # Coarse ghost/pad rows the tiles never write (tiles cover ext rows
    # [hh, hh + r//2)): the hh near-ghost rows and any far pad.
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
            interior, red = _masks(n, grow0, gcol0, ps, (lt, c))
            # Tiles are widened to the compute dtype on read and narrowed
            # on store (identity for f32/f64; the bf16 mixed-precision
            # rule — see _cdt).
            bw = bbuf[slot].astype(cdt)
            u = _smooth_tile(ubuf[slot].astype(cdt), bw, sigma, interior,
                             red, h2, kind, omega, sweeps)

            # Park the smoothed window in obuf right away (fused2d
            # pattern): its live range ends here instead of spanning the
            # restriction below.
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    u_out.at[pl.ds(0, t), :], out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()

            obuf[slot, :, :] = u.astype(dtype)

            res = _residual_vals(obuf[slot].astype(cdt), bw, inv_h2,
                                 sigma)
            res = jnp.where(interior, res, jnp.zeros_like(res))

            # Row full-weighting at every window row.
            tvals = (0.25 * pltpu.roll(res, 1, 0) + 0.5 * res
                     + 0.25 * pltpu.roll(res, lt - 1, 0))

            # Coarse row extraction: local coarse q0 + qi has its center
            # at extended row 2*(q0 + qi) + hh + 1, window coordinate
            # wc + 2*qi. Out-of-window values self-mask (the iota
            # comparison never matches), which only ever drops rows the
            # gq < mc mask zeroes anyway.
            co = oo - ps
            q0 = pl.multiple_of(oo // 2, 8)
            wc = 2 * q0 + hh + 1 - ps
            qsel = (_iota2((tc, lt), 1)
                    == wc + 2 * _iota2((tc, lt), 0)).astype(cdt)
            rows_c = jax.lax.dot_general(
                qsel, tvals, (((1,), (0,)), ((), ())),
                preferred_element_type=cdt,
                precision=jax.lax.Precision.HIGHEST).astype(cdt)

            # Column full-weighting, then coarse-lane extraction.
            scol = (0.25 * pltpu.roll(rows_c, 1, 1) + 0.5 * rows_c
                    + 0.25 * pltpu.roll(rows_c, c - 1, 1))
            crow0 = (grow0 + hh + 1) // 2       # global jc of local q = 0
            gjc = crow0 + q0 + _iota2((tc, 128), 0)
            gq = q0 + _iota2((tc, 128), 0)

            if not col_ext:
                # Unsharded columns: global col == lane; even-lane
                # extraction (fused2d pattern verbatim).
                esel = (_iota2((256, 128), 0)
                        == 2 * _iota2((256, 128), 1)).astype(cdt)
                for blk in range(nb + rem):
                    w = 256 if blk < nb else 128
                    seg = scol[:, blk * 256: blk * 256 + w]
                    sel = esel[:w, : w // 2]
                    ext = jax.lax.dot_general(
                        seg, sel, (((1,), (0,)), ((), ())),
                        preferred_element_type=cdt,
                        precision=jax.lax.Precision.HIGHEST).astype(cdt)
                    gcc = blk * 128 + _iota2((tc, w // 2), 1)
                    cmask = ((gq[:, : w // 2] < mc)
                             & (gjc[:, : w // 2] <= nc)
                             & (gcc >= 1) & (gcc <= nc))
                    cbuf[slot, :, blk * 128: blk * 128 + w // 2] = \
                        jnp.where(cmask, ext, jnp.zeros_like(ext))
                filled = 128 * nb + 64 * rem
                if filled < cc:
                    cbuf[slot, :, filled:] = jnp.zeros(
                        (tc, cc - filled), cdt)
            else:
                # Sharded columns: coarse out lane s (ext convention)
                # centers at scol lane 2s - 7 (the rows' +hh+1 shift
                # transposed; static because the device index cancels);
                # lanes 2s - 7 < 0 within a 256-block come from the
                # previous block (roll by 256). Ghost/pad out lanes are
                # masked to zero — the coarse level's refresh exchanges
                # them.
                mc2 = mcol // 2
                sel_m = (_iota2((256, 128), 0)
                         == 2 * _iota2((256, 128), 1) - 7).astype(cdt)
                sel_p = (_iota2((256, 128), 0)
                         == 2 * _iota2((256, 128), 1) + 249).astype(cdt)
                ccol0 = (gcol0 - 7) // 2   # global coarse col of lane 0
                for ob in range(cc // 128):
                    lo = ob * 256
                    wav = min(256, c - lo)
                    s_lane = ob * 128 + _iota2((tc, 128), 1)
                    if wav <= 0:
                        cbuf[slot, :, ob * 128:(ob + 1) * 128] = \
                            jnp.zeros((tc, 128), cdt)
                        continue
                    ext = jax.lax.dot_general(
                        scol[:, lo:lo + wav], sel_m[:wav],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=cdt,
                        precision=jax.lax.Precision.HIGHEST).astype(cdt)
                    if ob >= 1:
                        # Out lanes s = ob*128 + m, m < 4 center at scol
                        # lanes 2s - 7 < lo: read the PREVIOUS 256-block
                        # (always fully in range; ob = 0's prev lanes
                        # would be ghost depth < 8, masked below).
                        ext = ext + jax.lax.dot_general(
                            scol[:, lo - 256:lo], sel_p,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=cdt,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(cdt)
                    gcc = ccol0 + s_lane
                    cmask = ((gq < mc) & (gjc <= nc)
                             & (s_lane >= hh) & (s_lane < hh + mc2)
                             & (gcc <= nc))
                    cbuf[slot, :, ob * 128:(ob + 1) * 128] = jnp.where(
                        cmask, ext, jnp.zeros_like(ext))

            pltpu.make_async_copy(
                obuf.at[slot, pl.ds(pl.multiple_of(co, 8), t), :],
                u_out.at[pl.ds(oo, t), :], out_sems.at[slot, 0]).start()
            # Coarse rows land at +hh: the output is in the same extended
            # convention as the fine tiles (ghost rows zeroed above).
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
                    obuf.at[slot, pl.ds(0, t), :],
                    u_out.at[pl.ds(0, t), :], out_sems.at[slot, 0]).wait()
                pltpu.make_async_copy(
                    cbuf.at[slot], rc_out.at[pl.ds(0, tc), :],
                    out_sems.at[slot, 1]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)

    scratch = [
        pltpu.VMEM((2, lt, c), dtype),        # ubuf
        pltpu.VMEM((2, lt, c), dtype),        # bbuf
        pltpu.VMEM((2, lt, c), dtype),        # obuf (smoothed window)
        pltpu.VMEM((2, tc, cc), cdt),         # cbuf (coarse rows)
        pltpu.VMEM((hh, cc), cdt),            # zbuf (coarse ghost zeros)
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA,
    ]

    def call(sigma_arr, off_arr, u, b):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((r, c), dtype),
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
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=(12 * sweeps + 17) * r * c, transcendentals=0,
                bytes_accessed=(3 * r * c + rcr * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, u, b)

    return call


def down_leg(u_ext: jax.Array, b_ext: jax.Array, n: int, h: float, m: int,
             row_off, col_off=0, *, kind: str, omega: float, sweeps: int,
             sigma=0.0, mcol: int = 0):
    """(smooth^sweeps, residual, restrict) of a V-cycle down leg in ONE
    kernel over the halo-extended shard tile (row decompositions).

    u_ext/b_ext: aligned (16j, 128j) embeddings of the hh-extended local
    tile; m: owned row count; n: GLOBAL fine interior size. Returns
    (u_smoothed_ext, rc_ext): the smoothed full extended tile (ghost rows
    STALE — re-exchange before reuse) and the coarse RHS in the SAME
    extended convention — shape (ext_rows(m/2), round128(nc+2)), owned
    rows at [HALO_ROWS, HALO_ROWS + m/2), ghost rows ZERO (exchange them
    to make it the coarse level's input).

    Requires sweeps <= max_down_sweeps(kind); columns unsharded.
    """
    from ..grids import aligned_shape

    assert 0 <= sweeps <= max_down_sweeps(kind), sweeps
    r, c = u_ext.shape
    assert r % 16 == 0, r
    nc = (n - 1) // 2
    if mcol:
        # Block decomposition: the coarse columns come out in the same
        # ext convention as the rows.
        cc = -(-(mcol // 2 + 2 * HALO_ROWS) // 128) * 128
    else:
        cc = aligned_shape(nc)[1]
    call = _down_leg_call(n, nc, m, r, c, cc, float(h), kind, float(omega),
                          sweeps, jnp.dtype(u_ext.dtype).name, mcol)
    return call(_scal(sigma, _cdt(u_ext.dtype)), _offs(row_off, col_off),
                u_ext, b_ext)


@functools.lru_cache(maxsize=None)
def _up_leg_call(n: int, nc: int, m: int, r: int, c: int, rcr: int,
                 cc: int, h: float, kind: str, omega: float, sweeps: int,
                 dtype_name: str, out_dtype_name: str, mcol: int = 0):
    col_ext = mcol > 0
    dtype = jnp.dtype(dtype_name)
    odt = jnp.dtype(out_dtype_name)
    cdt = _cdt(dtype)                # e/compute dtype (coarse is cdt)
    _, _, h_up = _halos(dtype)
    h2 = h * h
    if r <= _T_UP + 2 * h_up:
        t, ltf, nt = r, r, 1
        ltc = rcr
    else:
        t = _T_UP
        ltf = t + 2 * h_up
        nt = -(-r // t)
        # Coarse rows needed for fine window [pf, pf+ltf): the p = 2q'-7
        # mapping reads q' in [(pf+6)/2, (pf+ltf+7)/2], span ltf/2 + 1;
        # +8 slack for the 8-aligned pc below.
        ltc = min(t // 2 + h_up + 16, rcr)

    def kernel(sigma_ref, off_ref, x_hbm, e_hbm, b_hbm, out_hbm,
               xbuf, bbuf, ebuf, rbuf, obuf, in_sems, out_sems):
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

            # Row interpolation in EXTENDED coordinates (static mapping,
            # see module notes): fine ext row pp is an even global row
            # iff pp is odd (row_off is always odd); its coarse source
            # sits at ext row qq with pp = 2*qq - 7; odd global rows
            # (pp even) average the two neighbors 2*qq == pp + 6, pp + 8.
            pp = pf + _iota2((ltf, ltc), 0)
            qq = pc + _iota2((ltf, ltc), 1)
            podd = (pp % 2) == 1
            rsel = (jnp.where(podd & (2 * qq == pp + 7), 1.0, 0.0)
                    + jnp.where((~podd) & ((2 * qq == pp + 6)
                                           | (2 * qq == pp + 8)), 0.5, 0.0)
                    ).astype(cdt)
            rows_f = jax.lax.dot_general(
                rsel, ebuf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=cdt,
                precision=jax.lax.Precision.HIGHEST).astype(cdt)

            # Column interpolation, 128 coarse -> 256 fine lanes per
            # block.
            mm = _iota2((128, 256), 0)
            g = _iota2((128, 256), 1)
            if not col_ext:
                # Unsharded columns: global col == lane (fused2d
                # pattern); cross-block neighbor via a 1-lane roll.
                m1 = ((g == 2 * mm).astype(cdt)
                      + 0.5 * (g == 2 * mm + 1).astype(cdt)
                      + 0.5 * (g == 2 * mm - 1).astype(cdt))
                m2 = 0.5 * ((mm == 127) & (g == 255)).astype(cdt)
                cs = pltpu.roll(rows_f, cc - 1, 1)
            else:
                # Sharded columns (ext convention): fine ext lane t
                # reads coarse ext lane s with t = 2s - 7 (t odd, i.e.
                # global col even) or the mean of 2s == t+6, t+8 (t
                # even). Within a 256-lane fine block the relations are
                # block-free; the high lanes also read the NEXT coarse
                # block (roll by 128).
                godd = (g % 2) == 1
                m1 = (jnp.where(godd & (2 * mm == g + 7), 1.0, 0.0)
                      + jnp.where((~godd) & ((2 * mm == g + 6)
                                             | (2 * mm == g + 8)),
                                  0.5, 0.0)).astype(cdt)
                m2 = (jnp.where(godd & (2 * (mm + 128) == g + 7),
                                1.0, 0.0)
                      + jnp.where((~godd)
                                  & ((2 * (mm + 128) == g + 6)
                                     | (2 * (mm + 128) == g + 8)),
                                  0.5, 0.0)).astype(cdt)
                cs = pltpu.roll(rows_f, cc - 128, 1)
            interior, red = _masks(n, grow0, gcol0, pf, (ltf, c))
            w = xbuf[slot].astype(cdt)
            for blk in range(-(-c // 256)):
                lo = blk * 256
                wdt = min(256, c - lo)
                if wdt <= 0:
                    break
                assert (blk + 1) * 128 <= cc, (blk, cc, c)
                seg = rows_f[:, blk * 128:(blk + 1) * 128]
                segs = cs[:, blk * 128:(blk + 1) * 128]
                pe = (jax.lax.dot_general(
                          seg, m1, (((1,), (0,)), ((), ())),
                          preferred_element_type=cdt,
                          precision=jax.lax.Precision.HIGHEST)
                      + jax.lax.dot_general(
                          segs, m2, (((1,), (0,)), ((), ())),
                          preferred_element_type=cdt,
                          precision=jax.lax.Precision.HIGHEST))
                rbuf[:, lo:lo + wdt] = pe[:, :wdt].astype(cdt)
            w = jnp.where(interior, w + rbuf[:, :], w)

            w = _smooth_tile(w, bbuf[slot].astype(cdt), sigma, interior,
                             red, h2, kind, omega, sweeps)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot, pl.ds(0, t), :],
                    out_hbm.at[pl.ds(0, t), :], out_sems.at[slot]).wait()

            obuf[slot, :, :] = w.astype(odt)
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
        pltpu.VMEM((2, ltc, cc), cdt),        # ebuf (coarse is cdt)
        pltpu.VMEM((ltf, c), cdt),            # rbuf (interpolated P e)
        pltpu.VMEM((2, ltf, c), odt),         # obuf
        pltpu.SemaphoreType.DMA((2, 3)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(sigma_arr, off_arr, x, e, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, c), odt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=(12 * sweeps + 4) * r * c, transcendentals=0,
                bytes_accessed=(3 * r * c + rcr * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(sigma_arr, off_arr, x, e, b)

    return call


def up_leg(x_ext: jax.Array, e_ext: jax.Array, b_ext: jax.Array, n: int,
           nc: int, h: float, m: int, row_off, col_off=0, *, kind: str,
           omega: float, sweeps: int, sigma=0.0,
           out_dtype=None, mcol: int = 0) -> jax.Array:
    """smooth^sweeps(x + P e) of a V-cycle up leg in ONE kernel over the
    halo-extended shard tile (row decompositions).

    x_ext/b_ext: aligned embeddings of the hh-extended fine tile with
    EXACT ghosts; e_ext: the coarse correction in the extended-tile
    convention, shape (ext_rows(m/2), round128(nc+2)) with EXACT ghosts
    (e.g. a refreshed down_leg coarse output after the coarse recursion,
    or directly a refreshed coarse-level up_leg output). Returns the full
    extended smoothed tile (ghost rows stale).
    Requires sweeps <= max_up_sweeps(kind).

    ``out_dtype`` (default: x's storage dtype) widens the OUTPUT store —
    a mixed-precision cycle's top level emits its result at f32 so the
    preconditioner output is the post-smoothed f32 register values, not
    a bf16 re-rounding: post-smoothing damps the (high-frequency)
    rounding noise of every intermediate bf16 store, and a final bf16
    store would re-inject O(eps_bf16 / h^2) residual noise that stalls
    the outer Krylov loop at large grids.
    """
    assert 0 <= sweeps <= max_up_sweeps(kind), sweeps
    r, c = x_ext.shape
    rcr, cc = e_ext.shape
    assert r % 16 == 0 and rcr == ext_rows(m // 2), (r, rcr, m)
    assert e_ext.dtype == _cdt(x_ext.dtype), (e_ext.dtype, x_ext.dtype)
    odt = jnp.dtype(out_dtype if out_dtype is not None else x_ext.dtype)
    call = _up_leg_call(n, nc, m, r, c, rcr, cc, float(h), kind,
                        float(omega), sweeps, jnp.dtype(x_ext.dtype).name,
                        odt.name, mcol)
    return call(_scal(sigma, _cdt(x_ext.dtype)), _offs(row_off, col_off),
                x_ext, e_ext, b_ext)
