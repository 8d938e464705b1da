"""Pallas TPU kernels fusing the inter-grid transfers with their neighbors.

Two V-cycle memory hogs disappear here (BASELINE.json:5 "Pallas kernels for
... the smoothing/transfer stencils"):

* `prolong_add`: x <- x + P e in ONE pass over the fine grid (read x + the
  quarter-size e, write x) instead of materializing P e and adding —
  ~2.25N of HBM traffic vs ~4.25N unfused.

* `residual_restrict`: r_c <- R (b - A x) writing only the quarter-size
  coarse grid (read u, b; write N/4) instead of a full-size residual
  round trip — ~2.75N vs ~5N unfused.

TPU-native tricks (Mosaic has no lane-dim pad/concat/strided-slice):

* Both resampling directions run as SELECTION/INTERPOLATION-MATRIX
  MATMULS on the MXU, which sits idle in these bandwidth-bound kernels
  (`pltpu.repeat` tiles whole arrays rather than interleaving elements,
  and Mosaic has no strided lane access, so neither direction can be
  expressed with vector ops alone):
  - downsampling: rows via a dynamically-built (tc x lt) 0/1 matrix (row
    offsets vary per tile), lanes via a static 256->128 block matrix
    walked across the width with static slices;
  - upsampling: rows via a static (2*ltc x ltc) interpolation matrix on
    the left, lanes via static 128->256 block matrices on the right (the
    rolled-by-one input supplies the cross-block neighbor term).

* Cross-level row alignment: fine tiles sit at 16-aligned offsets so the
  matching coarse offsets (fine/2) stay 8-aligned for DMA
  (`grids.aligned_shape` rounds rows to 16).

Layout/conventions as in stencil2d.py: aligned grids, zero ghosts+pads,
one compiled kernel per level pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil2d import _interpret


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


# ---------------------------------------------------------------------------
# prolong_add: x + P e (coarse aligned (Rc, Cc) -> fine aligned (R, C))
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _prolong_add_call(n: int, nc: int, r: int, c: int, rc: int, cc: int,
                      dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    t = min(64, r)                  # fine output rows per tile (mult 16)
    ltc = min(48, rc)               # coarse rows loaded per tile
    nt = -(-r // t)
    assert 2 * ltc >= t + (16 if nt > 1 else 0), (n, nc, r, rc)

    def kernel(x_hbm, e_hbm, out_hbm, xbuf, ebuf, pbuf, fbuf, obuf, in_sems,
               out_sems):
        def offsets(i):
            oo = jnp.minimum(i * t, r - t)               # fine out offset
            jo = oo // 2
            psc = jnp.clip(jo - 8, 0, rc - ltc)          # coarse load row
            return pl.multiple_of(oo, 16), pl.multiple_of(psc, 8)

        def in_copies(i, slot):
            oo, psc = offsets(i)
            return (
                pltpu.make_async_copy(x_hbm.at[pl.ds(oo, t), :],
                                      xbuf.at[slot], in_sems.at[slot, 0]),
                pltpu.make_async_copy(e_hbm.at[pl.ds(psc, ltc), :],
                                      ebuf.at[slot], in_sems.at[slot, 1]),
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
            oo, psc = offsets(i)
            ct = ebuf[slot]                               # (ltc, cc)

            # Column interpolation via 128->256 block matmuls: fine col
            # f = 256b + g takes e[128b + g//2] (g even) or the average of
            # e[128b + (g-1)//2] and e[.. + (g+1)//2] (g odd). m1 carries
            # the in-block terms; m2 routes the rolled-input lane 127
            # (= next block's first coarse column) into the last odd lane.
            m = _iota2((128, 256), 0)
            g = _iota2((128, 256), 1)
            m1 = ((g == 2 * m).astype(dtype)
                  + 0.5 * (g == 2 * m + 1).astype(dtype)
                  + 0.5 * (g == 2 * m - 1).astype(dtype))
            m2 = 0.5 * ((m == 127) & (g == 255)).astype(dtype)
            cs = pltpu.roll(ct, cc - 1, 1)                # [:, l] = ct[:, l+1]
            for blk in range(cc // 128):
                seg = ct[:, blk * 128:(blk + 1) * 128]
                segs = cs[:, blk * 128:(blk + 1) * 128]
                pc = (jax.lax.dot_general(
                          seg, m1, (((1,), (0,)), ((), ())),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST)
                      + jax.lax.dot_general(
                          segs, m2, (((1,), (0,)), ((), ())),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST))
                lo = blk * 256
                w = min(256, c - lo)
                if w <= 0:
                    break
                pbuf[:, lo:lo + w] = pc[:, :w].astype(dtype)

            # Row interpolation via a static (2*ltc, ltc) matrix on the
            # left: fine-local row lf (global 2*psc + lf) takes coarse
            # local lf//2 (even) or the average of lf//2 and lf//2+1 (odd).
            lf = _iota2((2 * ltc, ltc), 0)
            q = _iota2((2 * ltc, ltc), 1)
            rsel = (((lf % 2 == 0) & (q == lf // 2)).astype(dtype)
                    + 0.5 * ((lf % 2 == 1)
                             & ((q == lf // 2) | (q == lf // 2 + 1))
                             ).astype(dtype))
            fbuf[:, :] = jax.lax.dot_general(
                rsel, pbuf[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST).astype(dtype)

            # Slice the core rows via a ref read (dynamic value slicing is
            # not lowerable; ref reads with dynamic offsets are).
            co = pl.multiple_of(oo - 2 * psc, 16)
            pe = fbuf[pl.ds(co, t), :]
            grow = oo + _iota2((t, c), 0)
            gcol = _iota2((t, c), 1)
            mask = ((grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n))
            x = xbuf[slot]

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            obuf[slot, :, :] = jnp.where(mask, x + pe, x)
            pltpu.make_async_copy(obuf.at[slot],
                                  out_hbm.at[pl.ds(oo, t), :],
                                  out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2],
                    out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0)

    scratch = [
        pltpu.VMEM((2, t, c), dtype),          # xbuf
        pltpu.VMEM((2, ltc, cc), dtype),       # ebuf
        pltpu.VMEM((ltc, c), dtype),           # pbuf (column-interp e)
        pltpu.VMEM((2 * ltc, c), dtype),       # fbuf (P e, full tile rows)
        pltpu.VMEM((2, t, c), dtype),          # obuf
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(x, e):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r, c), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=4 * n * n, transcendentals=0,
                bytes_accessed=(2 * r * c + rc * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(x, e)

    return call


def prolong_add(x: jax.Array, e: jax.Array, n: int, nc: int) -> jax.Array:
    """x + P e on aligned grids: coarse e (logical nc) into fine x
    (logical n = 2*nc + 1)."""
    r, c = x.shape
    rc, cc = e.shape
    call = _prolong_add_call(n, nc, r, c, rc, cc, jnp.dtype(x.dtype).name)
    return call(x, e)


# ---------------------------------------------------------------------------
# residual_restrict: R (b - A u) (fine aligned -> coarse aligned)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _residual_restrict_call(n: int, nc: int, r: int, c: int, rc: int,
                            cc: int, h: float, dtype_name: str):
    dtype = jnp.dtype(dtype_name)
    inv_h2 = 1.0 / (h * h)
    tc = min(32, rc)                # coarse output rows per tile (mult 16)
    lt = min(2 * tc + 16, r)        # fine rows loaded (halo 8 each side)
    ntc = -(-rc // tc)
    nb = c // 256                   # full 256->128 lane blocks
    rem = (c % 256) // 128          # 0 or 1 trailing 128-lane block

    def kernel(u_hbm, b_hbm, out_hbm, ubuf, bbuf, obuf, in_sems, out_sems):
        def offsets(i):
            jo = jnp.minimum(i * tc, rc - tc)            # coarse out row
            ps = jnp.clip(2 * jo - 8, 0, r - lt)         # fine load row
            return pl.multiple_of(jo, 16), pl.multiple_of(ps, 8)

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

            @pl.when(i + 1 < ntc)
            def _():
                for cp in in_copies(i + 1, nxt):
                    cp.start()

            for cp in in_copies(i, slot):
                cp.wait()
            jo, ps = offsets(i)
            u, b = ubuf[slot], bbuf[slot]

            # Masked residual on the fine tile.
            up = pltpu.roll(u, 1, 0)
            down = pltpu.roll(u, lt - 1, 0)
            left = pltpu.roll(u, 1, 1)
            right = pltpu.roll(u, c - 1, 1)
            au = (4.0 * u - up - down - left - right) * inv_h2
            res = b - au
            grow = ps + _iota2((lt, c), 0)
            gcol = _iota2((lt, c), 1)
            fmask = ((grow >= 1) & (grow <= n) & (gcol >= 1) & (gcol <= n))
            res = jnp.where(fmask, res, jnp.zeros_like(res))

            # Row full-weighting at every fine row: T[l] = (res[l-1] +
            # 2 res[l] + res[l+1]) / 4 (wraparound rows are zero/masked).
            tvals = (0.25 * pltpu.roll(res, 1, 0) + 0.5 * res
                     + 0.25 * pltpu.roll(res, lt - 1, 0))

            # Extract coarse rows: local q reads fine row co + 2q. Dynamic
            # row offsets -> build the 0/1 selection matrix from iotas and
            # contract on the MXU.
            co = 2 * jo - ps
            qsel = (_iota2((tc, lt), 1)
                    == co + 2 * _iota2((tc, lt), 0)).astype(dtype)
            rows_c = jax.lax.dot_general(
                qsel, tvals, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST).astype(dtype)

            # Column full-weighting, then even-lane extraction per
            # 256-lane block with a static selection matrix.
            scol = (0.25 * pltpu.roll(rows_c, 1, 1) + 0.5 * rows_c
                    + 0.25 * pltpu.roll(rows_c, c - 1, 1))
            esel = (_iota2((256, 128), 0)
                    == 2 * _iota2((256, 128), 1)).astype(dtype)
            gjc = jo + _iota2((tc, 128), 0)

            # Wait for the DMA that last read this obuf slot BEFORE the
            # stores below overwrite it.
            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[pl.ds(0, tc), :],
                    out_sems.at[slot]).wait()

            for blk in range(nb + rem):
                w = 256 if blk < nb else 128
                seg = scol[:, blk * 256: blk * 256 + w]
                sel = esel[:w, : w // 2]
                ext = jax.lax.dot_general(
                    seg, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGHEST).astype(dtype)
                # Coarse-lane block [blk*128, blk*128 + w//2).
                gcc = blk * 128 + _iota2((tc, w // 2), 1)
                cmask = ((gjc[:, : w // 2] >= 1) & (gjc[:, : w // 2] <= nc)
                         & (gcc >= 1) & (gcc <= nc))
                obuf[slot, :, blk * 128: blk * 128 + w // 2] = jnp.where(
                    cmask, ext, jnp.zeros_like(ext))
            # Zero any coarse lanes beyond c // 2.
            filled = 128 * nb + 64 * rem
            if filled < cc:
                obuf[slot, :, filled:] = jnp.zeros((tc, cc - filled), dtype)

            pltpu.make_async_copy(obuf.at[slot],
                                  out_hbm.at[pl.ds(jo, tc), :],
                                  out_sems.at[slot]).start()
            return 0

        # NOTE: the out DMA is started before the wait for slot reuse only
        # on iteration i; the wait above guards the *store* into obuf of
        # iteration i+2, which happens after this wait in program order.
        jax.lax.fori_loop(0, ntc, body, 0)

        def drain(j, _):
            @pl.when(j < jnp.minimum(ntc, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(ntc - 1 - j) % 2],
                    out_hbm.at[pl.ds(0, tc), :],
                    out_sems.at[(ntc - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0)

    scratch = [
        pltpu.VMEM((2, lt, c), dtype),        # ubuf
        pltpu.VMEM((2, lt, c), dtype),        # bbuf
        pltpu.VMEM((2, tc, cc), dtype),       # obuf
        pltpu.SemaphoreType.DMA((2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def call(u, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rc, cc), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=10 * n * n, transcendentals=0,
                bytes_accessed=(2 * r * c + rc * cc)
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(u, b)

    return call


def residual_restrict(u: jax.Array, b: jax.Array, n: int,
                      h: float) -> jax.Array:
    """R (b - A u): fine aligned grids -> coarse aligned grid (logical
    (n-1)/2), in one pass that never materializes the fine residual."""
    from ..grids import aligned_shape

    nc = (n - 1) // 2
    r, c = u.shape
    rc, cc = aligned_shape(nc)
    call = _residual_restrict_call(n, nc, r, c, rc, cc, float(h),
                                   jnp.dtype(u.dtype).name)
    return call(u, b)
