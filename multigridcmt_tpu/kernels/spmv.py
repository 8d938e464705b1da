"""Pallas TPU SpMV kernel for banded (DIA) matrices.

This is the Pallas SpMV of SURVEY.md §2 ("Sparse formats / SpMV" row: the
performance tier replacing SciPy's compiled CSR SpMV; nnz/s is a headline
metric per BASELINE.md). Design split, TPU-native:

* **DIA/ELL fast path (this kernel)**: banded operators — every matrix the
  framework assembles (1D tridiagonal, 2D 5-point Poisson) — store one
  value per (row, offset). SpMV is then one shifted multiply-add per
  diagonal: gather-free, fully vectorized, HBM-bandwidth bound at
  (ndiag + 2)/5 bytes-per-nnz. That is the speed-of-light formulation on
  TPU, where arbitrary-index gathers (the CSR inner loop) serialize.

* **General CSR/COO**: `ops.sparse.spmv` lowers to XLA gather +
  segment-sum. A hand-written Pallas CSR kernel cannot beat XLA here
  without hardware gather support, so none is shipped — the capability is
  covered by the XLA path, and every banded matrix routes to this kernel
  via `DIA`.

Layout: the length-N operand vector is stored *packed* as a
``(H + R + H, 128)`` fp array — element i at row ``H + i // 128``, lane
``i % 128`` — where R = ceil(N/128) rounded to the 8-row DMA quantum and H
(a multiple of 8) covers the largest |offset| in rows. The H-row zero skirts
replace edge conditionals: a shifted read for diagonal ``s`` at output row
block ``q`` is a *statically placed* window ``[q + H + s//128, ...)`` of the
loaded tile plus a lane rotate by ``s % 128`` — no wraparound, no masks on
the hot path (out-of-range diagonal entries are zero by assembly, so they
multiply away the skirt reads). The kernel *writes* the same packed layout,
so chained applications (power iteration, residual loops, the nnz/s bench)
never leave it.

Tiling: double-buffered async DMA over T-row output tiles, as in
stencil2d.py; per tile it loads the x window (T + 2H rows) and one T-row
tile per diagonal, computes ndiag fused multiply-adds on the VPU, and DMAs
the output tile back — (ndiag + 2) * 512 bytes of HBM traffic per 128
output elements, the roofline minimum for DIA.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.sparse import DIA
from .stencil2d import _interpret

_LANES = 128
_TILE_ROWS = 512          # output rows per DMA round trip (multiple of 8)


def _rows_for(n_elems: int) -> int:
    """Packed row count for an N-element vector (8-row DMA quantum)."""
    r = -(-n_elems // _LANES)
    return -(-r // 8) * 8


def _halo_rows(offsets: Tuple[int, ...]) -> int:
    """Zero-skirt rows covering the largest |offset| (multiple of 8)."""
    m = max(abs(o) for o in offsets) if offsets else 0
    h = m // _LANES + 1
    return -(-h // 8) * 8


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class PackedDIA:
    """DIA matrix pre-packed into the kernel's (rows, 128) layout.

    ``diags`` is (ndiag, R, 128) with diagonal k's row-aligned values
    (A[i, i + offsets[k]] at packed position i) and zeros beyond N.
    """

    diags: jax.Array               # (ndiag, R, 128)
    offsets: Tuple[int, ...]       # static
    n: int                         # logical vector length N (static)

    def tree_flatten(self):
        return (self.diags,), (self.offsets, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        offsets, n = aux
        (diags,) = children
        return cls(diags, offsets, n)

    @property
    def halo(self) -> int:
        return _halo_rows(self.offsets)

    @property
    def nnz(self) -> int:
        return int(np.count_nonzero(np.asarray(self.diags)))


def pack_dia(a: DIA) -> PackedDIA:
    """DIA (ops.sparse) -> packed kernel layout. Host-side, setup path."""
    n = a.shape[0]
    r = _rows_for(n)
    d = np.zeros((a.diags.shape[0], r * _LANES), dtype=a.diags.dtype)
    d[:, :n] = np.asarray(a.diags)
    return PackedDIA(
        diags=jnp.asarray(d.reshape(a.diags.shape[0], r, _LANES)),
        offsets=tuple(int(o) for o in a.offsets),
        n=n,
    )


def pack_x(x: jax.Array, halo: int) -> jax.Array:
    """(N,) vector -> packed (halo + R + halo, 128) operand with zero skirts."""
    n = x.shape[0]
    r = _rows_for(n)
    flat = jnp.pad(x, (halo * _LANES, r * _LANES - n + halo * _LANES))
    return flat.reshape(-1, _LANES)


def unpack_y(y_packed: jax.Array, n: int, halo: int) -> jax.Array:
    """Packed result -> (N,) vector."""
    return y_packed.reshape(-1)[halo * _LANES: halo * _LANES + n]


@functools.lru_cache(maxsize=None)
def _spmv_call(ndiag: int, offsets: Tuple[int, ...], r: int, h: int,
               dtype_name: str):
    """Build the tiled DIA-SpMV pallas_call for a (static) matrix shape."""
    dtype = jnp.dtype(dtype_name)
    t = min(_TILE_ROWS, r)
    lt = t + 2 * h                     # x-window rows per tile
    nt = -(-r // t)

    def shifted(xt, off):
        """x[i + off] for the t output rows, from the (lt, 128) x window.

        Packed index of x[i + off] for output row q (local) is
        base + q*128 where base = h*128 + off — STATIC. Row part q + qs,
        lane rotate by rm, with the lane-overflow rows supplied by the
        next window row. No wraparound: |off| <= h*128 keeps both static
        windows inside the tile.
        """
        qs, rm = divmod(h * _LANES + off, _LANES)
        if rm == 0:
            return xt[qs:qs + t, :]
        a = pltpu.roll(xt[qs:qs + t, :], _LANES - rm, 1)
        b = pltpu.roll(xt[qs + 1:qs + t + 1, :], _LANES - rm, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (t, _LANES), 1)
        return jnp.where(lane < _LANES - rm, a, b)

    def kernel(x_hbm, d_hbm, out_hbm, xbuf, dbuf, obuf, zbuf, in_sems,
               out_sems, z_sem):
        # Zero the top/bottom skirts of the packed output once.
        zbuf[:, :] = jnp.zeros((h, _LANES), dtype)
        top = pltpu.make_async_copy(zbuf, out_hbm.at[pl.ds(0, h), :], z_sem)
        top.start()
        top.wait()
        bot = pltpu.make_async_copy(zbuf, out_hbm.at[pl.ds(h + r, h), :],
                                    z_sem)
        bot.start()

        def offs(i):
            oo = jnp.minimum(i * t, r - t)   # output row (packed: + h)
            return pl.multiple_of(oo, 8)

        def in_copies(i, slot):
            oo = offs(i)
            cps = [pltpu.make_async_copy(
                x_hbm.at[pl.ds(oo, lt), :], xbuf.at[slot],
                in_sems.at[slot, 0])]
            for k in range(ndiag):
                cps.append(pltpu.make_async_copy(
                    d_hbm.at[k, pl.ds(oo, t), :], dbuf.at[slot, k],
                    in_sems.at[slot, 1 + k]))
            return cps

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
            xt = xbuf[slot]
            y = jnp.zeros((t, _LANES), dtype)
            for k, off in enumerate(offsets):
                y = y + dbuf[slot, k] * shifted(xt, off)

            @pl.when(i >= 2)
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[slot]).wait()

            obuf[slot, :, :] = y
            pltpu.make_async_copy(obuf.at[slot],
                                  out_hbm.at[pl.ds(h + offs(i), t), :],
                                  out_sems.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, nt, body, 0, unroll=False)

        def drain(j, _):
            @pl.when(j < jnp.minimum(nt, 2))
            def _():
                pltpu.make_async_copy(
                    obuf.at[(nt - 1 - j) % 2],
                    out_hbm.at[pl.ds(0, t), :],
                    out_sems.at[(nt - 1 - j) % 2]).wait()
            return 0

        jax.lax.fori_loop(0, 2, drain, 0, unroll=False)
        bot.wait()

    scratch = [
        pltpu.VMEM((2, lt, _LANES), dtype),          # x window
        pltpu.VMEM((2, ndiag, t, _LANES), dtype),    # diagonal tiles
        pltpu.VMEM((2, t, _LANES), dtype),           # output
        pltpu.VMEM((h, _LANES), dtype),              # zero skirt
        pltpu.SemaphoreType.DMA((2, 1 + ndiag)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]

    def call(x_packed, diags):
        nnz = ndiag * r * _LANES
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((r + 2 * h, _LANES), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=2 * nnz, transcendentals=0,
                bytes_accessed=(ndiag + 2) * r * _LANES
                * jnp.dtype(dtype).itemsize),
            interpret=_interpret(),
        )(x_packed, diags)

    return call


def spmv_packed(a: PackedDIA, x_packed: jax.Array) -> jax.Array:
    """y = A @ x entirely in packed layout (chainable: y feeds the next
    call directly — power iterations / nnz/s benches never repack)."""
    ndiag, r, _ = a.diags.shape
    call = _spmv_call(ndiag, a.offsets, r, a.halo,
                      jnp.dtype(a.diags.dtype).name)
    return call(x_packed, a.diags)


def spmv_dia(a: DIA, x: jax.Array) -> jax.Array:
    """y = A @ x for a DIA matrix via the Pallas kernel ((N,) in/out).

    Convenience wrapper; hot loops should pack once and use
    ``spmv_packed``.
    """
    pk = pack_dia(a)
    return unpack_y(spmv_packed(pk, pack_x(x, pk.halo)), pk.n, pk.halo)
