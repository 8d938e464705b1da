"""Pallas kernel backend — drop-in replacement for the pure-jnp stencils.

Exports `PALLAS_BACKEND`, matching `solvers.cycles.Backend`. 2D grids live
in the TPU-aligned layout (`grids.aligned_shape`) end-to-end and route to
the row-tiled Pallas kernels (`stencil2d.py`); 1D grids (a few KB even at
the reference's 1023-point config) stay on the fused-by-XLA jnp path in
logical layout, where a hand-written kernel cannot win anything.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grids import (aligned3_shape, aligned_shape, from_aligned,
                     from_aligned3, to_aligned, to_aligned3)
from ..ops import laplacian, smoothers, stencils_aligned, transfer
from ..solvers.cycles import Backend
from . import fused2d, packed2d, stencil2d, stencil3d, transfer2d

# Below this interior size, a level uses the aligned-layout jnp stencils
# instead of a Pallas kernel: the level is cheap either way, and each
# distinct Pallas kernel costs a per-process Mosaic compile (~25s through
# the axon remote-compile tunnel, not covered by the persistent XLA cache).
PALLAS_MIN_N = 200

# At or above this interior size, a level lives in the color-packed layout
# (kernels/packed2d.py): the RB-GS kernels there compute each half-sweep
# only at its color's points (~1.75x on the VPU-bound sweeps, measured).
# Layout is dispatched by array rank (packed grids are (2, r, c/2), rank
# 3); encode/prolong decide the layout of arrays they create from the
# level's interior size. Levels below the threshold keep the aligned
# layout and the fused2d/stencil2d kernels.
#
# Packed->packed coarse crossings (k >= 13 at this threshold) are handled
# IN-KERNEL: the fused down leg emits the coarse RHS directly in the
# packed layout and the up leg consumes one (packed2d, block-diagonal MXU
# lane selects) — measured +237us/0us on the k=13 down/up legs vs the
# milliseconds-slow XLA scatter it replaced, giving a near-ideal 3.94x
# k=12->k=13 cycle scaling. The threshold itself is a measured optimum:
# packing the 2047 level too (PACK_MIN_N=1500 at k=12) LOSES 130 us/cycle
# — small levels don't amortize the extra kernels — while packing 4095 as
# a second level at k=13 WINS (4.72 vs 5.13 ms single-packed).
PACK_MIN_N = 3000


def _pack_level(n: int) -> bool:
    return n >= PACK_MIN_N


def _is_packed(u: jax.Array) -> bool:
    """Color-packed 2D layout: (2, r, c/2) red/black planes.

    Rank alone is NOT enough — a logical 3D padded grid is also rank 3.
    The leading extent disambiguates: packed arrays always have 2 planes,
    while a 3D grid's leading extent is n + 2 >= 5 (min_coarse >= 3)."""
    return u.ndim == 3 and u.shape[0] == 2


# Below this interior size a 3D level stays on the logical-layout jnp
# stencils; at or above it (and while a plane ring fits VMEM —
# stencil3d.fits_vmem) the level lives in the aligned3 layout and routes
# to the plane-rolling 7-point kernels.
PALLAS3_MIN_N = 100


def _is_aligned3(u: jax.Array) -> bool:
    """aligned3 layout: (n+2, 8k, 128k). A logical 3D cube's last extent
    is the odd 2^j + 1 — never a 128 multiple — so the lane dim tells the
    layouts apart."""
    return (u.ndim == 3 and u.shape[0] != 2 and u.shape[2] % 128 == 0)


def _use_pallas3(n: int, dtype) -> bool:
    _, r, c = aligned3_shape(n)
    return n >= PALLAS3_MIN_N and stencil3d.fits_vmem(r, c, dtype)


def _grid3_layout(ul: jax.Array, n: int) -> jax.Array:
    """Put a freshly created *logical* 3D padded grid in its level's
    layout."""
    if _use_pallas3(n, ul.dtype):
        return to_aligned3(ul)
    return ul


def _logical3(u: jax.Array, n: int) -> jax.Array:
    return from_aligned3(u, n) if _is_aligned3(u) else u


def _as_aligned_coarse(e: jax.Array, nc: int) -> jax.Array:
    """Coarse array in aligned layout regardless of its current layout."""
    if _is_packed(e):
        return packed2d.unpack(e, aligned_shape(nc)[1])
    return e


def _coarse_layout(rc: jax.Array, nc: int) -> jax.Array:
    """Put a freshly created aligned coarse array in its level's layout."""
    if _pack_level(nc):
        return packed2d.pack(rc)
    return rc


def _smooth(u: jax.Array, b: jax.Array, n: int, h: float, *, kind: str,
            omega: float, sweeps: int, sigma=0.0) -> jax.Array:
    if _is_packed(u):                      # color-packed level
        if kind == "rbgs":
            max_fused = packed2d.max_fused_sweeps()
            while sweeps > 0:
                s = min(sweeps, max_fused)
                u = packed2d.rbgs_sweep(u, b, n, h, sweeps=s, sigma=sigma)
                sweeps -= s
            return u
        if kind == "chebyshev":
            diag = laplacian.diag_value(2, h, sigma)
            return smoothers.chebyshev_generic(
                u, b, sweeps, diag,
                lambda uu, bb: packed2d.residual(uu, bb, n, h, sigma=sigma))
        # jacobi: residual kernel + XLA-fused axpy per sweep.
        scale = omega / laplacian.diag_value(2, h, sigma)
        for _ in range(sweeps):
            u = u + scale * packed2d.residual(u, b, n, h, sigma=sigma)
        return u
    if _is_aligned3(u):
        if kind == "rbgs":
            return stencil3d.rbgs_sweep(u, b, n, h, sigma=sigma,
                                        sweeps=sweeps)
        if kind == "jacobi":
            return stencil3d.jacobi_sweep(u, b, n, h, omega, sigma=sigma,
                                          sweeps=sweeps)
        if kind == "chebyshev":
            diag = laplacian.diag_value(3, h, sigma)
            return smoothers.chebyshev_generic(
                u, b, sweeps, diag,
                lambda uu, bb: stencil3d.residual(uu, bb, n, h,
                                                  sigma=sigma))
        raise ValueError(f"unknown smoother {kind!r}")
    if u.ndim != 2:
        return smoothers.smooth(u, b, h, kind=kind, omega=omega,
                                sweeps=sweeps, sigma=sigma)
    if kind == "chebyshev":
        # Chebyshev = residual applies + elementwise axpys: the residual is
        # the Pallas kernel (one HBM pass per application), the recurrence
        # fuses in XLA. No dedicated kernel needed — or worth a Mosaic
        # compile.
        diag = laplacian.diag_value(2, h, sigma)
        return smoothers.chebyshev_generic(
            u, b, sweeps, diag,
            lambda uu, bb: _residual(uu, bb, n, h, sigma=sigma))
    if n < PALLAS_MIN_N:
        return stencils_aligned.smooth(u, b, n, h, kind=kind, omega=omega,
                                       sweeps=sweeps, sigma=sigma)
    if kind not in ("jacobi", "rbgs"):
        raise ValueError(f"unknown smoother {kind!r}")
    # Fuse as many sweeps as the kernel's halo supports into each call —
    # nu sweeps in one HBM pass instead of nu passes.
    max_fused = stencil2d.max_fused_sweeps(kind)
    while sweeps > 0:
        s = min(sweeps, max_fused)
        if kind == "jacobi":
            u = stencil2d.jacobi_sweep(u, b, n, h, omega, sigma=sigma,
                                       sweeps=s)
        else:
            u = stencil2d.rbgs_sweep(u, b, n, h, sigma=sigma, sweeps=s)
        sweeps -= s
    return u


def _residual(u: jax.Array, b: jax.Array, n: int, h: float,
              sigma=0.0) -> jax.Array:
    if _is_packed(u):
        return packed2d.residual(u, b, n, h, sigma=sigma)
    if _is_aligned3(u):
        return stencil3d.residual(u, b, n, h, sigma=sigma)
    if u.ndim != 2:
        return laplacian.residual(u, b, h, sigma=sigma)
    if n < PALLAS_MIN_N:
        return stencils_aligned.residual(u, b, n, h, sigma=sigma)
    return stencil2d.residual(u, b, n, h, sigma=sigma)


def _restrict(r: jax.Array, n: int) -> jax.Array:
    nc = (n - 1) // 2
    if _is_packed(r):
        # restrict(r) == the coarse output of the fused down leg with zero
        # sweeps applied to (u=0, b=r): residual(0, r) = r. When the
        # coarse level also packs, the kernel emits the packed layout
        # directly (no XLA pack scatter).
        _, rc = packed2d.smooth_residual_restrict(
            jnp.zeros_like(r), r, n, h=1.0, kind="rbgs", omega=1.0,
            sweeps=0, packed_coarse=_pack_level(nc))
        return rc
    if r.ndim == 3:                                 # 3D, either layout
        return _grid3_layout(transfer.restrict(_logical3(r, n)), nc)
    if r.ndim != 2:
        return transfer.restrict(r)
    return _coarse_layout(transfer.restrict_aligned(r, n), nc)


def _prolong(e: jax.Array, nc: int) -> jax.Array:
    n = 2 * nc + 1
    if e.ndim == 3 and not _is_packed(e):           # 3D, either layout
        return _grid3_layout(transfer.prolong(_logical3(e, nc)), n)
    if e.ndim != 2 and not _is_packed(e):
        return transfer.prolong(e)
    if _pack_level(n):
        r, c = aligned_shape(n)
        zero = jnp.zeros((2, r, packed2d.packed_width(c)), dtype=e.dtype)
        return packed2d.prolong_add_smooth(
            zero, e, zero, n, nc, h=1.0, kind="rbgs", omega=1.0, sweeps=0)
    return transfer.prolong_aligned(_as_aligned_coarse(e, nc), nc)


def _encode(u: jax.Array) -> jax.Array:
    if u.ndim == 3 and not _is_packed(u):           # logical 3D grid
        return _grid3_layout(u, u.shape[0] - 2)
    if u.ndim != 2:
        return u
    ua = to_aligned(u)
    return packed2d.pack(ua) if _pack_level(u.shape[0] - 2) else ua


def _decode(u: jax.Array, n: int) -> jax.Array:
    if _is_packed(u):
        return from_aligned(packed2d.unpack(u, aligned_shape(n)[1]), n)
    if _is_aligned3(u):
        return from_aligned3(u, n)
    return from_aligned(u, n) if u.ndim == 2 else u


def _residual_restrict(u: jax.Array, b: jax.Array, n: int,
                       h: float) -> jax.Array:
    nc = (n - 1) // 2
    if _is_packed(u):
        _, rc = packed2d.smooth_residual_restrict(
            u, b, n, h, kind="rbgs", omega=1.0, sweeps=0,
            packed_coarse=_pack_level(nc))
        return rc
    if _is_aligned3(u):
        # Residual on the kernel tier; the transfer runs on the logical
        # slice (cheap O(N) relayouts, dominated by the smoothing sweeps).
        r3 = stencil3d.residual(u, b, n, h)
        return _grid3_layout(transfer.restrict(from_aligned3(r3, n)), nc)
    if u.ndim != 2:
        return transfer.restrict(laplacian.residual(u, b, h))
    if n < PALLAS_MIN_N:
        return _coarse_layout(transfer.restrict_aligned(
            stencils_aligned.residual(u, b, n, h), n), nc)
    return _coarse_layout(transfer2d.residual_restrict(u, b, n, h), nc)


def _prolong_add(x: jax.Array, e: jax.Array, n: int, nc: int) -> jax.Array:
    if _is_packed(x):
        return packed2d.prolong_add_smooth(
            x, e, jnp.zeros_like(x), n, nc, h=1.0,
            kind="rbgs", omega=1.0, sweeps=0)
    if _is_aligned3(x):
        pf = transfer.prolong(_logical3(e, nc))
        return x + to_aligned3(pf)
    if x.ndim != 2:
        return x + transfer.prolong(e)
    if n < PALLAS_MIN_N:
        return x + transfer.prolong_aligned(e, nc)
    return transfer2d.prolong_add(x, e, n, nc)


def _smooth_residual_restrict(u, b, n, h, *, kind, omega, sweeps,
                              sigma=0.0):
    """Whole-down-leg fusion; None declines to the composed path (1D,
    small levels, or more sweeps than one kernel's halo supports)."""
    nc = (n - 1) // 2
    if _is_packed(u):
        if (kind not in ("jacobi", "rbgs")
                or sweeps > packed2d.max_down_sweeps(kind)):
            return None
        us, rc = packed2d.smooth_residual_restrict(
            u, b, n, h, kind=kind, omega=omega, sweeps=sweeps, sigma=sigma,
            packed_coarse=_pack_level(nc))
        return us, rc
    if (u.ndim != 2 or n < PALLAS_MIN_N or kind not in ("jacobi", "rbgs")
            or sweeps > fused2d.max_down_sweeps(kind)):
        return None
    us, rc = fused2d.smooth_residual_restrict(
        u, b, n, h, kind=kind, omega=omega, sweeps=sweeps, sigma=sigma)
    return us, _coarse_layout(rc, nc)


def _prolong_add_smooth(x, e, b, n, nc, h, *, kind, omega, sweeps,
                        sigma=0.0):
    if _is_packed(x):
        if (kind not in ("jacobi", "rbgs")
                or sweeps > packed2d.max_up_sweeps(kind)):
            return None
        return packed2d.prolong_add_smooth(
            x, e, b, n, nc, h, kind=kind,
            omega=omega, sweeps=sweeps, sigma=sigma)
    if (x.ndim != 2 or n < PALLAS_MIN_N or kind not in ("jacobi", "rbgs")
            or sweeps > fused2d.max_up_sweeps(kind)):
        return None
    return fused2d.prolong_add_smooth(
        x, _as_aligned_coarse(e, nc), b, n, nc, h, kind=kind, omega=omega,
        sweeps=sweeps, sigma=sigma)


def _residual_norm2(x, b, n, h, red_only=False):
    """Fused convergence check on packed levels; None declines elsewhere."""
    if not _is_packed(x):
        return None
    return packed2d.residual_norm_sq(x, b, n, h, red_only=red_only)


PALLAS_BACKEND = Backend(
    smooth=_smooth,
    residual=_residual,
    restrict=_restrict,
    prolong=_prolong,
    encode=_encode,
    decode=_decode,
    residual_restrict=_residual_restrict,
    prolong_add=_prolong_add,
    smooth_residual_restrict=_smooth_residual_restrict,
    prolong_add_smooth=_prolong_add_smooth,
    residual_norm2=_residual_norm2,
)
