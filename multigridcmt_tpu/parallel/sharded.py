"""Distributed multigrid: shard_map domain decomposition with ppermute halos.

This is the build-side L7 runtime of SURVEY.md §1/§3.5 (the reference is
single-process SciPy — BASELINE.json:5 frames all distribution as build
work). The grid is partitioned over a device mesh — **any prefix of the
array axes may be sharded over a mesh axis**, giving every decomposition
SURVEY.md §2 names ("per-level row/block partitioning"):

* 1D mesh over axis 0 → *row* partitioning in 2D, *plane* (slab) in 3D;
* 2D mesh over axes 0 and 1 → *block* partitioning in 2D, *pencil* in 3D.

Block/pencil decompositions halve the halo surface-to-volume ratio versus
rows at the same device count, which is what carries weak scaling to large
meshes (SURVEY.md §6). Every stencil op exchanges a one-cell halo with its
mesh neighbors along each sharded axis via ``jax.lax.ppermute``; once a
level's local tile gets too small to amortize latency the level is
*agglomerated* — all-gathered over every mesh axis and computed replicated
on all devices (BASELINE.md config 5: "halo ppermute + coarse-level
agglomeration").

Partitioning invariants (vertex-centered 2^k - 1 grids), per sharded axis:

* The padded fine grid has 2^k + 1 entries along the axis: ghost 0,
  interior 1..n, ghost n+1. Entries 1..2^k (interior plus the far ghost)
  are sharded: with D (a power of two <= 2^(k-1)) devices along the axis,
  device d owns m = 2^k / D entries, global entries d*m+1 .. (d+1)*m. The
  far ghost lands on the last device as a "dead" entry that masks keep
  zero; the near ghost 0 is never stored — it reappears as device 0's
  all-zero halo (ppermute edge semantics: non-receiving devices get
  zeros — exactly the homogeneous Dirichlet boundary).

* Coarsening halves m per level (coarse point j sits at fine point 2j), so
  the same ownership formula holds on every sharded level; restriction
  needs only the far halo, prolongation only the near halo.

* Halo handling is **overlapped with compute**: every op issues its
  ppermutes first, runs the stencil/transfer on local data with zero
  edges, and folds the arriving halo slabs into the boundary slices as
  additive fixups (``_neighbor_sum_dd``) — XLA's latency-hiding scheduler
  can then run the bulk of the stencil while the collectives are in
  flight (SURVEY.md §7 hard part #2). The face stencils and the
  *separable* per-axis transfer passes never read corner ghosts, so no
  diagonal-neighbor communication is needed at all.

* Red-black Gauss-Seidel re-exchanges halos between the two half-sweeps
  (the updated red halo feeds the black sweep) — this is what keeps the
  distributed sweep *exactly* equal to the single-device sweep
  (SURVEY.md §7 hard part #1), which the tests assert to fp tolerance.

Multi-host note: the same code runs unchanged on a multi-host mesh built
from ``jax.distributed.initialize`` + all processes' devices; ppermute
rides ICI within a slice and DCN across slices (SURVEY.md §5).

Local tiles are *owned-entries only* along sharded axes and full padded
extent along unsharded axes — e.g. (m, n+2) for 2D rows, (m0, m1) for 2D
blocks, (m, n+2, n+2) for 3D slabs. Each op builds its halo-extended view
on the fly; unsharded-axis parts of the transfer stencils reuse the
single-device separable passes from ``ops/transfer.py``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..grids import Hierarchy, build_hierarchy, interior, pad_interior
from ..ops import laplacian, smoothers, transfer
from ..solvers import cycles


def make_mesh(devices=None, axis: str = "row") -> Mesh:
    """1D device mesh: row (2D) / slab (3D) partitioning (SURVEY.md §3.5)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_block_mesh(shape: Tuple[int, int], devices=None,
                    axes: Tuple[str, str] = ("row", "col")) -> Mesh:
    """2D device mesh: block (2D) / pencil (3D) partitioning.

    ``shape = (D_row, D_col)`` splits array axis 0 over ``axes[0]`` and
    axis 1 over ``axes[1]``. On a real TPU slice, lay the mesh out so both
    axes ride ICI (jax.experimental.mesh_utils.create_device_mesh does this
    automatically on actual pods).
    """
    if devices is None:
        devices = jax.devices()
    nd = int(np.prod(shape))
    return Mesh(np.asarray(devices[:nd]).reshape(shape), axes)


@dataclasses.dataclass(frozen=True)
class Decomp:
    """Which array axes are sharded over which mesh axes.

    ``axes`` maps array axis -> (mesh axis name, devices along it); array
    axes are always a prefix 0..len(axes)-1 (leading axes sharded first).
    ``ndim`` is the grid dimensionality.
    """

    ndim: int
    axes: Tuple[Tuple[int, str, int], ...]

    @property
    def mesh_axes(self) -> Tuple[str, ...]:
        return tuple(ma for _, ma, _ in self.axes)

    def info(self, arr_axis: int) -> Optional[Tuple[str, int]]:
        for a, ma, nd in self.axes:
            if a == arr_axis:
                return ma, nd
        return None

    def spec(self, leading_none: int = 0) -> P:
        """PartitionSpec for a grid array (optionally with leading batch
        axes that stay replicated)."""
        entries = [None] * leading_none
        for a in range(self.ndim):
            i = self.info(a)
            entries.append(i[0] if i is not None else None)
        return P(*entries)


def decomp_from_mesh(mesh: Mesh, ndim: int) -> Decomp:
    """Shard the leading array axes over the mesh axes, in order."""
    names = mesh.axis_names
    if len(names) > ndim:
        raise ValueError(f"mesh has {len(names)} axes but the grid only "
                         f"{ndim} — at most one mesh axis per grid axis")
    sizes = mesh.devices.shape
    return Decomp(ndim=ndim,
                  axes=tuple((a, names[a], int(sizes[a]))
                             for a in range(len(names))))


# ---------------------------------------------------------------------------
# Halo exchange and local (per-shard) stencil ops. All run inside shard_map.
# ---------------------------------------------------------------------------

def _perm_down(d: int):
    """src -> src+1 (deliver my last entry as my next neighbor's near halo)."""
    return [(i, i + 1) for i in range(d - 1)]


def _perm_up(d: int):
    return [(i + 1, i) for i in range(d - 1)]


def _halo_extend_axis(u: jax.Array, arr_axis: int, mesh_axis: str,
                      ndev: int) -> jax.Array:
    """Extend one array axis by its neighbors' edge slabs: m -> m+2.

    Edge devices receive zeros — the Dirichlet ghosts — for free from
    ppermute's no-source semantics.
    """
    v = jnp.moveaxis(u, arr_axis, 0)
    near = jax.lax.ppermute(v[-1:], mesh_axis, _perm_down(ndev))
    far = jax.lax.ppermute(v[:1], mesh_axis, _perm_up(ndev))
    v = jnp.concatenate([near, v, far], axis=0)
    return jnp.moveaxis(v, 0, arr_axis)


def halo_extend(u: jax.Array, axis: str, ndev: int) -> jax.Array:
    """(m, ...) owned tile -> (m+2, ...) with neighbor halos on axis 0."""
    return _halo_extend_axis(u, 0, axis, ndev)


def _neighbor_sum(ext: jax.Array) -> jax.Array:
    """Sum of the 2*ndim face neighbors at every core point of a (locally)
    padded tile."""
    nd = ext.ndim
    out = None
    for a in range(nd):
        lo = tuple(slice(0, -2) if i == a else slice(1, -1)
                   for i in range(nd))
        hi = tuple(slice(2, None) if i == a else slice(1, -1)
                   for i in range(nd))
        t = ext[lo] + ext[hi]
        out = t if out is None else out + t
    return out


def _slice_unsharded(x: jax.Array, decomp: Decomp) -> jax.Array:
    """Take the interior 1:-1 along unsharded (padded) axes only."""
    idx = tuple(slice(None) if decomp.info(a) is not None else slice(1, -1)
                for a in range(x.ndim))
    return x[idx]


def _neighbor_sum_dd(u: jax.Array, decomp: Decomp) -> jax.Array:
    """Face-neighbor sum with compute/comm overlap (SURVEY.md §5, §7 hard
    part #2).

    The halo ``ppermute``s are issued FIRST and their contributions are
    ADDED to the boundary slices after the local stencil sum — so the bulk
    of the stencil work depends only on local data and XLA's latency-hiding
    scheduler can run it while the collective permutes are in flight. (The
    ``halo_extend_all``-then-stencil form serializes: every output element
    depends on the concatenated halo.) Numerically identical up to fp
    summation order on the boundary slices.
    """
    nd = u.ndim
    # 1. Kick off every halo exchange (2 slabs per sharded axis).
    slabs = []
    for a, ma, ndev in decomp.axes:
        v = jnp.moveaxis(u, a, 0)
        near = jax.lax.ppermute(v[-1:], ma, _perm_down(ndev))
        far = jax.lax.ppermute(v[:1], ma, _perm_up(ndev))
        slabs.append((a, jnp.moveaxis(near, 0, a), jnp.moveaxis(far, 0, a)))
    # 2. Local stencil sum with zero edges along sharded axes (unsharded
    #    axes already carry their ghost padding).
    pads = [(1, 1) if decomp.info(a) is not None else (0, 0)
            for a in range(nd)]
    total = _neighbor_sum(jnp.pad(u, pads))
    # 3. Fold the halo slabs into the boundary slices when they arrive.
    for a, near, far in slabs:
        nearc = _slice_unsharded(near, decomp)
        farc = _slice_unsharded(far, decomp)
        m = total.shape[a]
        first = tuple(slice(0, 1) if i == a else slice(None)
                      for i in range(nd))
        last = tuple(slice(m - 1, m) if i == a else slice(None)
                     for i in range(nd))
        total = total.at[first].add(nearc)
        total = total.at[last].add(farc)
    return total


def _pad_unsharded(x: jax.Array, decomp: Decomp) -> jax.Array:
    """Re-add the zero ghost ring along unsharded axes only."""
    pads = [(0, 0) if decomp.info(a) is not None else (1, 1)
            for a in range(x.ndim)]
    return jnp.pad(x, pads)


def _global_ids(shape, decomp: Decomp, arr_axis: int) -> jax.Array:
    """Global padded-grid index of every local entry along one axis.

    Sharded axis: d*m + 1 + i (the near ghost 0 is never stored).
    Unsharded axis: the local index itself (0 = ghost .. n+1 = ghost).
    """
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, arr_axis)
    info = decomp.info(arr_axis)
    if info is not None:
        ma, _ = info
        ids = ids + jax.lax.axis_index(ma) * shape[arr_axis] + 1
    return ids


def _interior_mask(n: int, shape, decomp: Decomp) -> jax.Array:
    mask = None
    for a in range(len(shape)):
        ids = _global_ids(shape, decomp, a)
        if decomp.info(a) is not None:
            cond = ids <= n          # ids >= 1 always on sharded axes
        else:
            cond = (ids >= 1) & (ids <= n)
        mask = cond if mask is None else mask & cond
    return mask


def _coord_sum(shape, decomp: Decomp) -> jax.Array:
    """Sum of global coordinates — the red/black color of each point."""
    s = None
    for a in range(len(shape)):
        ids = _global_ids(shape, decomp, a)
        s = ids if s is None else s + ids
    return s


def s_residual(u, b, n, h, decomp: Decomp, sigma=0.0,
               use_pallas: bool = False):
    """r = b - (A - sigma I) u on owned tiles (one overlapped halo
    exchange round per axis)."""
    if use_pallas and _local_pallas_ok(u, n, "rbgs", decomp):
        return _s_residual_pallas(u, b, n, h, decomp, sigma)
    if (use_pallas and u.ndim == 3
            and _slab3d_ok(u, n, "rbgs", decomp, 1)):
        return _s_residual_slab3d(u, b, n, h, decomp, sigma)
    nbr = _neighbor_sum_dd(u, decomp)
    ctr = _slice_unsharded(u, decomp)
    inv_h2 = 1.0 / (h * h)
    au = (2.0 * decomp.ndim * ctr - nbr) * inv_h2
    r = _slice_unsharded(b, decomp) - au + sigma * ctr
    return jnp.where(_interior_mask(n, u.shape, decomp),
                     _pad_unsharded(r, decomp), jnp.zeros_like(u))


def s_jacobi(u, b, n, h, omega, decomp: Decomp, sigma=0.0):
    r = s_residual(u, b, n, h, decomp, sigma)
    d = laplacian.diag_value(decomp.ndim, h, sigma)
    return u + (omega / d) * r


def s_rbgs(u, b, n, h, decomp: Decomp, sigma=0.0):
    """One full RB-GS sweep == the single-device sweep, exactly.

    Halos are re-exchanged between the red and black half-sweeps so black
    updates see red-updated neighbor cells across shard boundaries.
    """
    h2 = h * h
    den = 2.0 * decomp.ndim - sigma * h2
    colors = _coord_sum(u.shape, decomp) % 2
    imask = _interior_mask(n, u.shape, decomp)
    bcore = _slice_unsharded(b, decomp)
    for parity in (0, 1):
        vals = _pad_unsharded(
            (h2 * bcore + _neighbor_sum_dd(u, decomp)) / den, decomp)
        u = jnp.where(imask & (colors == parity), vals, u)
    return u


def _local_pallas_ok(u, n, kind, decomp: Decomp) -> bool:
    """Shard-local Pallas smoothing is available: 2D row or block
    decomposition, rbgs/jacobi, tile big enough to amortize a kernel
    and deep enough along every sharded axis to hold the 8-deep
    exchanged halo."""
    from ..kernels import PALLAS_MIN_N
    from ..kernels.local2d import HALO_ROWS

    if not (u.ndim == 2 and kind in ("rbgs", "jacobi")
            and n >= PALLAS_MIN_N):
        return False
    for a, _, _ in decomp.axes:
        if u.shape[a] < HALO_ROWS or u.shape[a] % 2 != 0:
            return False
    return True


def _ext_aligned(u, decomp: Decomp, hh: int, r_mult: int = 8):
    """Halo-extend a local tile by hh pre-sweep ghost entries on every
    sharded axis and embed it in the 2D-aligned layout. Axes extend in
    order (rows first, then columns), so the column slabs of a block
    decomposition carry the already-extended rows — the corner ghosts
    the multi-sweep overlap-recompute needs arrive without any diagonal
    communication. ``r_mult=16`` for the whole-leg kernels (their coarse
    DMA offsets are fine-row offsets halved, which must stay 8-aligned)."""
    for a, ma, ndev in decomp.axes:
        v = jnp.moveaxis(u, a, 0)
        near = jax.lax.ppermute(v[-hh:], ma, _perm_down(ndev))
        far = jax.lax.ppermute(v[:hh], ma, _perm_up(ndev))
        u = jnp.moveaxis(jnp.concatenate([near, v, far], axis=0), 0, a)
    rows, cols = u.shape
    r8 = -(-rows // r_mult) * r_mult
    c128 = -(-cols // 128) * 128
    return jnp.pad(u, ((0, r8 - rows), (0, c128 - cols)))


def _refresh_ext(ue, decomp: Decomp, hh: int, ms):
    """Re-exchange the ghost slabs of an extended tile in place.

    After a kernel leg the owned region is exact but the ghost regions
    are stale; this swaps fresh owned-edge slabs with the mesh neighbors
    along each sharded axis (rows first, then columns — the column slabs
    then carry the refreshed row ghosts, i.e. the corner values, exactly
    as _ext_aligned's sequential extension does) — slab ppermutes + slab
    updates instead of rebuilding the whole extended tile. ``ms``: owned
    extent per sharded axis, aligned with ``decomp.axes``.

    Color-packed tiles (rank 3, kernels/plocal2d.py) refresh the same
    way: row slabs move on the plane axis + 1; column ghost slabs are
    lane slabs of BOTH planes at half depth (hh aligned lanes == hh/2
    packed lanes per plane; the packing parity is invariant under the
    mcol shift between column neighbors — mcol is even)."""
    packed = ue.ndim == 3
    for (a, ma, ndev), m in zip(decomp.axes, ms):
        if packed:
            axis, hloc, mloc = ((1, hh, m) if a == 0
                                else (2, hh // 2, m // 2))
        else:
            axis, hloc, mloc = a, hh, m
        v = jnp.moveaxis(ue, axis, 0)
        near = jax.lax.ppermute(v[mloc:hloc + mloc], ma, _perm_down(ndev))
        far = jax.lax.ppermute(v[hloc:2 * hloc], ma, _perm_up(ndev))
        v = jax.lax.dynamic_update_slice_in_dim(v, near, 0, axis=0)
        v = jax.lax.dynamic_update_slice_in_dim(v, far, hloc + mloc,
                                                axis=0)
        ue = jnp.moveaxis(v, 0, axis)
    return ue


def _pack_level_ok(cfg: SolverConfig, decomp: Decomp, level: int) -> bool:
    """STATIC: this level's ext tiles live COLOR-PACKED and run the
    plocal2d whole-leg kernels — the aligned leg path is available AND
    the level is big enough to amortize packing. Exactly one packed
    level (the finest): the packed down leg emits its coarse RHS in the
    aligned extended convention in-kernel, so no packed<->packed
    crossing ever exists (the single-device tier's measured optimum,
    kernels/__init__.py PACK_MIN_N notes)."""
    from ..kernels import PACK_MIN_N

    return (level == 0 and 2 ** cfg.k - 1 >= PACK_MIN_N
            and _leg_level_ok(cfg, decomp, level))


def _cpar(decomp: Decomp) -> int:
    """Packing column-parity phase: parity of the tile's global column
    offset (plocal2d module notes) — 0 when columns carry the global
    padding (rows), 1 when sharded (col_off = d*mcol + 1 - hh, odd)."""
    return 1 if len(decomp.axes) == 2 else 0


def _packed_owned(decomp: Decomp, ms):
    """Owned-region slices of a PACKED extended tile: rows [hh, hh+m);
    lanes all (rows decomposition — the kernels zero non-interior lanes)
    or the owned packed lanes [hh/2, hh/2 + mcol/2) (blocks)."""
    from ..kernels.local2d import HALO_ROWS as hh

    lane_sl = (slice(hh // 2, hh // 2 + ms[1] // 2)
               if len(ms) == 2 else slice(None))
    return (slice(None), slice(hh, hh + ms[0]), lane_sl)


def _ext_coarse_tile(ec, decomp: Decomp, rows_out: int, cols_out: int):
    """HALO_ROWS-extend an owned coarse tile (ppermute, every sharded
    axis) and embed it in the (rows_out, cols_out) extended convention
    for up_leg.

    When the owned tile is shallower than the halo (mc < HALO_ROWS), the
    ghost region's outer entries would belong to devices two hops away;
    they are zero-filled instead. The convention is preserved (ghost
    depth stays HALO_ROWS), and exactness from ghost depth
    2*(HALO_ROWS - mc) inward is all max_up_sweeps' staleness budget
    needs (mc >= HALO_ROWS/2 on every leg-path level)."""
    from ..kernels.local2d import HALO_ROWS as hh

    for a, ma, ndev in decomp.axes:
        v = jnp.moveaxis(ec, a, 0)
        hc = min(hh, v.shape[0])
        near = jax.lax.ppermute(v[-hc:], ma, _perm_down(ndev))
        far = jax.lax.ppermute(v[:hc], ma, _perm_up(ndev))
        zpad = jnp.zeros((hh - hc,) + v.shape[1:], v.dtype)
        ec = jnp.moveaxis(jnp.concatenate([zpad, near, v, far], axis=0),
                          0, a)
    return jnp.pad(ec, ((0, rows_out - ec.shape[0]),
                        (0, cols_out - ec.shape[1])))


def _slice_coarse_ext(full, decomp: Decomp, rows_out: int, cols_out: int):
    """Replicated full padded coarse grid -> my HALO_ROWS-extended tile
    for up_leg — a local slice, no communication (the agglomeration-
    crossing twin of _ext_coarse_tile)."""
    from ..kernels.local2d import HALO_ROWS as hh

    for a, ma, ndev in decomp.axes:
        mc = (full.shape[a] - 1) // ndev
        d = jax.lax.axis_index(ma)
        # Pad by hh so edge devices read zeros (== ppermute edge
        # semantics, == the Dirichlet ghosts), then slice entries
        # d*mc + 1 - hh .. + mc + 2*hh along the axis.
        pads = [(hh, hh) if i == a else (0, 0) for i in range(full.ndim)]
        fp = jnp.pad(full, pads)
        full = jax.lax.dynamic_slice_in_dim(fp, d * mc + 1, mc + 2 * hh,
                                            axis=a)
    return jnp.pad(full, ((0, rows_out - full.shape[0]),
                          (0, cols_out - full.shape[1])))


def _local_offsets(u, decomp: Decomp, hh: int):
    """(row_off, col_off, owned-region slices) of the extended tile.

    Sharded axis: owned entry 0 is global d*m + 1, ghosts shift by hh.
    Unsharded axis: local index == global index (tile carries the global
    padding), offset 0 and the full padded extent kept."""
    offs, sls = [], []
    for a in range(2):
        info = decomp.info(a)
        m = u.shape[a]
        if info is not None:
            ma, _ = info
            offs.append(jax.lax.axis_index(ma) * m + 1 - hh)
            sls.append(slice(hh, hh + m))
        else:
            offs.append(0)
            sls.append(slice(0, m))
    return offs[0], offs[1], tuple(sls)


def _s_smooth_pallas(u, b, n, h, *, kind, omega, sweeps, decomp: Decomp,
                     sigma=0.0):
    """Fused shard-local Pallas smoothing (kernels/local2d.py).

    One ppermute pair per sharded axis exchanges HALO_ROWS pre-sweep
    ghost entries, the whole stage runs as ONE kernel over the
    halo-extended aligned tile (ghost-region overlap-recompute keeps
    owned entries EXACTLY equal to the global sweep — vs the jnp path's
    re-exchange per half-sweep), and the owned region is sliced back
    out. Measured on the chip: the k=12 mesh-of-1 sharded cycle drops
    12.5 -> 4.2 ms (BASELINE.md).
    """
    from ..kernels import local2d

    hh = local2d.HALO_ROWS
    max_f = local2d.max_fused_sweeps(kind)
    row_off, col_off, owned = _local_offsets(u, decomp, hh)

    while sweeps > 0:
        s = min(sweeps, max_f)
        ue = _ext_aligned(u, decomp, hh)
        be = _ext_aligned(b, decomp, hh)
        if kind == "rbgs":
            out = local2d.rbgs_sweep(ue, be, n, h, row_off, col_off,
                                     sigma=sigma, sweeps=s)
        else:
            out = local2d.jacobi_sweep(ue, be, n, h, omega, row_off,
                                       col_off, sigma=sigma, sweeps=s)
        u = out[owned]
        sweeps -= s
    return u


def _s_residual_pallas(u, b, n, h, decomp: Decomp, sigma=0.0):
    """Shard-local Pallas residual (1-deep halo suffices; the 8-deep
    exchange is reused for layout uniformity — the slabs are tiny)."""
    from ..kernels import local2d

    hh = local2d.HALO_ROWS
    row_off, col_off, owned = _local_offsets(u, decomp, hh)
    ue = _ext_aligned(u, decomp, hh)
    be = _ext_aligned(b, decomp, hh)
    out = local2d.residual(ue, be, n, h, row_off, col_off, sigma=sigma)
    return out[owned]


def _s_smooth_residual_pallas(u, b, n, h, *, kind, omega, sweeps,
                              decomp: Decomp, sigma=0.0):
    """Down-leg pair (smooth^nu, residual) from ONE halo exchange and
    ONE extended-tile build: after s sweeps the ghost region is exact to
    depth HALO_ROWS - 2s, so for 2s < HALO_ROWS the residual kernel can
    run directly on the smoothed extended tile — no re-exchange.
    Returns (u_smoothed, r), both owned tiles."""
    from ..kernels import local2d

    hh = local2d.HALO_ROWS
    row_off, col_off, owned = _local_offsets(u, decomp, hh)
    ue = _ext_aligned(u, decomp, hh)
    be = _ext_aligned(b, decomp, hh)
    if kind == "rbgs":
        us = local2d.rbgs_sweep(ue, be, n, h, row_off, col_off,
                                sigma=sigma, sweeps=sweeps)
    else:
        us = local2d.jacobi_sweep(ue, be, n, h, omega, row_off, col_off,
                                  sigma=sigma, sweeps=sweeps)
    r = local2d.residual(us, be, n, h, row_off, col_off, sigma=sigma)
    return us[owned], r[owned]


def _slab3d_ok(u, n: int, kind: str, decomp: Decomp, hz: int) -> bool:
    """Slab-local 3D Pallas smoothing available: 3D plane (slab)
    decomposition, rbgs/jacobi, plane dims big enough for the kernel
    tier and within its VMEM plane budget, tile deep enough to exchange
    the hz-plane halo (VERDICT.md round-3 item 4: the promised
    slab-sharded plane-pipeline kernel)."""
    from ..grids import aligned3_shape
    from ..kernels import PALLAS3_MIN_N
    from ..kernels.stencil3d import fits_vmem

    if not (u.ndim == 3 and len(decomp.axes) == 1
            and decomp.axes[0][0] == 0 and kind in ("rbgs", "jacobi")
            and n >= PALLAS3_MIN_N and u.shape[0] >= max(hz, 3)):
        return False
    _, r, c = aligned3_shape(n)
    return fits_vmem(r, c, u.dtype)


def _slab3d_hz(kind: str, sweeps: int) -> int:
    """Ghost planes needed per side: each chained kernel call goes stale
    2 planes inward for RB-GS (red reads +-1 around black's +-1), 1 for
    Jacobi — the kernel zeroes, not recomputes, the stack's edge
    planes."""
    return 2 * sweeps if kind == "rbgs" else sweeps


def _s_smooth_slab3d(u, b, n, h, *, kind, omega, sweeps, decomp: Decomp,
                     sigma=0.0):
    """Slab-local plane-pipeline smoothing: ONE ppermute pair exchanges
    the hz-plane halo, the whole stage streams through the plane-rolling
    kernels (kernels/stencil3d.py) with the tile's global plane offset
    as an SMEM scalar, and the owned planes come back EXACTLY equal to
    the global sweep (ghost-plane overlap-recompute, as in local2d)."""
    from ..grids import aligned3_shape
    from ..kernels import stencil3d

    (a, ma, nd), = decomp.axes
    m = u.shape[0]
    hz = _slab3d_hz(kind, sweeps)
    goff = jax.lax.axis_index(ma) * m + 1 - hz

    def ext(v):
        near = jax.lax.ppermute(v[-hz:], ma, _perm_down(nd))
        far = jax.lax.ppermute(v[:hz], ma, _perm_up(nd))
        v = jnp.concatenate([near, v, far], axis=0)
        _, r, c = aligned3_shape(n)
        pe = -(-v.shape[0] // 4) * 4    # batched-kernel plane blocks
        return jnp.pad(v, ((0, pe - v.shape[0]), (0, r - v.shape[1]),
                           (0, c - v.shape[2])))

    ue, be = ext(u), ext(b)
    if kind == "rbgs":
        out = stencil3d.rbgs_sweep(ue, be, n, h, sigma=sigma,
                                   sweeps=sweeps, goff=goff)
    else:
        out = stencil3d.jacobi_sweep(ue, be, n, h, omega, sigma=sigma,
                                     sweeps=sweeps, goff=goff)
    return out[hz:hz + m, :n + 2, :n + 2]


def _s_smooth_residual_slab3d(u, b, n, h, *, kind, omega, sweeps,
                              decomp: Decomp, sigma=0.0):
    """3D down-leg pair (smooth^nu, residual) from ONE halo exchange and
    ONE extended-stack build (the 2D _s_smooth_residual_pallas pattern
    on slabs): exchange one extra ghost plane beyond the smoothing
    budget, run the smoother, then the residual kernel directly on the
    smoothed extended stack — its 1-plane ghost reads sit inside the
    remaining staleness budget. Returns (u_smoothed, r), owned tiles."""
    from ..grids import aligned3_shape
    from ..kernels import stencil3d

    (a, ma, nd), = decomp.axes
    m = u.shape[0]
    hz = _slab3d_hz(kind, sweeps) + 1
    goff = jax.lax.axis_index(ma) * m + 1 - hz

    def ext(v):
        near = jax.lax.ppermute(v[-hz:], ma, _perm_down(nd))
        far = jax.lax.ppermute(v[:hz], ma, _perm_up(nd))
        v = jnp.concatenate([near, v, far], axis=0)
        _, r, c = aligned3_shape(n)
        pe = -(-v.shape[0] // 4) * 4
        return jnp.pad(v, ((0, pe - v.shape[0]), (0, r - v.shape[1]),
                           (0, c - v.shape[2])))

    ue, be = ext(u), ext(b)
    if kind == "rbgs":
        us = stencil3d.rbgs_sweep(ue, be, n, h, sigma=sigma,
                                  sweeps=sweeps, goff=goff)
    else:
        us = stencil3d.jacobi_sweep(ue, be, n, h, omega, sigma=sigma,
                                    sweeps=sweeps, goff=goff)
    r = stencil3d.residual(us, be, n, h, sigma=sigma, goff=goff)
    return (us[hz:hz + m, :n + 2, :n + 2],
            r[hz:hz + m, :n + 2, :n + 2])


def _slab3d_hz_level(cfg: SolverConfig) -> int:
    """Ghost planes for one EXT-CARRIED slab level: the down leg needs
    smoothing staleness + 1 residual plane (2*nu1 + 1 rbgs / nu1 + 1
    jacobi), the up leg its smoothing staleness."""
    if cfg.smoother == "rbgs":
        return max(2 * cfg.nu1 + 1, 2 * cfg.nu2)
    return max(cfg.nu1 + 1, cfg.nu2)


def _pencil3d_ok(u, n: int, cfg: SolverConfig, decomp: Decomp) -> bool:
    """Pencil (2-axis) 3D kernel tier available: planes AND rows
    sharded, rbgs/jacobi, level big enough, tiles deep enough along both
    sharded axes for the ghost budget, the extended plane within the
    kernel's VMEM budget (round 5 — closes VERDICT round-4 missing #3:
    the stencil3d masks take the global row offset as an SMEM scalar,
    so the same plane-rolling kernels serve pencil tiles)."""
    from ..grids import aligned3_shape
    from ..kernels import PALLAS3_MIN_N
    from ..kernels.stencil3d import fits_vmem

    if not (u.ndim == 3 and len(decomp.axes) == 2
            and decomp.axes[0][0] == 0 and decomp.axes[1][0] == 1
            and cfg.smoother in ("rbgs", "jacobi")
            and n >= PALLAS3_MIN_N):
        return False
    hz = _slab3d_hz_level(cfg)
    if u.shape[0] < max(hz, 3) or u.shape[1] < hz:
        return False
    _, _, ca = aligned3_shape(n)
    rk = -(-(u.shape[1] + 2 * hz) // 8) * 8
    return fits_vmem(rk, ca, u.dtype)


def _slab3d_level(hier: Hierarchy, cfg: SolverConfig, decomp: Decomp,
                  x, b, level: int, gamma: int, sigma, cfg_repl,
                  out_dtype=None):
    """One cycle level on a slab- or pencil-sharded 3D grid with the
    halo-extended aligned3 stacks built ONCE per level visit (round 5:
    the per-stage concat+pad ext rebuilds cost ~20 ms of the 511^3
    cycle): down smooth -> residual on the same stack -> restrict from
    its owned slice -> coarse correction added in place -> ghost refresh
    -> up smooth. Owned tiles in/out; identical values to the stagewise
    path (ghost overlap-recompute staleness budgets, tests pin it).

    Pencil decompositions extend BOTH the plane and row axes (planes
    first, then rows — the row slabs then carry the refreshed plane
    ghosts, i.e. the corner values, as in the 2D block machinery); the
    kernels take the global (plane, row) offsets as SMEM scalars."""
    from ..grids import aligned3_shape
    from ..kernels import stencil3d

    spec = hier.levels[level]
    n, h = spec.n, spec.h
    omega = cfg.effective_omega()
    pencil = len(decomp.axes) == 2
    _, ma0, nd0 = decomp.axes[0]
    m0 = x.shape[0]
    hz = _slab3d_hz_level(cfg)
    goff = jax.lax.axis_index(ma0) * m0 + 1 - hz
    _, ra, ca = aligned3_shape(n)
    pe = -(-(m0 + 2 * hz) // 4) * 4
    if pencil:
        _, ma1, nd1 = decomp.axes[1]
        m1 = x.shape[1]
        roff = jax.lax.axis_index(ma1) * m1 + 1 - hz
        rk = -(-(m1 + 2 * hz) // 8) * 8
        row_sl = slice(hz, hz + m1)
    else:
        roff, rk = 0, ra
        row_sl = slice(0, n + 2)

    def ext(v):
        near = jax.lax.ppermute(v[-hz:], ma0, _perm_down(nd0))
        far = jax.lax.ppermute(v[:hz], ma0, _perm_up(nd0))
        v = jnp.concatenate([near, v, far], axis=0)
        if pencil:
            nearr = jax.lax.ppermute(v[:, -hz:], ma1, _perm_down(nd1))
            farr = jax.lax.ppermute(v[:, :hz], ma1, _perm_up(nd1))
            v = jnp.concatenate([nearr, v, farr], axis=1)
        return jnp.pad(v, ((0, pe - v.shape[0]), (0, rk - v.shape[1]),
                           (0, ca - v.shape[2])))

    def smooth_e2(xe, be, sweeps, odt=None):
        if cfg.smoother == "rbgs":
            return stencil3d.rbgs_sweep(xe, be, n, h, sigma=sigma,
                                        sweeps=sweeps, goff=goff,
                                        roff=roff, out_dtype=odt)
        return stencil3d.jacobi_sweep(xe, be, n, h, omega, sigma=sigma,
                                      sweeps=sweeps, goff=goff,
                                      roff=roff, out_dtype=odt)

    xe, be = ext(x), ext(b)
    xe = smooth_e2(xe, be, cfg.nu1)
    # The residual kernel emits the COMPUTE dtype (f32 for bf16 tiles),
    # so the whole coarse correction runs at full precision — the
    # packed2d coarse-at-f32 discipline for free.
    r = stencil3d.residual(xe, be, n, h, sigma=sigma, goff=goff,
                           roff=roff)
    rc = s_restrict(r[hz:hz + m0, row_sl, :n + 2], n, decomp)
    corr = _coarse_correction(hier, cfg, decomp, rc, level, gamma,
                              sigma, cfg_repl)
    corr = jnp.pad(corr, ((0, 0), (0, 0),
                          (0, ca - corr.shape[2]))).astype(x.dtype)
    row0 = hz if pencil else 0
    xe = jax.lax.dynamic_update_slice(
        xe,
        jax.lax.dynamic_slice(xe, (hz, row0, 0), corr.shape) + corr,
        (hz, row0, 0))
    # Ghost refresh (slab ppermutes; stale since the down smoothing, and
    # the exchanged owned slabs carry the correction). Planes first,
    # then rows (corner transport, as in _refresh_ext).
    near = jax.lax.ppermute(xe[m0:hz + m0], ma0, _perm_down(nd0))
    far = jax.lax.ppermute(xe[hz:2 * hz], ma0, _perm_up(nd0))
    xe = jax.lax.dynamic_update_slice_in_dim(xe, near, 0, axis=0)
    xe = jax.lax.dynamic_update_slice_in_dim(xe, far, hz + m0, axis=0)
    if pencil:
        nearr = jax.lax.ppermute(xe[:, m1:hz + m1], ma1,
                                 _perm_down(nd1))
        farr = jax.lax.ppermute(xe[:, hz:2 * hz], ma1, _perm_up(nd1))
        xe = jax.lax.dynamic_update_slice_in_dim(xe, nearr, 0, axis=1)
        xe = jax.lax.dynamic_update_slice_in_dim(xe, farr, hz + m1,
                                                 axis=1)
    xe = smooth_e2(xe, be, cfg.nu2, out_dtype)
    return xe[hz:hz + m0, row_sl, :n + 2]


def _s_residual_slab3d(u, b, n, h, decomp: Decomp, sigma=0.0):
    """Slab-local 3D residual (1-plane halo)."""
    from ..grids import aligned3_shape
    from ..kernels import stencil3d

    (a, ma, nd), = decomp.axes
    m = u.shape[0]
    goff = jax.lax.axis_index(ma) * m

    def ext(v):
        near = jax.lax.ppermute(v[-1:], ma, _perm_down(nd))
        far = jax.lax.ppermute(v[:1], ma, _perm_up(nd))
        v = jnp.concatenate([near, v, far], axis=0)
        _, r, c = aligned3_shape(n)
        pe = -(-v.shape[0] // 4) * 4    # batched-kernel plane blocks
        return jnp.pad(v, ((0, pe - v.shape[0]), (0, r - v.shape[1]),
                           (0, c - v.shape[2])))

    out = stencil3d.residual(ext(u), ext(b), n, h, sigma=sigma, goff=goff)
    return out[1:1 + m, :n + 2, :n + 2]


def s_smooth(u, b, n, h, *, kind, omega, sweeps, decomp: Decomp, sigma=0.0,
             use_pallas: bool = False):
    if kind == "chebyshev":
        # Apply-only smoother: the generic Chebyshev recurrence over the
        # halo-exchanging residual — one ppermute round per application,
        # identical comm cost to Jacobi, RB-GS-class smoothing. No sweep-
        # order coupling across shards, so sharded == unsharded exactly.
        diag = laplacian.diag_value(decomp.ndim, h, sigma)
        return smoothers.chebyshev_generic(
            u, b, sweeps, diag,
            lambda uu, bb: s_residual(uu, bb, n, h, decomp, sigma,
                                      use_pallas=use_pallas))
    if use_pallas and _local_pallas_ok(u, n, kind, decomp):
        return _s_smooth_pallas(u, b, n, h, kind=kind, omega=omega,
                                sweeps=sweeps, decomp=decomp, sigma=sigma)
    if (use_pallas and u.ndim == 3
            and _slab3d_ok(u, n, kind, decomp, _slab3d_hz(kind, sweeps))):
        return _s_smooth_slab3d(u, b, n, h, kind=kind, omega=omega,
                                sweeps=sweeps, decomp=decomp, sigma=sigma)
    for _ in range(sweeps):
        if kind == "jacobi":
            u = s_jacobi(u, b, n, h, omega, decomp, sigma)
        elif kind == "rbgs":
            u = s_rbgs(u, b, n, h, decomp, sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
    return u


def s_restrict(r, n, decomp: Decomp):
    """Full-weighting to the coarse owned tile — d separable axis passes.

    Sharded axis (owned entries, m -> m/2): coarse owned entry q (global
    jc = d*mc + 1 + q) reads fine extended entries 2q+1, 2q+2, 2q+3 —
    i.e. only the far halo. Unsharded axes reuse the single-device pass.
    """
    nc = (n - 1) // 2
    for a in transfer._axis_order(r.ndim):
        info = decomp.info(a)
        if info is None:
            r = transfer._restrict_axis(r, a)
        else:
            ma, nd = info
            v = jnp.moveaxis(r, a, 0)
            m = v.shape[0]
            mc = m // 2
            # Only the FAR halo is read (coarse q reads fine 2q+1..2q+3,
            # i.e. owned entries plus the next neighbor's first row for
            # q = mc-1). Issue the ppermute first and fold it in as an
            # additive fixup so the bulk sum overlaps the exchange.
            far = jax.lax.ppermute(v[:1], ma, _perm_up(nd))
            third = jnp.pad(v[2::2], [(0, 1)] + [(0, 0)] * (v.ndim - 1))
            w = 0.25 * (v[0:m - 1:2] + 2.0 * v[1:m:2] + third)
            w = w.at[mc - 1:mc].add(0.25 * far)
            r = jnp.moveaxis(w, 0, a)
    mask = _interior_mask(nc, r.shape, decomp)
    return jnp.where(mask, r, jnp.zeros_like(r))


def s_prolong(e, nc, decomp: Decomp):
    """(Bi/tri)linear interpolation to the fine owned tile — d separable
    axis passes.

    Sharded axis (mc -> 2*mc owned entries): fine owned entry i (global
    f = d*m + 1 + i): even f -> coarse entry f/2 (extended index (i+1)/2),
    odd f -> average of its two coarse neighbors — i.e. only the near halo.
    """
    n = 2 * nc + 1
    for a in transfer._axis_order(e.ndim):
        info = decomp.info(a)
        if info is None:
            e = transfer._prolong_axis(e, a)
        else:
            ma, nd = info
            v = jnp.moveaxis(e, a, 0)
            mc = v.shape[0]
            # Only the NEAR halo is read (fine owned entry 0 is odd and
            # averages coarse entries on both sides of the boundary);
            # overlapped additive fixup as in s_restrict.
            near = jax.lax.ppermute(v[-1:], ma, _perm_down(nd))
            prev = jnp.pad(v[: mc - 1],
                           [(1, 0)] + [(0, 0)] * (v.ndim - 1))
            odd_f = 0.5 * (prev + v)                   # fine i = 0, 2, ...
            odd_f = odd_f.at[0:1].add(0.5 * near)
            # Interleave via stack+reshape — contiguous, no strided
            # scatter (XLA lowers .at[0::2].set to a milliseconds-slow
            # relayout on TPU).
            out = jnp.stack([odd_f, v], axis=1).reshape(
                (2 * mc,) + v.shape[1:])
            e = jnp.moveaxis(out, 0, a)
    mask = _interior_mask(n, e.shape, decomp)
    return jnp.where(mask, e, jnp.zeros_like(e))


# Static-unroll block map (vmap of the manual-DMA Pallas kernels fails on
# real TPU) — single-sourced in solvers.eigen next to the shared drivers.
from ..solvers.eigen import _stack_map


def _psum_sq(x, decomp: Decomp):
    return jax.lax.psum(jnp.sum(x * x), decomp.mesh_axes)


# ---------------------------------------------------------------------------
# The sharded cycle: sharded fine levels, replicated (agglomerated) coarse
# levels, all inside one shard_map region.
# ---------------------------------------------------------------------------

def _level_rows(k: int, level: int) -> int:
    """Sharded entry count (interior + far ghost) at a level: 2^(k-level)."""
    return 2 ** (k - level)


def _is_sharded(cfg: SolverConfig, decomp: Decomp, level: int) -> bool:
    # The coarsest level is ALWAYS replicated (its direct solve runs on
    # every device) — without this, a small mesh with small agglom_rows
    # could leave the last level "sharded" and the cycle would recurse
    # past the hierarchy (e.g. k=5 on a 2x2 mesh: the 4-row coarsest
    # level splits 2/device >= agglom_rows).
    if level >= len(cfg.level_sizes()) - 1:
        return False
    rows = _level_rows(cfg.k, level)
    for _, _, nd in decomp.axes:
        if rows % nd != 0 or rows // nd < max(cfg.agglom_rows, 2):
            return False
    return True


def _gather_full(u_local, decomp: Decomp):
    """Owned tiles -> replicated full padded grid (the agglomeration step)."""
    for a, ma, _ in decomp.axes:
        u_local = jax.lax.all_gather(u_local, ma, axis=a, tiled=True)
    pads = [(1, 0) if decomp.info(a) is not None else (0, 0)
            for a in range(u_local.ndim)]
    return jnp.pad(u_local, pads)       # re-add the near ghosts


def _scatter_local(full, decomp: Decomp):
    """Replicated full padded grid -> my owned tile."""
    for a, ma, nd in decomp.axes:
        m = (full.shape[a] - 1) // nd
        d = jax.lax.axis_index(ma)
        full = jax.lax.dynamic_slice_in_dim(full, d * m + 1, m, axis=a)
    return full


def _leg_level_ok(cfg: SolverConfig, decomp: Decomp, level: int) -> bool:
    """STATIC check: whole-leg shard-local kernels available at a level —
    2D row OR block decomposition, rbgs/jacobi within the fused-sweep
    staleness budgets, the level sharded with tiles deep enough for the
    halo along every sharded axis."""
    from ..kernels import PALLAS_MIN_N, local2d

    if not (cfg.use_pallas and cfg.ndim == 2
            and 1 <= len(decomp.axes) <= 2
            and all(decomp.axes[i][0] == i
                    for i in range(len(decomp.axes)))
            and cfg.smoother in ("rbgs", "jacobi")
            and cfg.nu1 <= local2d.max_down_sweeps(cfg.smoother)
            and cfg.nu2 <= local2d.max_up_sweeps(cfg.smoother)
            and level < cfg.k - 1
            and _is_sharded(cfg, decomp, level)):
        return False
    n = 2 ** (cfg.k - level) - 1
    if n < PALLAS_MIN_N:
        return False
    for _, _, nd in decomp.axes:
        ma = _level_rows(cfg.k, level) // nd
        if ma % 2 != 0 or ma < local2d.HALO_ROWS:
            return False
    return True


def _leg_cycle_ext(hier: Hierarchy, cfg: SolverConfig, decomp: Decomp,
                   xe, be, level: int, gamma: int, sigma,
                   fresh: bool = False, out_dtype=None):
    """One cycle level on the whole-leg kernel path (VERDICT.md round-3
    item 1), entirely in EXTENDED tile layout: the down leg (smooth^nu1
    -> residual -> restrict) and the up leg (prolong -> correct ->
    smooth^nu2) each run as ONE Pallas kernel; the down leg emits the
    coarse RHS already in extended layout, so a sharded coarse level is
    one ghost-slab refresh away and its up-leg output chains straight
    back as this level's correction operand — zero relayout copies
    between kernels.

    xe/be: extended aligned tiles — or packed (2, r, cp) tiles when the
    level packs (``_pack_level_ok``; the coarse RHS crosses to the
    aligned convention in-kernel, so everything below this level is
    unchanged). xe's ghosts may be stale unless ``fresh``. Returns the
    post-smoothed extended tile (ghosts STALE) in the level's layout."""
    from ..kernels import local2d, plocal2d

    hh = local2d.HALO_ROWS
    # Layout is the CALLER's choice, carried by the tiles themselves
    # (packed tiles are rank 3): solve loops that amortize the pack over
    # many cycles pack; per-application entries stay aligned (one XLA
    # strided pack/unpack costs more than a packed cycle saves).
    packed = xe.ndim == 3
    spec = hier.levels[level]
    n, h = spec.n, spec.h
    omega = cfg.effective_omega()
    rows = _level_rows(cfg.k, level)
    ax0 = decomp.axes[0]
    m = rows // ax0[2]
    mc = m // 2
    row_off = jax.lax.axis_index(ax0[1]) * m + 1 - hh
    if len(decomp.axes) == 2:
        ax1 = decomp.axes[1]
        mcol = rows // ax1[2]
        col_off = jax.lax.axis_index(ax1[1]) * mcol + 1 - hh
        ms = (m, mcol)
        mcs = (mc, mcol // 2)
    else:
        mcol, col_off = 0, 0
        ms = (m,)
        mcs = (mc,)
    if not fresh:
        xe = _refresh_ext(xe, decomp, hh, ms)
    leg_mod = plocal2d if packed else local2d
    us_ext, rc_ext = leg_mod.down_leg(xe, be, n, h, m, row_off, col_off,
                                      kind=cfg.smoother, omega=omega,
                                      sweeps=cfg.nu1, sigma=sigma,
                                      mcol=mcol)
    ncoarse = hier.levels[level + 1].n

    def rc_owned():
        csl = (slice(hh, hh + mcol // 2) if mcol
               else slice(0, ncoarse + 2))
        return rc_ext[hh:hh + mc, csl]

    if _leg_level_ok(cfg, decomp, level + 1):
        be_c = _refresh_ext(rc_ext, decomp, hh, mcs)
        ec = jnp.zeros_like(be_c)
        for g in range(gamma):
            ec = _leg_cycle_ext(hier, cfg, decomp, ec, be_c, level + 1,
                                gamma, sigma, fresh=(g == 0))
        ee = _refresh_ext(ec, decomp, hh, mcs)
    elif _is_sharded(cfg, decomp, level + 1):
        # Sharded but below the kernel thresholds: owned-tile recursion.
        rc = rc_owned()
        ec = jnp.zeros_like(rc)
        for _ in range(gamma):
            ec = _sharded_v_cycle(hier, cfg, decomp, ec, rc,
                                  level + 1, gamma, sigma)
        ee = _ext_coarse_tile(ec, decomp, rc_ext.shape[0],
                              rc_ext.shape[1])
    else:
        # Agglomerate: gather the coarse RHS, recurse replicated; the
        # up-leg kernel then reads this device's coarse slice directly
        # from the replicated result — no scatter communication.
        cfg_repl = dataclasses.replace(cfg, use_pallas=False)
        rc_full = _gather_full(rc_owned(), decomp)
        ec_full = jnp.zeros_like(rc_full)
        for _ in range(gamma):
            ec_full = cycles.v_cycle(hier, ec_full, rc_full, cfg_repl,
                                     level=level + 1, gamma=gamma,
                                     sigma=sigma)
        ee = _slice_coarse_ext(ec_full, decomp, rc_ext.shape[0],
                               rc_ext.shape[1])
    xe2 = _refresh_ext(us_ext, decomp, hh, ms)
    return leg_mod.up_leg(xe2, ee, be, n, ncoarse, h, m, row_off, col_off,
                          kind=cfg.smoother, omega=omega, sweeps=cfg.nu2,
                          sigma=sigma, out_dtype=out_dtype, mcol=mcol)


def mixed_leg_dtype(cfg: SolverConfig, decomp: Decomp):
    """Sharded twin of ``krylov.mixed_cycle_dtype``: the Krylov-wrapped
    distributed solvers honor ``precond_dtype`` only where the cycle
    runs the whole-leg kernels — 2D row AND block decompositions
    (``_leg_level_ok``) — whose tiles are widened to f32 in registers
    and whose down legs emit the coarse RHS at f32
    (kernels/local2d._cdt) — so low precision only ever touches the fine
    level's HBM traffic. Everywhere else (jnp tile stencils, small
    levels; 3D slabs have their own gate, ``mixed_slab_dtype``) raw
    bfloat16 stencil algebra at 1/h^2 ~ 4^k scale is catastrophic
    cancellation, and the cast is skipped — the preconditioner runs in
    full ``dtype``."""
    pd = cfg.cycle_dtype()
    if pd == jnp.dtype(cfg.dtype):
        return None
    if not _leg_level_ok(cfg, decomp, 0):
        return None
    return pd


def mixed_slab_dtype(cfg: SolverConfig, decomp: Decomp):
    """3D twin of ``mixed_leg_dtype``: precond_dtype is honored on slab
    decompositions whose fine level runs the stencil3d kernel tier —
    whose rings widen bf16 to f32 in registers and whose residual emits
    f32 (the coarse correction then runs at full precision
    automatically). The 3D kernels sit at the Mosaic DMA cap
    (BASELINE.md round-4), so halving the bytes is a direct win."""
    pd = cfg.cycle_dtype()
    if pd == jnp.dtype(cfg.dtype):
        return None
    if (cfg.ndim != 3 or not cfg.use_pallas
            or cfg.smoother not in ("rbgs", "jacobi")
            or len(decomp.axes) not in (1, 2)
            or any(decomp.axes[i][0] != i
                   for i in range(len(decomp.axes)))):
        return None
    from ..grids import aligned3_shape
    from ..kernels import PALLAS3_MIN_N
    from ..kernels.stencil3d import fits_vmem

    n = cfg.n
    hz = _slab3d_hz_level(cfg)
    m0 = 2 ** cfg.k // decomp.axes[0][2]
    if (n < PALLAS3_MIN_N or m0 < max(hz, 3)
            or not _is_sharded(cfg, decomp, 0)):
        return None
    _, r, c = aligned3_shape(n)
    if len(decomp.axes) == 2:   # pencil: rows sharded too
        m1 = 2 ** cfg.k // decomp.axes[1][2]
        if m1 < hz:
            return None
        r = -(-(m1 + 2 * hz) // 8) * 8
    if not fits_vmem(r, c, pd):
        return None
    return pd


def _sharded_v_cycle_leg(hier: Hierarchy, cfg: SolverConfig,
                         decomp: Decomp, x, b, level: int, gamma: int,
                         sigma, out_dtype=None):
    """Owned-tile PER-APPLICATION entry to the ext-form whole-leg cycle
    (the LOBPCG preconditioner, FMG-internal polish cycles, v_cycle_fn).
    Always runs the ALIGNED layout: one XLA strided pack/unpack costs
    more than a packed cycle saves, so packing only pays where a solve
    loop amortizes it over many cycles (_build_solve, _build_pcg, the
    eigensolver inner loops — which pack their carried tiles
    themselves)."""
    from ..kernels import local2d

    hh = local2d.HALO_ROWS
    _, _, owned = _local_offsets(x, decomp, hh)
    xe = _ext_aligned(x, decomp, hh, r_mult=16)
    be = _ext_aligned(b, decomp, hh, r_mult=16)
    out = _leg_cycle_ext(hier, cfg, decomp, xe, be, level, gamma, sigma,
                         fresh=True, out_dtype=out_dtype)
    return out[owned]


def _sharded_v_cycle(hier: Hierarchy, cfg: SolverConfig, decomp: Decomp,
                     x, b, level: int, gamma: int = 1, sigma=0.0,
                     out_dtype=None):
    """Recursive cycle; per-level arrays are owned tiles while the level is
    sharded and full replicated grids below the agglomeration cutoff.
    ``sigma`` shifts the operator to A - sigma*I (eigensolver inner
    solves, SURVEY.md §3.3)."""
    spec = hier.levels[level]
    n, h = spec.n, spec.h
    omega = cfg.effective_omega()
    # Replicated (agglomerated) levels hold LOGICAL grids, not the
    # aligned/packed layouts the Pallas backend expects — and they are
    # small by construction — so the replicated region always runs the
    # jnp backend. use_pallas only routes the shard-local smoothing
    # (kernels/local2d.py).
    cfg_repl = (dataclasses.replace(cfg, use_pallas=False)
                if cfg.use_pallas else cfg)
    if not _is_sharded(cfg, decomp, level):
        # Replicated region: identical unsharded cycle on every device.
        return cycles.v_cycle(hier, x, b, cfg_repl, level=level,
                              gamma=gamma, sigma=sigma)
    if _leg_level_ok(cfg, decomp, level):
        return _sharded_v_cycle_leg(hier, cfg, decomp, x, b, level,
                                    gamma, sigma, out_dtype=out_dtype)
    # Slab/pencil-sharded 3D level with the ext stacks built once (the
    # 3D twin of the whole-leg ext carry).
    if (cfg.use_pallas and x.ndim == 3
            and cfg.smoother in ("rbgs", "jacobi")
            and (_slab3d_ok(x, n, cfg.smoother, decomp,
                            _slab3d_hz_level(cfg))
                 or _pencil3d_ok(x, n, cfg, decomp))):
        return _slab3d_level(hier, cfg, decomp, x, b, level, gamma,
                             sigma, cfg_repl, out_dtype=out_dtype)
    # Down-leg smooth+residual share one halo exchange and extended-tile
    # build on the kernel path (residual ghost reads stay exact while
    # 2*nu1 < HALO_ROWS for rbgs / nu1 < HALO_ROWS for jacobi).
    from ..kernels.local2d import HALO_ROWS as _hr

    _stale = 2 * cfg.nu1 if cfg.smoother == "rbgs" else cfg.nu1
    if (cfg.use_pallas and _local_pallas_ok(x, n, cfg.smoother, decomp)
            and cfg.smoother in ("rbgs", "jacobi") and _stale < _hr):
        x, r = _s_smooth_residual_pallas(
            x, b, n, h, kind=cfg.smoother, omega=omega, sweeps=cfg.nu1,
            decomp=decomp, sigma=sigma)
    elif (cfg.use_pallas and x.ndim == 3
          and cfg.smoother in ("rbgs", "jacobi")
          and _slab3d_ok(x, n, cfg.smoother, decomp,
                         _slab3d_hz(cfg.smoother, cfg.nu1) + 1)):
        x, r = _s_smooth_residual_slab3d(
            x, b, n, h, kind=cfg.smoother, omega=omega, sweeps=cfg.nu1,
            decomp=decomp, sigma=sigma)
    else:
        x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                     sweeps=cfg.nu1, decomp=decomp, sigma=sigma,
                     use_pallas=cfg.use_pallas)
        r = s_residual(x, b, n, h, decomp, sigma,
                       use_pallas=cfg.use_pallas)
    rc = s_restrict(r, n, decomp)
    x = x + _coarse_correction(hier, cfg, decomp, rc, level, gamma,
                               sigma, cfg_repl)
    x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                 sweeps=cfg.nu2, decomp=decomp, sigma=sigma,
                 use_pallas=cfg.use_pallas)
    return x


def _coarse_correction(hier, cfg, decomp, rc, level, gamma, sigma,
                       cfg_repl):
    """gamma coarse cycles on the restricted RHS, prolonged back to this
    level's owned tiles (the shared middle of every stagewise cycle)."""
    nc = hier.levels[level + 1].n
    if not _is_sharded(cfg, decomp, level + 1):
        # Agglomerate: gather the coarse RHS, recurse replicated, scatter.
        rc_full = _gather_full(rc, decomp)
        ec_full = jnp.zeros_like(rc_full)
        for _ in range(gamma):
            ec_full = cycles.v_cycle(hier, ec_full, rc_full, cfg_repl,
                                     level=level + 1, gamma=gamma,
                                     sigma=sigma)
        return _scatter_local(transfer.prolong(ec_full), decomp)
    ec = jnp.zeros_like(rc)
    for _ in range(gamma):
        ec = _sharded_v_cycle(hier, cfg, decomp, ec, rc,
                              level + 1, gamma, sigma)
    return s_prolong(ec, nc, decomp)


def _sharded_fmg(hier: Hierarchy, cfg: SolverConfig, decomp: Decomp,
                 b, gamma: int = 1, n_vcycles: int = 1):
    """Distributed full multigrid (SURVEY.md §3.2 on the §3.5 runtime).

    The RHS is restricted down through the sharded levels (halo ppermute),
    gathered at the agglomeration cutoff, direct-solved replicated on the
    coarsest level, and the solution walked back up — scattered into owned
    tiles when it re-enters the sharded region — with ``n_vcycles``
    distributed V-cycles per level.
    """
    bs = [b]
    for lev in range(hier.num_levels - 1):
        if _is_sharded(cfg, decomp, lev):
            if _is_sharded(cfg, decomp, lev + 1):
                bs.append(s_restrict(bs[-1], hier.levels[lev].n, decomp))
            else:  # crossing the agglomeration cutoff
                full = _gather_full(bs[-1], decomp)
                bs.append(transfer.restrict(full))
        else:
            bs.append(transfer.restrict(bs[-1]))
    # The coarsest level is always replicated (agglom_rows >= 2 guarantees
    # tiny levels fail _is_sharded).
    x = cycles.coarse_solve(hier, bs[-1], backend=cycles.JNP_BACKEND)
    for level in range(hier.num_levels - 2, -1, -1):
        if _is_sharded(cfg, decomp, level):
            if _is_sharded(cfg, decomp, level + 1):
                x = s_prolong(x, hier.levels[level + 1].n, decomp)
            else:  # re-entering the sharded region
                xf_full = transfer.prolong(x)
                x = _scatter_local(xf_full, decomp)
        else:
            x = transfer.prolong(x)
        for _ in range(n_vcycles):
            x = _sharded_v_cycle(hier, cfg, decomp, x, bs[level],
                                 level, gamma)
    return x


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def _to_global(host_array, sharding: NamedSharding) -> jax.Array:
    """Process-safe ``device_put``: build a global sharded array from a
    host array that every process holds in full (SPMD replicated input).

    ``jax.make_array_from_callback`` asks each process for the data of its
    *addressable* shards only, so this works identically under the
    single-controller runtime here and under true multi-process
    ``jax.distributed`` (where a global ``device_put`` would throw on
    non-addressable devices — VERDICT.md round-2 item 3)."""
    arr = np.asarray(host_array)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def _to_host(x: jax.Array) -> np.ndarray:
    """Process-safe ``device_get`` of a global sharded array.

    Fully-addressable arrays (single-process runs) fetch directly;
    otherwise the value is assembled by an across-process allgather
    (every host ends up with the full array, matching the single-process
    contract of ``unshard``)."""
    if x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def shard_rhs(b_padded: jax.Array, mesh: Mesh,
              decomp: Optional[Decomp] = None):
    """Global padded RHS -> device-sharded owned tiles.

    Along each sharded axis the near ghost (index 0) is dropped; entries
    1..n+1 are laid out contiguously over the mesh so each device holds
    its m owned entries. Unsharded axes keep the full padded extent.
    ``b_padded`` is host data every process holds in full.
    """
    if decomp is None:
        decomp = decomp_from_mesh(mesh, b_padded.ndim)
    sl = tuple(slice(1, None) if decomp.info(a) is not None else slice(None)
               for a in range(b_padded.ndim))
    return _to_global(np.asarray(b_padded)[sl],
                      NamedSharding(mesh, decomp.spec()))


def unshard(x_tiles: jax.Array, decomp: Optional[Decomp] = None):
    """Sharded owned tiles -> global padded array (re-adds near ghosts)."""
    x = _to_host(x_tiles)
    if decomp is None:         # legacy row layout: first axis sharded
        pads = [(1, 0)] + [(0, 0)] * (x.ndim - 1)
    else:
        pads = [(1, 0) if decomp.info(a) is not None else (0, 0)
                for a in range(x.ndim)]
    return jnp.pad(jnp.asarray(x), pads)


class ShardedSolver:
    """Distributed MultigridSolver: domain-decomposed V-cycles to tolerance.

    The decomposition follows the mesh: a 1D mesh shards axis 0 (rows /
    slabs), a 2D mesh shards axes 0 and 1 (blocks / pencils).

    >>> mesh = make_mesh()                       # rows
    >>> s = ShardedSolver(SolverConfig(ndim=2, k=12, smoother="rbgs"), mesh)
    >>> result = s.solve(b_padded)               # b as a plain padded array

    >>> mesh = make_block_mesh((4, 2))           # 4x2 blocks
    >>> s = ShardedSolver(SolverConfig(ndim=2, k=12, smoother="rbgs"), mesh)
    """

    def __init__(self, config: SolverConfig, mesh: Mesh,
                 hierarchy: Optional[Hierarchy] = None):
        self.config = config
        self.mesh = mesh
        self.decomp = decomp_from_mesh(mesh, config.ndim)
        self.ndev = int(np.prod(mesh.devices.shape))
        for _, ma, nd in self.decomp.axes:
            if (2 ** config.k) % nd != 0:
                raise ValueError(f"2^k must be divisible by the mesh size "
                                 f"along {ma!r} ({nd})")
        if not _is_sharded(config, self.decomp, 0):
            raise ValueError(
                f"fine level would be agglomerated: local tile of "
                f"{_level_rows(config.k, 0)} rows over the mesh is below "
                f"agglom_rows={config.agglom_rows}; raise k, shrink the "
                f"mesh, or lower agglom_rows")
        self.hierarchy = (hierarchy if hierarchy is not None
                          else build_hierarchy(config))
        # Jitted solve entry points, built once and cached (re-tracing
        # through the axon tunnel costs minutes — VERDICT.md round-3
        # weak item 5). Keys: ("mg", skip_fmg) / ("pcg",).
        self._solve_fns = {}

    def _build_solve(self, skip_fmg: bool = False):
        cfg = self.config
        hier = self.hierarchy
        decomp = self.decomp
        gamma = 2 if cfg.cycle == "w" else 1

        def local_solve(b, x0):
            if cfg.cycle == "fmg" and not skip_fmg:
                # FMG is a direct method (cycles.solve semantics): run it
                # once, then polish with V-cycles if tol asks for more.
                x = _sharded_fmg(hier, cfg, decomp, b)
            else:
                # Warm start (checkpoint resume): the V-cycle iteration is
                # a fixed-point map, so restarting from a saved x is the
                # same algorithm the uninterrupted solve runs. A resumed
                # FMG solve skips the (already-done) FMG leg and keeps
                # polishing with V-cycles from x0.
                x = x0
            n, h = hier.fine.n, hier.fine.h
            b_norm = jnp.sqrt(_psum_sq(b, decomp))
            b_norm = jnp.where(b_norm == 0, 1.0, b_norm)
            leg = _leg_level_ok(cfg, decomp, 0)
            if leg:
                # Ext-carried loop: b's extended tile is built ONCE
                # (loop-invariant) and x stays in extended layout across
                # cycles — the convergence check's residual runs on the
                # refreshed tile the next cycle reuses. When the fine
                # level packs, the tiles are carried COLOR-PACKED
                # end-to-end (plocal2d): pack/unpack cost once per
                # solve, every kernel does half the VPU work.
                from ..kernels import local2d, plocal2d

                hh = local2d.HALO_ROWS
                packed0 = _pack_level_ok(cfg, decomp, 0)
                ms = tuple(x.shape[a] for a, _, _ in decomp.axes)
                row_off, col_off, owned = _local_offsets(x, decomp, hh)
                be = _ext_aligned(b, decomp, hh, r_mult=16)
                x = _ext_aligned(x, decomp, hh, r_mult=16)
                if packed0:
                    cpar, c_ext = _cpar(decomp), be.shape[1]
                    be = plocal2d.pack_ext(be, cpar)
                    x = plocal2d.pack_ext(x, cpar)

                def res_rel(xe_fresh, red_only=False):
                    if packed0:
                        # Fused norm kernel: no residual materialized
                        # (2 read passes, 0 writes); red_only is exact
                        # right after an RB-GS cycle (the closing black
                        # half-sweep zeroes the black residual).
                        nrm2 = plocal2d.residual_norm_sq(
                            xe_fresh, be, n, h, ms[0], row_off, col_off,
                            mcol=(ms[1] if len(ms) == 2 else 0),
                            red_only=red_only)
                    else:
                        r = local2d.residual(xe_fresh, be, n, h, row_off,
                                             col_off)
                        ro = r[owned]
                        nrm2 = jnp.sum(ro * ro)
                    return jnp.sqrt(jax.lax.psum(
                        nrm2, decomp.mesh_axes)) / b_norm

                def one_cycle(xe):
                    xe = _leg_cycle_ext(hier, cfg, decomp, xe, be, 0,
                                        gamma, 0.0, fresh=True)
                    return _refresh_ext(xe, decomp, hh, ms)
            else:
                def res_rel(xx, red_only=False):
                    return jnp.sqrt(_psum_sq(
                        s_residual(xx, b, n, h, decomp,
                                   use_pallas=cfg.use_pallas),
                        decomp)) / b_norm

                def one_cycle(xx):
                    return _sharded_v_cycle(hier, cfg, decomp, xx, b, 0,
                                            gamma)

            r0 = res_rel(x)
            hist0 = jnp.full((cfg.max_iters + 1,), r0, dtype=b.dtype)
            # Post-cycle checks may skip the black residual plane: an
            # RB-GS cycle's closing black half-sweep zeroes it exactly.
            ro_loop = cfg.smoother == "rbgs" and cfg.nu2 >= 1

            # Stall + divergence guards, as in cycles.solve.
            def cond(st):
                _, k_it, _, rel, stall, div = st
                return ((rel >= cfg.tol) & (k_it < cfg.max_iters)
                        & cycles.guards_ok(stall, div))

            def body(st):
                x, k_it, hist, rel, stall, div = st
                x = one_cycle(x)
                new_rel = res_rel(x, red_only=ro_loop)
                stall, div = cycles.step_guards(new_rel, rel, stall, div)
                hist = hist.at[k_it + 1].set(new_rel)
                return x, k_it + 1, hist, new_rel, stall, div

            x, iters, hist, rel, _, _ = jax.lax.while_loop(
                cond, body, (x, 0, hist0, r0, 0, 0))
            if leg:
                if packed0:
                    x = plocal2d.unpack_ext(x, c_ext, cpar)
                x = x[owned]
            idx = jnp.arange(cfg.max_iters + 1)
            hist = jnp.where(idx <= iters, hist, rel)
            return x, iters, hist, rel < cfg.tol

        from jax import shard_map

        sharded = shard_map(
            local_solve, mesh=self.mesh,
            in_specs=(decomp.spec(), decomp.spec()),
            out_specs=(decomp.spec(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def _build_pcg(self):
        """Distributed MG-PCG (the sharded twin of solvers/krylov.py):
        one distributed V-cycle per iteration as the preconditioner, all
        dot products psum-ed over the mesh, flexible (Polak-Ribiere) beta
        for the not-exactly-symmetric RB-GS cycle."""
        cfg = self.config
        hier = self.hierarchy
        decomp = self.decomp
        gamma = 2 if cfg.cycle == "w" else 1
        n, h = hier.fine.n, hier.fine.h

        from ..solvers.krylov import cg_loop

        pd = mixed_leg_dtype(cfg, decomp)
        leg0 = _leg_level_ok(cfg, decomp, 0)

        def local_pcg(b, x0):
            if leg0:
                # Ext-carried CG: cg_loop's injected primitives are
                # representation-agnostic, so the whole Krylov recurrence
                # (x, r, z, p and their axpys) runs on EXTENDED tiles
                # (color-packed when the fine level packs) — linear
                # combinations preserve exact ghosts, kernels only need
                # a slab refresh of their operand, and the per-primitive
                # ext-rebuild/slice copies of the owned-tile entry
                # disappear. Dots reduce over the owned slice (a fused
                # masked reduction, no materialized copy). Mixed
                # precision casts at the preconditioner boundary only
                # (elementwise — no relayout): the cycle runs at
                # precond_dtype with the top level's up leg emitting f32
                # (the bf16 final-store noise rule, BASELINE.md round-4).
                from ..kernels import local2d, plocal2d

                hh = local2d.HALO_ROWS
                packed0 = _pack_level_ok(cfg, decomp, 0)
                ms = tuple(x0.shape[a] for a, _, _ in decomp.axes)
                row_off, col_off, owned = _local_offsets(x0, decomp, hh)
                be = _ext_aligned(b, decomp, hh, r_mult=16)
                xe = _ext_aligned(x0, decomp, hh, r_mult=16)
                if packed0:
                    cpar, c_ext = _cpar(decomp), be.shape[1]
                    be = plocal2d.pack_ext(be, cpar)
                    xe = plocal2d.pack_ext(xe, cpar)
                    owned = _packed_owned(decomp, ms)
                    res_kernel = plocal2d.residual
                else:
                    res_kernel = local2d.residual
                def pdot(u, v):
                    return jax.lax.psum(jnp.sum(u[owned] * v[owned]),
                                        decomp.mesh_axes)

                if packed0:
                    def apply_a(pe):
                        # Dedicated apply kernel: no zero-b DMA stream
                        # (a third of the residual kernel's traffic).
                        pf = _refresh_ext(pe, decomp, hh, ms)
                        return plocal2d.apply_op(pf, n, h, row_off,
                                                 col_off)
                else:
                    zeros_e = jnp.zeros_like(be)

                    def apply_a(pe):
                        pf = _refresh_ext(pe, decomp, hh, ms)
                        return -res_kernel(pf, zeros_e, n, h, row_off,
                                           col_off)

                if pd is None:
                    def precond(re):
                        rf = _refresh_ext(re, decomp, hh, ms)
                        return _leg_cycle_ext(hier, cfg, decomp,
                                              jnp.zeros_like(rf), rf, 0,
                                              gamma, 0.0, fresh=True)
                else:
                    from ..kernels.local2d import _cdt as _leg_cdt

                    def precond(re):
                        rp = _refresh_ext(re, decomp, hh,
                                          ms).astype(pd)
                        z = _leg_cycle_ext(hier, cfg, decomp,
                                           jnp.zeros_like(rp), rp, 0,
                                           gamma, 0.0, fresh=True,
                                           out_dtype=_leg_cdt(pd))
                        return z.astype(re.dtype)

                def residual_e(xx, bb):
                    xf = _refresh_ext(xx, decomp, hh, ms)
                    return res_kernel(xf, bb, n, h, row_off, col_off)

                x, iters, hist, rel = cg_loop(
                    xe, be, dot=pdot, apply_a=apply_a, precond=precond,
                    residual=residual_e, tol=cfg.tol,
                    max_iters=cfg.max_iters)
                if packed0:
                    _, _, owned_a = _local_offsets(x0, decomp, hh)
                    x = plocal2d.unpack_ext(x, c_ext, cpar)[owned_a]
                else:
                    x = x[owned]
                return x, iters, hist, rel < cfg.tol

            def pdot(u, v):
                return jax.lax.psum(jnp.sum(u * v), decomp.mesh_axes)

            def apply_a(p):
                return -s_residual(p, jnp.zeros_like(p), n, h, decomp,
                                   use_pallas=cfg.use_pallas)

            pd3 = mixed_slab_dtype(cfg, decomp)
            if pd3 is not None:
                # 3D slab mixed precision: bf16 tiles through the
                # stencil3d tier (f32 registers / f32 coarse RHS), the
                # top level's up smoothing emitting f32 (the final-
                # bf16-store noise rule, BASELINE.md round-4).
                from ..kernels.packed2d import _cdt as _p_cdt

                def precond(r):
                    rp = r.astype(pd3)
                    z = _sharded_v_cycle(hier, cfg, decomp,
                                         jnp.zeros_like(rp), rp, 0,
                                         gamma,
                                         out_dtype=_p_cdt(pd3))
                    return z.astype(r.dtype)
            else:
                # mixed_leg_dtype gates the 2D path onto the ext-carried
                # branch above; everything else runs full dtype.
                def precond(r):
                    return _sharded_v_cycle(hier, cfg, decomp,
                                            jnp.zeros_like(r), r, 0,
                                            gamma)

            x, iters, hist, rel = cg_loop(
                x0, b, dot=pdot, apply_a=apply_a,
                precond=precond,
                residual=lambda xx, bb: s_residual(xx, bb, n, h, decomp,
                                                use_pallas=cfg.use_pallas),
                tol=cfg.tol, max_iters=cfg.max_iters)
            return x, iters, hist, rel < cfg.tol

        from jax import shard_map

        sharded = shard_map(
            local_pcg, mesh=self.mesh,
            in_specs=(decomp.spec(), decomp.spec()),
            out_specs=(decomp.spec(), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def solve(self, b_padded: jax.Array, x0: Optional[jax.Array] = None,
              method: str = "mg") -> cycles.SolveResult:
        """Solve A x = b on the mesh.

        ``x0`` (a plain padded array, like ``b_padded``) warm-starts the
        iteration — the checkpoint/resume entry point for long multi-host
        runs (``utils.checkpoint.resume_solve``; SURVEY.md §5). With
        ``cycle="fmg"`` a warm start skips the FMG leg and polishes from
        ``x0`` with V-cycles.
        """
        if method == "pcg":
            key = ("pcg",)
            build = self._build_pcg
        elif method == "mg":
            # The FMG skip is a static branch: a separate trace only when
            # an fmg config is actually resumed.
            skip_fmg = x0 is not None and self.config.cycle == "fmg"
            key = ("mg", skip_fmg)
            build = partial(self._build_solve, skip_fmg)
        else:
            raise ValueError(f"unknown solve method {method!r}")
        fn = self._solve_fns.get(key)
        if fn is None:
            fn = self._solve_fns[key] = build()
        b_sh = shard_rhs(jnp.asarray(b_padded, dtype=self.config.dtype),
                         self.mesh, self.decomp)
        if x0 is None:
            x0_sh = jnp.zeros_like(b_sh)
        else:
            # Sanitize like cycles.solve: the ops rely on the zero-ghost
            # invariant, so strip whatever boundary the caller supplied.
            x0p = pad_interior(interior(
                jnp.asarray(x0, dtype=self.config.dtype)))
            x0_sh = shard_rhs(x0p, self.mesh, self.decomp)
        x, iters, hist, conv = fn(b_sh, x0_sh)
        return cycles.SolveResult(
            x=jnp.asarray(unshard(x, self.decomp)), iters=iters,
            res_history=hist, converged=conv)

    def eigensolve(self, k: int = 1, method: str = "ii", tol: float = 1e-8,
                   max_iters: int = 100, inner_cycles: int = 30,
                   inner_tol: Optional[float] = None,
                   v0: Optional[jax.Array] = None):
        """Distributed MG eigensolver: k smallest eigenpairs (SURVEY.md
        §3.3 on the §3.5 runtime).

        Same algorithm as solvers.eigen.eigensolve — nested-iteration
        coarse init, block inverse iteration (or RQI shifts) with the
        inner solves done by distributed V-cycles, Rayleigh-Ritz per
        outer step — with every inner product ``psum``-ed over the mesh
        (BASELINE.json:5 "psum for ... Rayleigh quotients"). Eigenvector
        tiles stay domain-partitioned end-to-end.
        """
        from ..solvers import eigen as seigen

        if method == "lobpcg":
            return self._eigensolve_lobpcg(k=k, tol=tol,
                                           max_iters=max_iters, v0=v0)
        if method not in ("ii", "rqi"):
            raise ValueError(f"unknown eigensolver method {method!r}")
        cfg, hier, decomp = self.config, self.hierarchy, self.decomp
        mesh_axes = decomp.mesh_axes
        n, h = hier.fine.n, hier.fine.h
        dtype = cfg.dtype
        if inner_tol is None:
            inner_tol = 200.0 * float(jnp.finfo(dtype).eps)

        def apply_local(u):
            """A u on owned tiles (one halo exchange round)."""
            return -s_residual(u, jnp.zeros_like(u), n, h, decomp,
                               use_pallas=cfg.use_pallas)

        def psum_dots(f, g):
            """(k, k) Gram-type matrix of flattened local tiles."""
            return jax.lax.psum(
                jnp.einsum("iX,jX->ij", f, g,
                           preferred_element_type=dtype), mesh_axes)

        def flat(v):
            return v.reshape(v.shape[0], -1)

        def rayleigh(v):
            av = _stack_map(apply_local, v)
            fv, fav = flat(v), flat(av)
            num = jax.lax.psum(jnp.sum(fv * fav, axis=1), mesh_axes)
            den = jax.lax.psum(jnp.sum(fv * fv, axis=1), mesh_axes)
            lam = num / den
            rr = fav - lam[:, None] * fv
            res = jnp.sqrt(jax.lax.psum(jnp.sum(rr * rr, axis=1),
                                        mesh_axes)) / jnp.abs(lam)
            return lam, jnp.max(res)

        leg0 = _leg_level_ok(cfg, decomp, 0)
        pd_leg = mixed_leg_dtype(cfg, decomp)

        def inner_solve(v, sigma):
            def one(rhs, sg):
                rn = jnp.sqrt(jax.lax.psum(jnp.sum(rhs * rhs), mesh_axes))
                rn = jnp.where(rn == 0, 1.0, rn)

                if leg0:
                    # Ext-carried inner loop (the _build_solve pattern):
                    # the RHS is fixed across the inner cycles, so its
                    # extended tile is built ONCE and the iterate stays
                    # in extended layout (color-packed when the fine
                    # level packs) — the per-cycle ext rebuilds of the
                    # owned-tile entry would cost ~3 extra HBM passes
                    # each.
                    from ..kernels import local2d, plocal2d

                    hh = local2d.HALO_ROWS
                    packed0 = _pack_level_ok(cfg, decomp, 0)
                    ms = tuple(rhs.shape[a] for a, _, _ in decomp.axes)
                    row_off, col_off, owned = _local_offsets(rhs, decomp,
                                                             hh)
                    be = _ext_aligned(rhs, decomp, hh, r_mult=16)
                    if packed0:
                        cpar, c_ext = _cpar(decomp), be.shape[1]
                        be = plocal2d.pack_ext(be, cpar)
                        owned_l = _packed_owned(decomp, ms)
                        res_kernel = plocal2d.residual
                    else:
                        owned_l = owned
                        res_kernel = local2d.residual

                    def cond(st):
                        # state ends with (..., i, rel) on both paths
                        return ((st[-1] >= inner_tol)
                                & (st[-2] < inner_cycles))

                    if pd_leg is None:
                        def body(st):
                            we, i, rel = st
                            we = _leg_cycle_ext(hier, cfg, decomp, we,
                                                be, 0, 1, sg, fresh=True)
                            we = _refresh_ext(we, decomp, hh, ms)
                            r = res_kernel(we, be, n, h, row_off,
                                           col_off, sigma=sg)
                            ro = r[owned_l]
                            rel = jnp.sqrt(jax.lax.psum(
                                jnp.sum(ro * ro), mesh_axes)) / rn
                            return we, i + 1, rel

                        we, _, _ = jax.lax.while_loop(
                            cond, body,
                            (jnp.zeros_like(be), 0,
                             jnp.ones((), dtype=dtype)))
                    else:
                        # Mixed-precision ITERATIVE REFINEMENT (round-4
                        # item 5): the cycle runs at precond_dtype on
                        # the defect computed at full dtype, with the
                        # f32-emitting top level — the inner solve still
                        # reaches inner_tol at dtype grade.
                        from ..kernels.local2d import _cdt as _leg_cdt

                        def body(st):
                            we, re, i, rel = st
                            rf = _refresh_ext(re, decomp, hh, ms)
                            rp = rf.astype(pd_leg)
                            dw = _leg_cycle_ext(
                                hier, cfg, decomp, jnp.zeros_like(rp),
                                rp, 0, 1, sg, fresh=True,
                                out_dtype=_leg_cdt(pd_leg))
                            we = we + dw.astype(dtype)
                            we = _refresh_ext(we, decomp, hh, ms)
                            re = res_kernel(we, be, n, h, row_off,
                                            col_off, sigma=sg)
                            ro = re[owned_l]
                            rel = jnp.sqrt(jax.lax.psum(
                                jnp.sum(ro * ro), mesh_axes)) / rn
                            return we, re, i + 1, rel

                        we, _, _, _ = jax.lax.while_loop(
                            cond, body,
                            (jnp.zeros_like(be), be, 0,
                             jnp.ones((), dtype=dtype)))
                    if packed0:
                        we = plocal2d.unpack_ext(we, c_ext, cpar)
                    return we[owned]

                def cond(st):
                    w, i, rel = st
                    return (rel >= inner_tol) & (i < inner_cycles)

                def body(st):
                    w, i, rel = st
                    w = _sharded_v_cycle(hier, cfg, decomp, w, rhs, 0,
                                         sigma=sg)
                    r = s_residual(w, rhs, n, h, decomp, sg,
                                   use_pallas=cfg.use_pallas)
                    rel = jnp.sqrt(jax.lax.psum(jnp.sum(r * r),
                                                mesh_axes)) / rn
                    return w, i + 1, rel

                w, _, _ = jax.lax.while_loop(
                    cond, body,
                    (jnp.zeros_like(rhs), 0, jnp.ones((), dtype=dtype)))
                return w

            return _stack_map(one, v, sigma)

        def ritz(w):
            """Generalized Rayleigh-Ritz on the (non-orthonormal) block:
            H s = theta G s via Cholesky of the psum-ed Gram matrix.
            Rows are pre-normalized: RQI inner solves return vectors of
            wildly different magnitudes (1/|lambda - sigma| growth), and
            an unequilibrated Gram matrix wrecks the Cholesky."""
            nrm0 = jnp.sqrt(jax.lax.psum(
                jnp.sum(flat(w) * flat(w), axis=1), mesh_axes))
            scale = jnp.where(nrm0 == 0, 1.0, nrm0)
            w = w / scale.reshape((k,) + (1,) * (w.ndim - 1))
            f = flat(w)
            aw = flat(_stack_map(apply_local, w))
            g = psum_dots(f, f)
            hm = psum_dots(f, aw)
            hm = 0.5 * (hm + hm.T)
            ell = jnp.linalg.cholesky(g)
            li = jax.scipy.linalg.solve_triangular(
                ell, jnp.eye(k, dtype=dtype), lower=True)
            ht = li @ hm @ li.T
            lam, s = jnp.linalg.eigh(0.5 * (ht + ht.T))
            rot = (li.T @ s).T                     # (k, k): rows are Ritz
            f2 = rot @ f
            # Normalize rows (Ritz vectors of a symmetric pencil come out
            # G-orthonormal, i.e. already unit — this guards roundoff).
            nrm = jnp.sqrt(jax.lax.psum(jnp.sum(f2 * f2, axis=1),
                                        mesh_axes))
            f2 = f2 / nrm[:, None]
            return f2.reshape(w.shape), lam

        def local_eigen(v):
            # Outer recurrence + RQI shift schedule live in the shared
            # driver (solvers.eigen.ii_loop — single source of
            # RQI_ACTIVE_TOL/RQI_POLISH_TOL/RQI_BACKOFF).
            def inner(vv, sigma):
                if sigma is None:
                    sigma = jnp.zeros((k,), dtype=dtype)
                return inner_solve(vv, sigma)

            v, lam, iters, hist, res = seigen.ii_loop(
                v, rayleigh=rayleigh, inner_solve=inner, ritz=ritz,
                method=method, tol=tol, max_iters=max_iters, dtype=dtype)
            return v, lam, iters, hist, res < tol

        from jax import shard_map

        key = ("eigen", method, k, tol, max_iters, inner_cycles,
               inner_tol)
        fn = self._solve_fns.get(key)
        if fn is None:
            fn = self._solve_fns[key] = jax.jit(shard_map(
                local_eigen, mesh=self.mesh,
                in_specs=decomp.spec(leading_none=1),
                out_specs=(decomp.spec(leading_none=1), P(), P(), P(),
                           P()),
                check_vma=False,
            ))

        # Nested-iteration start (replicated, host-side setup as in the
        # single-device path) — or a caller-supplied warm start
        # (checkpoint resume) — sharded into owned tiles. The block is
        # re-orthonormalized by the first Ritz step, so any spanning set
        # works; ghosts are sanitized per the zero-ghost invariant.
        if v0 is None:
            v0 = seigen.coarse_init(self.hierarchy, k, dtype)
        else:
            v0 = jax.vmap(lambda u: pad_interior(interior(u)))(
                jnp.asarray(v0, dtype))
        sl = (slice(None),) + tuple(
            slice(1, None) if decomp.info(a) is not None else slice(None)
            for a in range(cfg.ndim))
        v0_sh = _to_global(
            np.asarray(v0)[sl],
            NamedSharding(self.mesh, decomp.spec(leading_none=1)))
        v, lam, iters, hist, conv = fn(v0_sh)
        pads = [(0, 0)] + [(1, 0) if decomp.info(a) is not None else (0, 0)
                           for a in range(cfg.ndim)]
        v_full = np.pad(_to_host(v), pads)
        return seigen.EigenResult(
            eigenvalues=lam, eigenvectors=jnp.asarray(v_full), iters=iters,
            res_history=hist, converged=conv)

    def _eigensolve_lobpcg(self, k: int, tol: float, max_iters: int,
                           precond_cycles: int = 1,
                           v0: Optional[jax.Array] = None):
        """Distributed MG-preconditioned LOBPCG (the sharded twin of
        solvers/eigen.lobpcg): Rayleigh-Ritz on span{X, T R, P} with T one
        distributed V-cycle, every Gram matrix psum-ed over the mesh, the
        tiny (3k)^2 eigenproblem solved replicated on every device.
        """
        from ..solvers import eigen as seigen

        cfg, hier, decomp = self.config, self.hierarchy, self.decomp
        mesh_axes = decomp.mesh_axes
        n, h = hier.fine.n, hier.fine.h
        dtype = cfg.dtype
        lam_shape = (k,) + (1,) * cfg.ndim

        def apply_local(u):
            return -s_residual(u, jnp.zeros_like(u), n, h, decomp,
                               use_pallas=cfg.use_pallas)

        def flat(v):
            return v.reshape(v.shape[0], -1)

        def gram(f, g):
            return jax.lax.psum(
                jnp.einsum("iX,jX->ij", flat(f), flat(g),
                           preferred_element_type=dtype), mesh_axes)

        def rownorms(v):
            return jnp.sqrt(jax.lax.psum(
                jnp.sum(flat(v) * flat(v), axis=1), mesh_axes))

        def rq_res(v):
            """Rayleigh quotients + residual tiles of an orthonormal
            block."""
            av = _stack_map(apply_local, v)
            lam = jax.lax.psum(jnp.sum(flat(v) * flat(av), axis=1),
                               mesh_axes)
            r = av - lam.reshape(lam_shape) * v
            res = rownorms(r) / jnp.abs(lam)
            return lam, r, jnp.max(res)

        pd = mixed_leg_dtype(cfg, decomp)

        def tcycle(r):
            # Mixed precision at the preconditioner boundary only, as in
            # solvers.eigen.lobpcg: LOBPCG re-projects on the true
            # operator at every Rayleigh-Ritz step, so a low-precision T
            # only perturbs the search direction. The f32-emitting top
            # level (out_dtype) avoids the final-store rounding noise —
            # see the PCG precond note.
            def one(rhs):
                if pd is None:
                    w = jnp.zeros_like(rhs)
                    for _ in range(precond_cycles):
                        w = _sharded_v_cycle(hier, cfg, decomp, w, rhs, 0)
                    return w
                from ..kernels.local2d import _cdt as _leg_cdt

                rp = rhs.astype(pd)
                w = jnp.zeros_like(rp)
                for _ in range(precond_cycles):
                    w = _sharded_v_cycle_leg(
                        hier, cfg, decomp, w.astype(pd), rp, 0, 1, 0.0,
                        out_dtype=_leg_cdt(pd))
                return w.astype(dtype)

            return _stack_map(one, r)

        def project_out(f, basis):
            for _ in range(2):
                f = f - jnp.einsum("ij,j...->i...", gram(f, basis), basis)
            return f

        def safe_rownorm(v, salt):
            """Normalize rows over the mesh; replace dead rows by a
            deterministic global pseudo-random interior field (identical
            on every device by construction from global coordinates)."""
            nrm = rownorms(v)
            eps = jnp.finfo(dtype).eps
            gsum = _coord_sum(v.shape[1:], decomp).astype(dtype)
            rows = jnp.arange(k, dtype=dtype).reshape(lam_shape)
            imask = _interior_mask(n, v.shape[1:], decomp)
            fb = jnp.sin((salt + 1.0) * (rows + 1.0)
                         + 0.7391 * gsum) * imask.astype(dtype)
            fb = fb / rownorms(fb).reshape(lam_shape)
            good = (nrm > eps * eps).reshape(lam_shape)
            return jnp.where(good, v / jnp.where(
                good, nrm.reshape(lam_shape), 1.0), fb)

        def rr(s, nkeep):
            m = s.shape[0]
            g = gram(s, s)
            hm = gram(s, _stack_map(apply_local, s))
            hm = 0.5 * (hm + hm.T)
            eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
            jit_g = g + (100.0 * eps * jnp.trace(g)) * jnp.eye(m,
                                                               dtype=dtype)
            ell = jnp.linalg.cholesky(jit_g)
            li = jax.scipy.linalg.solve_triangular(
                ell, jnp.eye(m, dtype=dtype), lower=True)
            ht = li @ hm @ li.T
            theta, y = jnp.linalg.eigh(0.5 * (ht + ht.T))
            c = li.T @ y[:, :nkeep]
            return c, theta[:nkeep]

        def combine(c, s):
            """Rows of c^T s as tiles: (m, nkeep)^T x (m, *tile)."""
            return jnp.einsum("mi,m...->i...", c, s)

        def local_lobpcg(v):
            # orthonormalize the prolonged coarse start over the mesh;
            # the recurrence itself is the shared driver
            # (solvers.eigen.lobpcg_loop).
            g0 = gram(v, v)
            ell0 = jnp.linalg.cholesky(
                g0 + 100.0 * jnp.finfo(dtype).eps * jnp.trace(g0)
                * jnp.eye(k, dtype=dtype))
            li0 = jax.scipy.linalg.solve_triangular(
                ell0, jnp.eye(k, dtype=dtype), lower=True)
            x = combine(li0.T, v)

            x, lam, iters, hist, res = seigen.lobpcg_loop(
                x, k=k, rq_res=rq_res, tcycle=tcycle,
                project_out=project_out, safe_rownorm=safe_rownorm,
                rr=rr, combine=combine, tol=tol, max_iters=max_iters,
                dtype=dtype)
            return x, lam, iters, hist, res < tol

        from jax import shard_map

        key = ("lobpcg", k, tol, max_iters, precond_cycles)
        fn = self._solve_fns.get(key)
        if fn is None:
            fn = self._solve_fns[key] = jax.jit(shard_map(
                local_lobpcg, mesh=self.mesh,
                in_specs=decomp.spec(leading_none=1),
                out_specs=(decomp.spec(leading_none=1), P(), P(), P(),
                           P()),
                check_vma=False,
            ))

        if v0 is None:
            v0 = seigen.coarse_init(self.hierarchy, k, dtype)
        else:
            v0 = jax.vmap(lambda u: pad_interior(interior(u)))(
                jnp.asarray(v0, dtype))
        sl = (slice(None),) + tuple(
            slice(1, None) if decomp.info(a) is not None else slice(None)
            for a in range(cfg.ndim))
        v0_sh = _to_global(
            np.asarray(v0)[sl],
            NamedSharding(self.mesh, decomp.spec(leading_none=1)))
        v, lam, iters, hist, conv = fn(v0_sh)
        pads = [(0, 0)] + [(1, 0) if decomp.info(a) is not None else (0, 0)
                           for a in range(cfg.ndim)]
        v_full = np.pad(_to_host(v), pads)
        return seigen.EigenResult(
            eigenvalues=lam, eigenvectors=jnp.asarray(v_full), iters=iters,
            res_history=hist, converged=conv)

    def v_cycle_fn(self):
        """The jitted sharded cycle (for benchmarking): tiles -> tiles."""
        cfg, hier, decomp = self.config, self.hierarchy, self.decomp
        gamma = 2 if cfg.cycle == "w" else 1

        def one_cycle(x, b):
            return _sharded_v_cycle(hier, cfg, decomp, x, b, 0, gamma)

        from jax import shard_map

        return jax.jit(shard_map(
            one_cycle, mesh=self.mesh,
            in_specs=(decomp.spec(), decomp.spec()),
            out_specs=decomp.spec(), check_vma=False))

    def v_cycles_fn(self):
        """jitted fn(x_tiles, b_tiles, m) -> x_tiles: m CHAINED cycles in
        one dispatch — what the solve loop actually runs per iteration.
        On the whole-leg kernel path the chain carries the extended-
        layout tile (b's extended tile built once, ghost-slab refreshes
        between cycles), so this measures the real per-cycle marginal
        without per-call relayout at the owned-tile boundary."""
        cfg, hier, decomp = self.config, self.hierarchy, self.decomp
        gamma = 2 if cfg.cycle == "w" else 1
        leg = _leg_level_ok(cfg, decomp, 0)

        def many(x, b, mreps):
            if leg:
                from ..kernels import local2d, plocal2d

                hh = local2d.HALO_ROWS
                packed0 = _pack_level_ok(cfg, decomp, 0)
                _, _, owned = _local_offsets(x, decomp, hh)
                be = _ext_aligned(b, decomp, hh, r_mult=16)
                xe = _ext_aligned(x, decomp, hh, r_mult=16)
                if packed0:
                    cpar, c_ext = _cpar(decomp), be.shape[1]
                    be = plocal2d.pack_ext(be, cpar)
                    xe = plocal2d.pack_ext(xe, cpar)
                xe = _leg_cycle_ext(hier, cfg, decomp, xe, be, 0, gamma,
                                    0.0, fresh=True)

                def body(i, xe):
                    return _leg_cycle_ext(hier, cfg, decomp, xe, be, 0,
                                          gamma, 0.0, fresh=False)

                xe = jax.lax.fori_loop(0, mreps - 1, body, xe)
                if packed0:
                    xe = plocal2d.unpack_ext(xe, c_ext, cpar)
                return xe[owned]

            def body(i, xx):
                return _sharded_v_cycle(hier, cfg, decomp, xx, b, 0,
                                        gamma)

            return jax.lax.fori_loop(0, mreps, body, x)

        from jax import shard_map

        return jax.jit(shard_map(
            many, mesh=self.mesh,
            in_specs=(decomp.spec(), decomp.spec(), P()),
            out_specs=decomp.spec(), check_vma=False))
