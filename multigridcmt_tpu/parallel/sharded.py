"""Distributed multigrid: shard_map row partitioning with ppermute halos.

This is the build-side L7 runtime of SURVEY.md §1/§3.5 (the reference is
single-process SciPy — BASELINE.json:5 frames all distribution as build
work): the 2D grid is row-partitioned over a 1D device mesh, every stencil
op exchanges a one-row halo with its mesh neighbors via
``jax.lax.ppermute``, and once a level's local tile gets too small to
amortize latency the level is *agglomerated* — all-gathered and computed
replicated on every device (BASELINE.md config 5: "halo ppermute +
coarse-level agglomeration").

Partitioning invariants (vertex-centered 2^k - 1 grids):

* The padded fine grid has 2^k + 1 rows: ghost row 0, interior 1..n, ghost
  n+1. Rows 1..2^k (interior plus the bottom ghost) are sharded: with D
  (a power of two <= 2^(k-1)) devices, device d owns m = 2^k / D rows,
  global rows d*m+1 .. (d+1)*m. The bottom ghost lands on the last device
  as a "dead row" that masks keep zero; the top ghost row 0 is never
  stored — it reappears as device 0's all-zero halo (ppermute edge
  semantics: non-receiving devices get zeros — exactly the homogeneous
  Dirichlet boundary).

* Coarsening halves m per level (coarse row j sits at fine row 2j), so the
  same ownership formula holds on every sharded level and restriction
  needs only the bottom halo, prolongation only the top halo.

* Red-black Gauss-Seidel re-exchanges halos between the two half-sweeps
  (the updated red halo row feeds the black sweep) — this is what keeps
  the distributed sweep *exactly* equal to the single-device sweep
  (SURVEY.md §7 hard part #1), which the tests assert to fp tolerance.

Multi-host note: the same code runs unchanged on a multi-host mesh built
from ``jax.distributed.initialize`` + all processes' devices; ppermute
rides ICI within a slice and DCN across slices (SURVEY.md §5).

Local tiles are *owned-rows only* (m, n+2); each op builds its (m+2, n+2)
halo-extended view on the fly.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SolverConfig
from ..grids import Hierarchy, build_hierarchy, interior, pad_interior
from ..ops import laplacian, smoothers, transfer
from ..solvers import cycles


def make_mesh(devices=None, axis: str = "row") -> Mesh:
    """1D device mesh for row partitioning (SURVEY.md §3.5)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


# ---------------------------------------------------------------------------
# Halo exchange and local (per-shard) stencil ops. All run inside shard_map.
# ---------------------------------------------------------------------------

def _perm_down(d: int):
    """src -> src+1 (deliver my last row as my lower neighbor's top halo)."""
    return [(i, i + 1) for i in range(d - 1)]


def _perm_up(d: int):
    return [(i + 1, i) for i in range(d - 1)]


def halo_extend(u: jax.Array, axis: str, ndev: int) -> jax.Array:
    """(m, c) owned tile -> (m+2, c) with neighbor halo rows.

    Edge devices receive zeros — the Dirichlet ghost rows — for free from
    ppermute's no-source semantics.
    """
    top = jax.lax.ppermute(u[-1:, :], axis, _perm_down(ndev))
    bot = jax.lax.ppermute(u[:1, :], axis, _perm_up(ndev))
    return jnp.concatenate([top, u, bot], axis=0)


def _row_gids(m: int, c: int, axis: str):
    """Global padded row index of each owned row: d*m + 1 + i."""
    d = jax.lax.axis_index(axis)
    return (d * m + 1
            + jax.lax.broadcasted_iota(jnp.int32, (m, c), 0))


def _interior_mask(n: int, m: int, c: int, axis: str):
    g = _row_gids(m, c, axis)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    return (g <= n) & (col >= 1) & (col <= n)


def _stencil_sum(ext: jax.Array) -> jax.Array:
    """Sum of 4 neighbors at each owned row of the extended tile."""
    return (ext[:-2, 1:-1] + ext[2:, 1:-1]
            + ext[1:-1, :-2] + ext[1:-1, 2:])


def _pad_cols(core: jax.Array) -> jax.Array:
    return jnp.pad(core, ((0, 0), (1, 1)))


def s_residual(u, b, n, h, axis, ndev, sigma=0.0):
    """r = b - (A - sigma I) u on owned tiles."""
    m, c = u.shape
    ext = halo_extend(u, axis, ndev)
    inv_h2 = 1.0 / (h * h)
    au = (4.0 * ext[1:-1, 1:-1] - _stencil_sum(ext)) * inv_h2
    r = b[:, 1:-1] - au + sigma * u[:, 1:-1]
    return jnp.where(_interior_mask(n, m, c, axis), _pad_cols(r),
                     jnp.zeros_like(u))


def s_jacobi(u, b, n, h, omega, axis, ndev, sigma=0.0):
    m, c = u.shape
    r = s_residual(u, b, n, h, axis, ndev, sigma)
    d = (4.0 / (h * h)) - sigma
    return u + (omega / d) * r


def s_rbgs(u, b, n, h, axis, ndev, sigma=0.0):
    """One full RB-GS sweep == the single-device sweep, exactly.

    Halos are re-exchanged between the red and black half-sweeps so black
    updates see red-updated neighbor rows across shard boundaries.
    """
    m, c = u.shape
    h2 = h * h
    gids = _row_gids(m, c, axis)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    imask = _interior_mask(n, m, c, axis)
    for parity in (0, 1):
        ext = halo_extend(u, axis, ndev)
        den = 4.0 - sigma * h2
        vals = _pad_cols((h2 * b[:, 1:-1] + _stencil_sum(ext)) / den)
        mask = imask & (((gids + col) % 2) == parity)
        u = jnp.where(mask, vals, u)
    return u


def s_smooth(u, b, n, h, *, kind, omega, sweeps, axis, ndev, sigma=0.0):
    for _ in range(sweeps):
        if kind == "jacobi":
            u = s_jacobi(u, b, n, h, omega, axis, ndev, sigma)
        elif kind == "rbgs":
            u = s_rbgs(u, b, n, h, axis, ndev, sigma)
        else:
            raise ValueError(f"unknown smoother {kind!r}")
    return u


def s_restrict(r, n, axis, ndev):
    """Full-weighting to the coarse owned tile (mc = m/2 rows).

    Coarse owned row q (global jc = d*mc + 1 + q) reads fine extended rows
    2q+1, 2q+2, 2q+3 — i.e. only the bottom halo.
    """
    m, c = r.shape
    mc = m // 2
    nc = (n - 1) // 2
    ext = halo_extend(r, axis, ndev)       # rows 0..m+1
    rows = 0.25 * (ext[1:m:2, :] + 2.0 * ext[2:m + 1:2, :]
                   + ext[3:m + 2:2, :])    # (mc, c)
    core = 0.25 * (rows[:, 1:n:2] + 2.0 * rows[:, 2:n + 1:2]
                   + rows[:, 3:n + 2:2])   # (mc, nc)
    out = _pad_cols(core)                  # (mc, nc+2)
    mask = _interior_mask(nc, mc, nc + 2, axis)
    return jnp.where(mask, out, jnp.zeros_like(out))


def s_prolong(e, nc, axis, ndev):
    """Bilinear interpolation to the fine owned tile (m = 2*mc rows).

    Fine owned row i (global f = d*m + 1 + i): even f -> coarse row f/2
    (extended index (i+1)/2), odd f -> average of its two coarse
    neighbors — i.e. only the top halo.
    """
    mc, cc = e.shape
    m = 2 * mc
    n = 2 * nc + 1
    ext = halo_extend(e, axis, ndev)       # rows 0..mc+1
    # Column interpolation first (width nc+2 -> n+2), on the extended tile.
    cols = jnp.zeros((mc + 2, n + 2), dtype=e.dtype)
    cols = cols.at[:, 2:n + 1:2].set(ext[:, 1:-1])
    cols = cols.at[:, 1:n + 2:2].set(0.5 * (ext[:, :-1] + ext[:, 1:]))
    # Row interpolation: interleave averaged (odd f) and copied (even f).
    odd_f = 0.5 * (cols[0:mc, :] + cols[1:mc + 1, :])   # fine i = 0, 2, ...
    even_f = cols[1:mc + 1, :]                          # fine i = 1, 3, ...
    out = jnp.zeros((m, n + 2), dtype=e.dtype)
    out = out.at[0::2, :].set(odd_f)
    out = out.at[1::2, :].set(even_f)
    mask = _interior_mask(n, m, n + 2, axis)
    return jnp.where(mask, out, jnp.zeros_like(out))


def _psum_sq(x, axis):
    return jax.lax.psum(jnp.sum(x * x), axis)


# ---------------------------------------------------------------------------
# The sharded cycle: sharded fine levels, replicated (agglomerated) coarse
# levels, all inside one shard_map region.
# ---------------------------------------------------------------------------

def _level_rows(k: int, level: int) -> int:
    """Sharded row count (interior + bottom ghost) at a level: 2^(k-level)."""
    return 2 ** (k - level)


def _is_sharded(cfg: SolverConfig, ndev: int, level: int) -> bool:
    m = _level_rows(cfg.k, level) // ndev
    return (_level_rows(cfg.k, level) % ndev == 0) and m >= max(
        cfg.agglom_rows, 2)


def _gather_full(u_local, n, axis):
    """Owned tiles -> replicated full padded grid (the agglomeration step)."""
    rows = jax.lax.all_gather(u_local, axis, tiled=True)   # (n+1, n+2)
    return jnp.pad(rows, ((1, 0), (0, 0)))                  # add ghost row 0


def _scatter_local(full, m, axis):
    """Replicated full padded grid -> my owned rows."""
    d = jax.lax.axis_index(axis)
    return jax.lax.dynamic_slice_in_dim(full, d * m + 1, m, axis=0)


def _sharded_v_cycle(hier: Hierarchy, cfg: SolverConfig, ndev: int,
                     axis: str, x, b, level: int, gamma: int = 1):
    """Recursive cycle; per-level arrays are owned tiles while the level is
    sharded and full replicated grids below the agglomeration cutoff."""
    spec = hier.levels[level]
    n, h = spec.n, spec.h
    omega = cfg.effective_omega()
    if not _is_sharded(cfg, ndev, level):
        # Replicated region: identical unsharded cycle on every device.
        return cycles.v_cycle(hier, x, b, cfg, level=level, gamma=gamma)
    x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                 sweeps=cfg.nu1, axis=axis, ndev=ndev)
    r = s_residual(x, b, n, h, axis, ndev)
    rc = s_restrict(r, n, axis, ndev)
    nc = hier.levels[level + 1].n
    if not _is_sharded(cfg, ndev, level + 1):
        # Agglomerate: gather the coarse RHS, recurse replicated, scatter.
        rc_full = _gather_full(rc, nc, axis)
        ec_full = jnp.zeros_like(rc_full)
        for _ in range(gamma):
            ec_full = cycles.v_cycle(hier, ec_full, rc_full, cfg,
                                     level=level + 1, gamma=gamma)
        ef_full = transfer.prolong(ec_full)
        mloc = _level_rows(cfg.k, level) // ndev
        x = x + _scatter_local(ef_full, mloc, axis)
    else:
        ec = jnp.zeros_like(rc)
        for _ in range(gamma):
            ec = _sharded_v_cycle(hier, cfg, ndev, axis, ec, rc,
                                  level + 1, gamma)
        x = x + s_prolong(ec, nc, axis, ndev)
    x = s_smooth(x, b, n, h, kind=cfg.smoother, omega=omega,
                 sweeps=cfg.nu2, axis=axis, ndev=ndev)
    return x


# ---------------------------------------------------------------------------
# Host-side driver
# ---------------------------------------------------------------------------

def shard_rhs(b_padded: jax.Array, mesh: Mesh, axis: str = "row"):
    """Global padded RHS (n+2, n+2) -> device-sharded owned rows (n+1, n+2).

    Row 0 (top ghost) is dropped; rows 1..n+1 are laid out contiguously
    over the mesh so each device holds its m = (n+1)/D owned rows.
    """
    rows = b_padded[1:, :]
    return jax.device_put(rows, NamedSharding(mesh, P(axis, None)))


def unshard(x_rows: jax.Array) -> jax.Array:
    """Sharded owned rows (n+1, n+2) -> global padded (n+2, n+2)."""
    return jnp.pad(jax.device_get(x_rows), ((1, 0), (0, 0)))


class ShardedSolver:
    """Distributed MultigridSolver: row-partitioned V-cycles to tolerance.

    >>> mesh = make_mesh()
    >>> s = ShardedSolver(SolverConfig(ndim=2, k=12, smoother="rbgs"), mesh)
    >>> result = s.solve(b_padded)         # b as a plain (n+2, n+2) array
    """

    def __init__(self, config: SolverConfig, mesh: Mesh,
                 hierarchy: Optional[Hierarchy] = None):
        if config.ndim != 2:
            raise ValueError("the sharded path is 2D (row partitioning); "
                             "1D problems fit on one chip by definition")
        self.config = config
        self.mesh = mesh
        self.axis = config.mesh_axis
        self.ndev = int(np.prod(mesh.devices.shape))
        if (2 ** config.k) % self.ndev != 0:
            raise ValueError(f"2^k must be divisible by the mesh size "
                             f"({self.ndev})")
        self.hierarchy = (hierarchy if hierarchy is not None
                          else build_hierarchy(config))
        self._solve = self._build_solve()

    def _build_solve(self):
        cfg = self.config
        hier = self.hierarchy
        axis = self.axis
        ndev = self.ndev
        gamma = 2 if cfg.cycle == "w" else 1

        def local_solve(b):
            x = jnp.zeros_like(b)
            n, h = hier.fine.n, hier.fine.h
            b_norm = jnp.sqrt(_psum_sq(b, axis))
            b_norm = jnp.where(b_norm == 0, 1.0, b_norm)
            r0 = jnp.sqrt(_psum_sq(
                s_residual(x, b, n, h, axis, ndev), axis)) / b_norm
            hist0 = jnp.full((cfg.max_iters + 1,), r0, dtype=b.dtype)

            # Stall guard, as in cycles.solve: exit after 3 non-improving
            # cycles (fp32 roundoff floor) instead of spinning to max_iters.
            def cond(st):
                _, k_it, _, rel, stall = st
                return ((rel >= cfg.tol) & (k_it < cfg.max_iters)
                        & (stall < 3))

            def body(st):
                x, k_it, hist, rel, stall = st
                x = _sharded_v_cycle(hier, cfg, ndev, axis, x, b, 0, gamma)
                new_rel = jnp.sqrt(_psum_sq(
                    s_residual(x, b, n, h, axis, ndev), axis)) / b_norm
                stall = jnp.where(new_rel >= 0.9 * rel, stall + 1, 0)
                hist = hist.at[k_it + 1].set(new_rel)
                return x, k_it + 1, hist, new_rel, stall

            x, iters, hist, rel, _ = jax.lax.while_loop(
                cond, body, (x, 0, hist0, r0, 0))
            idx = jnp.arange(cfg.max_iters + 1)
            hist = jnp.where(idx <= iters, hist, rel)
            return x, iters, hist, rel < cfg.tol

        from jax import shard_map

        sharded = shard_map(
            local_solve, mesh=self.mesh,
            in_specs=P(self.axis, None),
            out_specs=(P(self.axis, None), P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)

    def solve(self, b_padded: jax.Array) -> cycles.SolveResult:
        b_sh = shard_rhs(jnp.asarray(b_padded, dtype=self.config.dtype),
                         self.mesh, self.axis)
        x, iters, hist, conv = self._solve(b_sh)
        return cycles.SolveResult(
            x=jnp.asarray(unshard(x)), iters=iters, res_history=hist,
            converged=conv)

    def v_cycle_fn(self):
        """The jitted sharded cycle (for benchmarking): tiles -> tiles."""
        cfg, hier, axis, ndev = (self.config, self.hierarchy, self.axis,
                                 self.ndev)
        gamma = 2 if cfg.cycle == "w" else 1

        def one_cycle(x, b):
            return _sharded_v_cycle(hier, cfg, ndev, axis, x, b, 0, gamma)

        from jax import shard_map

        return jax.jit(shard_map(
            one_cycle, mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None)),
            out_specs=P(self.axis, None), check_vma=False))
