"""On-chip validation + timing of the packed whole-leg shard tier.

Phase 1 (correctness): k=12 mesh-of-1 rows — one packed cycle vs one
aligned-path cycle on the same inputs (f32, maxdiff should be ~1e-6
rounding scale relative to values).
Phase 2 (timing): chained-cycle marginal for rows packed, then block
mesh(1,1) packed.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

import multigridcmt_tpu as mg
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded
from bench import _marginal

K = 12
prob = mg.poisson2d(k=K, dtype=jnp.float32)


def cycle_once(bshape, want_packed=True):
    cfg = SolverConfig(ndim=2, k=K, dtype=jnp.float32, smoother="rbgs",
                       use_pallas=True)
    mesh = (sharded.make_block_mesh(bshape) if bshape
            else sharded.make_mesh())
    solver = sharded.ShardedSolver(cfg, mesh)
    dec = solver.decomp
    assert sharded._pack_level_ok(cfg, dec, 0) == want_packed
    b_sh = sharded.shard_rhs(jnp.asarray(prob.b), mesh, dec)
    vfn = solver.v_cycles_fn()
    x1 = np.asarray(jax.device_get(vfn(jnp.zeros_like(b_sh), b_sh, 1)))
    return solver, b_sh, vfn, x1


t0 = time.time()
solver, b_sh, vfn, x_packed = cycle_once(None)
print(f"[chip] packed rows cycle compiled+ran in {time.time()-t0:.0f}s",
      flush=True)

# Aligned reference: force packing off via a PACK_MIN_N bump.
import multigridcmt_tpu.kernels as kmod
orig = kmod.PACK_MIN_N
kmod.PACK_MIN_N = 10 ** 9
t0 = time.time()
solver_a, b_a, vfn_a, x_aligned = cycle_once(None, want_packed=False)
kmod.PACK_MIN_N = orig
print(f"[chip] aligned rows cycle compiled+ran in {time.time()-t0:.0f}s",
      flush=True)

d = np.max(np.abs(x_packed - x_aligned))
s = np.max(np.abs(x_aligned))
print(f"[chip] packed vs aligned 1-cycle maxdiff {d:.3e} (scale {s:.3e})",
      flush=True)
assert d < 1e-4 * max(s, 1.0), (d, s)

# Phase 2: timing (packed rows)
@jax.jit
def cyc_m(b, m):
    return jnp.sum(vfn(jnp.zeros_like(b), b, m).astype(jnp.float32))

t = _marginal(lambda m: float(cyc_m(b_sh, m)), k1=2, k2=12, reps=6)
print(f"[chip] PACKED rows k={K} cycle marginal: {t*1e3:.3f} ms", flush=True)

@jax.jit
def cyc_ma(b, m):
    return jnp.sum(vfn_a(jnp.zeros_like(b), b, m).astype(jnp.float32))

ta = _marginal(lambda m: float(cyc_ma(b_a, m)), k1=2, k2=12, reps=6)
print(f"[chip] ALIGNED rows k={K} cycle marginal: {ta*1e3:.3f} ms", flush=True)

# Block mesh(1,1) packed
t0 = time.time()
solver_b, b_b, vfn_b, xb = cycle_once((1, 1))
print(f"[chip] packed block cycle compiled+ran in {time.time()-t0:.0f}s",
      flush=True)
db = np.max(np.abs(xb - x_aligned))
print(f"[chip] packed block vs aligned maxdiff {db:.3e}", flush=True)
assert db < 1e-4 * max(s, 1.0), (db, s)

@jax.jit
def cyc_mb(b, m):
    return jnp.sum(vfn_b(jnp.zeros_like(b), b, m).astype(jnp.float32))

tb = _marginal(lambda m: float(cyc_mb(b_b, m)), k1=2, k2=12, reps=6)
print(f"[chip] PACKED block k={K} cycle marginal: {tb*1e3:.3f} ms", flush=True)
print("DONE", flush=True)
