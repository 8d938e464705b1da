"""Chip session 2: block-mesh packed timing (+correctness via unshard),
bf16 vs f32 distributed PCG per-application, and a component profile of
the packed rows cycle (down/up/refresh/residual marginals)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

import multigridcmt_tpu as mg
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded
from multigridcmt_tpu.kernels import local2d, plocal2d
from bench import _marginal

K = 12
prob = mg.poisson2d(k=K, dtype=jnp.float32)
cfg = SolverConfig(ndim=2, k=K, dtype=jnp.float32, smoother="rbgs",
                   use_pallas=True)

# ---- block mesh(1,1) packed: correctness via unshard + timing ----
bmesh = sharded.make_block_mesh((1, 1))
bsolver = sharded.ShardedSolver(cfg, bmesh)
assert sharded._pack_level_ok(cfg, bsolver.decomp, 0)
bb = sharded.shard_rhs(jnp.asarray(prob.b), bmesh, bsolver.decomp)
bvfn = bsolver.v_cycles_fn()
t0 = time.time()
xb = sharded.unshard(bvfn(jnp.zeros_like(bb), bb, 1), bsolver.decomp)
print(f"[chip] packed block compiled+ran {time.time()-t0:.0f}s", flush=True)

rmesh = sharded.make_mesh()
rsolver = sharded.ShardedSolver(cfg, rmesh)
rb = sharded.shard_rhs(jnp.asarray(prob.b), rmesh, rsolver.decomp)
rvfn = rsolver.v_cycles_fn()
xr = sharded.unshard(rvfn(jnp.zeros_like(rb), rb, 1), rsolver.decomp)
d = float(jnp.max(jnp.abs(xb - xr)))
print(f"[chip] packed block vs rows 1-cycle maxdiff {d:.3e}", flush=True)
assert d < 1e-4

@jax.jit
def bcyc(b, m):
    return jnp.sum(bvfn(jnp.zeros_like(b), b, m).astype(jnp.float32))

tb = _marginal(lambda m: float(bcyc(bb, m)), k1=2, k2=12, reps=6)
print(f"[chip] PACKED block k={K} cycle marginal: {tb*1e3:.3f} ms", flush=True)

# ---- bf16 vs f32 distributed PCG preconditioner application ----
# Time ONE preconditioner application (the mixed-vs-full comparison the
# verdict asks for): chained _leg_cycle_ext calls on packed ext tiles.
decomp = rsolver.decomp
hier = rsolver.hierarchy
n, h = hier.fine.n, hier.fine.h
hh = local2d.HALO_ROWS

def precond_chain(pd):
    def local(b, m):
        ms = tuple(b.shape[a] for a, _, _ in decomp.axes)
        be = sharded._ext_aligned(b, decomp, hh, r_mult=16)
        be = plocal2d.pack_ext(be, 0)
        if pd is not None:
            from multigridcmt_tpu.kernels.local2d import _cdt

            def body(i, re):
                rf = sharded._refresh_ext(re, decomp, hh, ms).astype(pd)
                z = sharded._leg_cycle_ext(hier, cfg, decomp,
                                           jnp.zeros_like(rf), rf, 0, 1,
                                           0.0, fresh=True,
                                           out_dtype=_cdt(pd))
                return z
        else:
            def body(i, re):
                rf = sharded._refresh_ext(re, decomp, hh, ms)
                return sharded._leg_cycle_ext(hier, cfg, decomp,
                                              jnp.zeros_like(rf), rf, 0,
                                              1, 0.0, fresh=True)
        out = jax.lax.fori_loop(0, m, body, be)
        return jnp.sum(out[:, hh:hh + ms[0]].astype(jnp.float32))

    return jax.jit(shard_map(local, mesh=rmesh,
                             in_specs=(decomp.spec(), P()),
                             out_specs=P(), check_vma=False))

f32fn = precond_chain(None)
t32 = _marginal(lambda m: float(f32fn(rb, m)), k1=2, k2=12, reps=6)
print(f"[chip] f32 precond application: {t32*1e3:.3f} ms", flush=True)
bf16fn = precond_chain(jnp.bfloat16)
t16 = _marginal(lambda m: float(bf16fn(rb, m)), k1=2, k2=12, reps=6)
print(f"[chip] bf16 precond application: {t16*1e3:.3f} ms "
      f"({t32/t16:.2f}x vs f32)", flush=True)

# ---- component profile of the packed rows cycle ----
omega = cfg.effective_omega()

def comp(fn_builder, name):
    def local(b, m):
        ms = tuple(b.shape[a] for a, _, _ in decomp.axes)
        row_off, col_off, _ = sharded._local_offsets(b, decomp, hh)
        be = plocal2d.pack_ext(
            sharded._ext_aligned(b, decomp, hh, r_mult=16), 0)
        step = fn_builder(ms, row_off, col_off, be)

        def body(i, carry):
            return step(carry)

        out = jax.lax.fori_loop(0, m, body, be)
        return jnp.sum(out[:, hh:hh + ms[0]].astype(jnp.float32))

    fn = jax.jit(shard_map(local, mesh=rmesh,
                           in_specs=(decomp.spec(), P()),
                           out_specs=P(), check_vma=False))
    t = _marginal(lambda m: float(fn(rb, m)), k1=2, k2=22, reps=6)
    print(f"[chip] {name}: {t*1e6:.0f} us", flush=True)
    return t

t_dn = comp(lambda ms, ro, co, be:
            (lambda x: plocal2d.down_leg(x, be, n, h, ms[0], ro, co,
                                         kind="rbgs", omega=omega,
                                         sweeps=2)[0]),
            "down_leg (packed, level0)")
t_up = comp(lambda ms, ro, co, be:
            (lambda x: plocal2d.up_leg(
                x, jnp.zeros((local2d.ext_rows(ms[0] // 2),
                              2176), jnp.float32),
                be, n, (n - 1) // 2, h, ms[0], ro, co,
                kind="rbgs", omega=omega, sweeps=2)),
            "up_leg (packed, level0)")
t_rf = comp(lambda ms, ro, co, be:
            (lambda x: sharded._refresh_ext(x, decomp, hh, ms)),
            "refresh_ext (packed, level0)")
t_rs = comp(lambda ms, ro, co, be:
            (lambda x: plocal2d.residual(x, be, n, h, ro, co)),
            "residual (packed, level0)")
print(f"[chip] level0 legs+3refresh = "
      f"{(t_dn + t_up + 3 * t_rf)*1e3:.3f} ms of 1.73 cycle", flush=True)
print("DONE", flush=True)
