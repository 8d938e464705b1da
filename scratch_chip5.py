"""Chip: 3D mixed-precision measurement — bf16 vs f32 preconditioner
application (distributed slab mesh-of-1, 511^3) + single-device sweep."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

import multigridcmt_tpu as mg
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded
from multigridcmt_tpu.kernels import stencil3d
from multigridcmt_tpu.grids import to_aligned3
from bench import _marginal

K = 9
n = 2 ** K - 1
h = 1.0 / (n + 1)
prob = mg.poisson3d(k=K, dtype=jnp.float32)

# Single-device sweep, f32 vs bf16 storage.
ua = to_aligned3(jnp.zeros((n + 2,) * 3, jnp.float32))
ba = to_aligned3(jnp.asarray(prob.b))


def sweep_t(dtype, label):
    u = ua.astype(dtype)
    b = ba.astype(dtype)

    @jax.jit
    def ch(u, b, m):
        def body(i, x):
            return stencil3d.rbgs_sweep(x, b, n, h)

        return jnp.sum(jax.lax.fori_loop(0, m, body, u)[:1, :1, :1]
                       .astype(jnp.float32))

    t = _marginal(lambda m: float(ch(u, b, m)), k1=1, k2=7, reps=6)
    gb = 3 * u.size * jnp.dtype(dtype).itemsize / t / 1e9
    print(f"[3dmix] single-dev rbgs sweep {label}: {t*1e3:.2f} ms "
          f"({gb:.0f} GB/s)", flush=True)
    return t


t32 = sweep_t(jnp.float32, "f32")
t16 = sweep_t(jnp.bfloat16, "bf16")
print(f"[3dmix] sweep speedup bf16: {t32/t16:.2f}x", flush=True)

# Distributed slab mesh-of-1: full preconditioner application.
cfg = SolverConfig(ndim=3, k=K, dtype=jnp.float32, smoother="rbgs",
                   use_pallas=True)
mesh = sharded.make_mesh()
solver = sharded.ShardedSolver(cfg, mesh)
decomp = solver.decomp
b_sh = sharded.shard_rhs(jnp.asarray(prob.b), mesh, decomp)
assert sharded.mixed_slab_dtype(
    SolverConfig(ndim=3, k=K, dtype=jnp.float32, smoother="rbgs",
                 use_pallas=True, precond_dtype=jnp.bfloat16),
    decomp) == jnp.bfloat16


def precond_t(pd, label):
    hier = solver.hierarchy

    def local(b, m):
        def body(i, s):
            r = b + s * 0.0
            if pd is not None:
                from multigridcmt_tpu.kernels.packed2d import _cdt

                rp = r.astype(pd)
                z = sharded._sharded_v_cycle(hier, cfg, decomp,
                                             jnp.zeros_like(rp), rp, 0,
                                             1, out_dtype=_cdt(pd))
                z = z.astype(r.dtype)
            else:
                z = sharded._sharded_v_cycle(hier, cfg, decomp,
                                             jnp.zeros_like(r), r, 0, 1)
            return s + jnp.sum(z[:1, :1, :1])

        return jax.lax.fori_loop(0, m, body, jnp.zeros((), jnp.float32))

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(decomp.spec(), P()),
                           out_specs=P(), check_vma=False))
    t = _marginal(lambda m: float(fn(b_sh, m)), k1=1, k2=7, reps=6)
    print(f"[3dmix] dist precond {label}: {t*1e3:.2f} ms", flush=True)
    return t


p32 = precond_t(None, "f32")
p16 = precond_t(jnp.bfloat16, "bf16")
print(f"[3dmix] precond speedup bf16: {p32/p16:.2f}x", flush=True)
print("DONE", flush=True)
