"""Chip session 3: where do the coarse levels' ~0.73 ms go?
Sweep (agglom_rows, PALLAS_MIN_N) on the mesh-of-1 k=12 packed cycle."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

import multigridcmt_tpu as mg
import multigridcmt_tpu.kernels as kmod
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded
from bench import _marginal

K = 12
prob = mg.poisson2d(k=K, dtype=jnp.float32)
base = None


def run(agglom, pallas_min, label):
    kmod.PALLAS_MIN_N = pallas_min
    cfg = SolverConfig(ndim=2, k=K, dtype=jnp.float32, smoother="rbgs",
                       use_pallas=True, agglom_rows=agglom)
    mesh = sharded.make_mesh()
    solver = sharded.ShardedSolver(cfg, mesh)
    b_sh = sharded.shard_rhs(jnp.asarray(prob.b), mesh, solver.decomp)
    vfn = solver.v_cycles_fn()
    t0 = time.time()
    x1 = sharded.unshard(vfn(jnp.zeros_like(b_sh), b_sh, 1),
                         solver.decomp)
    global base
    if base is None:
        base = x1
    else:
        d = float(jnp.max(jnp.abs(x1 - base)))
        assert d < 1e-4, d

    @jax.jit
    def cyc(b, m):
        return jnp.sum(vfn(jnp.zeros_like(b), b, m).astype(jnp.float32))

    t = _marginal(lambda m: float(cyc(b_sh, m)), k1=2, k2=12, reps=6)
    print(f"[chip] {label}: {t*1e3:.3f} ms  (compile+run1 "
          f"{time.time()-t0:.0f}s)", flush=True)
    return t


run(8, 200, "agglom=8  pallas_min=200 (default)")
run(64, 200, "agglom=64 pallas_min=200")
run(256, 200, "agglom=256 pallas_min=200")
run(8, 60, "agglom=8  pallas_min=60 (leg levels 0..5)")
run(64, 60, "agglom=64 pallas_min=60")
print("DONE", flush=True)
