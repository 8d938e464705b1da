import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp, numpy as np
import multigridcmt_tpu as mg
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded
from bench import _marginal

K = 13
prob = mg.poisson2d(k=K, dtype=jnp.float32)
cfg = SolverConfig(ndim=2, k=K, dtype=jnp.float32, smoother="rbgs",
                   use_pallas=True)
mesh = sharded.make_mesh()
solver = sharded.ShardedSolver(cfg, mesh)
assert sharded._pack_level_ok(cfg, solver.decomp, 0)
b_sh = sharded.shard_rhs(jnp.asarray(prob.b), mesh, solver.decomp)
vfn = solver.v_cycles_fn()
x1 = vfn(jnp.zeros_like(b_sh), b_sh, 1)
assert np.isfinite(float(jnp.sum(x1)))
print("[k13] 1 cycle finite ok", flush=True)

@jax.jit
def cyc(b, m):
    return jnp.sum(vfn(jnp.zeros_like(b), b, m).astype(jnp.float32))

t = _marginal(lambda m: float(cyc(b_sh, m)), k1=2, k2=8, reps=6)
print(f"[k13] packed rows k=13 sharded cycle: {t*1e3:.3f} ms "
      f"(4x k12's 1.46 would be 5.84)", flush=True)
print("DONE", flush=True)
