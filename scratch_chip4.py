"""Micro-bench the 3D minor-axis transfer matmuls at 511^3 f32:
precision tiers and formulation variants."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from multigridcmt_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from bench import _marginal
from multigridcmt_tpu.ops import transfer

n, nc = 511, 255
f = jnp.asarray(np.random.default_rng(0)
                .standard_normal((n + 2, n + 2, n + 2)).astype(np.float32))
e = jnp.asarray(np.random.default_rng(1)
                .standard_normal((nc + 2, nc + 2, nc + 2))
                .astype(np.float32))
R = transfer._restrict_matrix(n, jnp.float32)      # (257, 513)
P = transfer._prolong_matrix(nc, jnp.float32)      # (513, 257)


def t(name, op, x0):
    @jax.jit
    def chain(x, m):
        def body(i, s):
            return s + jnp.sum(op(x + s * 0.0)[:1, :1, :1])

        return jax.lax.fori_loop(0, m, body, jnp.zeros((), jnp.float32))

    v = _marginal(lambda m: float(chain(x0, m)), k1=1, k2=7, reps=5)
    print(f"[mm] {name}: {v*1e3:.2f} ms", flush=True)
    return v


for prec, pname in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                    (jax.lax.Precision.DEFAULT, "DEFAULT")):
    t(f"restrict ax2 einsum {pname}",
      lambda x, p=prec: jnp.einsum("prc,dc->prd", x, R, precision=p), f)
    t(f"restrict ax1 einsum {pname}",
      lambda x, p=prec: jnp.einsum("qr,prc->pqc", R, x, precision=p), f)
    t(f"prolong ax2 einsum {pname}",
      lambda x, p=prec: jnp.einsum("prc,dc->prd", x, P, precision=p), e)
    t(f"prolong ax1 einsum {pname}",
      lambda x, p=prec: jnp.einsum("qr,prc->pqc", P, x, precision=p), e)

# sliced versions for reference
t("restrict ax2 sliced", lambda x: transfer._axis_mm.__wrapped__(x, 2, R)
  if False else jnp.moveaxis(jnp.pad(
      0.25 * (jnp.moveaxis(x, 2, 0)[1:-1][0::2][:-1]
              + 2.0 * jnp.moveaxis(x, 2, 0)[1:-1][1::2]
              + jnp.moveaxis(x, 2, 0)[1:-1][0::2][1:]),
      [(1, 1), (0, 0), (0, 0)]), 0, 2), f)
t("full restrict (current)", transfer.restrict, f)
t("full prolong (current)", transfer.prolong, e)
print("DONE", flush=True)
