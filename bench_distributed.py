"""Distributed-solver benchmark (BASELINE config 5 shape) on the chip.

Runs the full ShardedSolver V-cycle at 4095^2 on whatever mesh the
process sees (one chip here — the mesh degenerates to 1 device, which
measures the per-device compute path the pod would run; real multi-host
wall-clock needs a slice). Compares the jnp local path with the
shard-local Pallas kernels (kernels/local2d.py) and prints one JSON
line with both cycle times.
"""
from __future__ import annotations

import json
import sys

from bench import _marginal, log


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    import multigridcmt_tpu as mg
    from multigridcmt_tpu.config import SolverConfig
    from multigridcmt_tpu.parallel import sharded

    K = 12
    prob = mg.poisson2d(k=K, dtype=jnp.float32)
    out = {}
    cases = [("jnp", False, None), ("pallas", True, None),
             ("pallas_block", True, (1, 1))]
    for name, up, bshape in cases:
        cfg = SolverConfig(ndim=2, k=K, dtype=jnp.float32, smoother="rbgs",
                           use_pallas=up)
        mesh = (sharded.make_block_mesh(bshape) if bshape
                else sharded.make_mesh())
        solver = sharded.ShardedSolver(cfg, mesh)
        b_sh = sharded.shard_rhs(jnp.asarray(prob.b), solver.mesh,
                                 solver.decomp)
        vfn = solver.v_cycles_fn()       # m chained cycles, one dispatch

        @jax.jit
        def cyc_m(b, m):
            return jnp.sum(vfn(jnp.zeros_like(b), b, m)
                           .astype(jnp.float32))

        # Wide trip spread (BASELINE.md marginal-timing footgun): at
        # ~1.5-2 ms/cycle a 4-cycle spread leaves the tunnel's ~2 ms
        # dispatch-noise tail the same order as the quantity.
        t = _marginal(lambda m: float(cyc_m(b_sh, m)), k1=2, k2=12,
                      reps=6)
        out[name] = t * 1e3
        log(f"[dist] sharded V(2,2) cycle k={K}, {len(jax.devices())} "
            f"device(s), {name}: {t * 1e3:.3f} ms")
        del solver, b_sh, vfn

    print(json.dumps({
        "metric": "sharded_4095_vcycle_wall_1dev",
        "value": round(out["pallas"], 3),
        "unit": "ms",
        "jnp_ms": round(out["jnp"], 3),
        "block_ms": round(out["pallas_block"], 3),
        "speedup": round(out["jnp"] / out["pallas"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
