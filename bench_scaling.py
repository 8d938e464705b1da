"""Weak-scaling benchmark: sharded V-cycle, fixed rows per device.

BASELINE.md metric: >= 80% weak-scaling efficiency for a (4096^2-scale)
Poisson V-cycle 1 -> N workers. Grid rows grow with the mesh (2^k = m * D,
m fixed), so perfect scaling is flat time-per-cycle; efficiency(D) =
t(1) / t(D).

On real multi-host TPU hardware run one process per host (the mesh spans
all processes' devices). On this single-chip box the harness runs on the
virtual CPU mesh (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count),
which validates the harness and the communication structure but NOT real
ICI bandwidth — the printed efficiency is then indicative only.

Prints one JSONL record per mesh size, then a summary line.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--local-k", type=int, default=9,
                   help="rows per device = 2^local_k (weak-scaling unit)")
    p.add_argument("--smoother", default="rbgs")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh")
    p.add_argument("--cycles", type=int, default=8)
    args = p.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from multigridcmt_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from multigridcmt_tpu.config import SolverConfig
    from multigridcmt_tpu.grids import grid_coords, pad_interior
    from multigridcmt_tpu.parallel import sharded

    ndev_all = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev_all]
    results = []
    for d in sizes:
        k = args.local_k + int(np.log2(d))
        cfg = SolverConfig(ndim=2, k=k, dtype=jnp.float32,
                           smoother=args.smoother,
                           use_pallas=jax.default_backend() == "tpu")
        mesh = sharded.make_mesh(jax.devices()[:d])
        solver = sharded.ShardedSolver(cfg, mesh)
        n = cfg.n
        x, y = grid_coords(n, 2, jnp.float32)
        b = pad_interior((2 * jnp.pi ** 2 * jnp.sin(jnp.pi * x)
                          * jnp.sin(jnp.pi * y)).astype(jnp.float32))
        b_sh = sharded.shard_rhs(b, mesh)
        # Time the PRODUCTION path: v_cycles_fn chains m ext-carried
        # cycles in one dispatch (b's extended tile built once, slab
        # ghost refreshes between cycles) — exactly what the solve loop
        # runs per iteration. Per-call v_cycle_fn would add owned-tile
        # relayout + dispatch that production amortizes away
        # (VERDICT.md round-4 weak item 4).
        cycle = solver.v_cycles_fn()
        m1, m2 = 2, 2 + args.cycles
        zero = jnp.zeros_like(b_sh)
        for m in (m1, m2):                       # compile both trip counts
            float(jnp.sum(cycle(zero, b_sh, m)))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(cycle(zero, b_sh, m1)))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(cycle(zero, b_sh, m2)))
            tb = time.perf_counter() - t0
            dts.append((tb - ta) / (m2 - m1))
        dt = min(dts)
        # Per-device exchanged bytes per cycle, read off the traced
        # jaxpr (utils/comm_audit.py) — the comm surface the wall-clock
        # numbers ride on.
        from multigridcmt_tpu.utils import comm_audit
        aud = comm_audit.audit(solver.v_cycle_fn(), zero, b_sh)
        xb = aud["bytes"].get("ppermute", 0)
        results.append((d, n, dt))
        print(json.dumps({"devices": d, "grid": f"{n}x{n}",
                          "cycle_ms": round(dt * 1e3, 3),
                          "ppermutes": aud["counts"].get("ppermute", 0),
                          "exchanged_mb_per_cycle": round(xb / 1e6, 3)}),
              flush=True)

    t1 = results[0][2]
    effs = {d: round(t1 / dt, 3) for d, _, dt in results}
    print(json.dumps({"metric": "weak_scaling_efficiency",
                      "per_device": effs,
                      "target": ">=0.80",
                      "note": ("virtual CPU mesh — structural validation "
                               "only" if args.cpu or
                               jax.default_backend() == "cpu" else
                               "real hardware")}), flush=True)


if __name__ == "__main__":
    main()
