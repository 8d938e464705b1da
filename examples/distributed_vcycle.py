"""BASELINE config 5: 4096^2-scale Poisson V-cycle row-partitioned across a
device mesh with ppermute halos and coarse-level agglomeration.

Single host: uses all local devices (or a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
Multi-host: launch one process per host with --multihost; the code path is
identical (jax.distributed + the same mesh over all processes' devices).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multigridcmt_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import multigridcmt_tpu as mg
from multigridcmt_tpu.config import SolverConfig
from multigridcmt_tpu.parallel import sharded


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--k", type=int, default=12, help="grid: (2^k - 1)^2")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--cycle", default="v", choices=["v", "w", "fmg"])
    p.add_argument("--eigen", type=int, default=0, metavar="K",
                   help="instead of solving, find the K smallest "
                        "eigenpairs with the distributed eigensolver")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() first")
    args = p.parse_args()

    if args.multihost:
        jax.distributed.initialize()

    dtype = jnp.float64 if args.f64 else jnp.float32
    cfg = SolverConfig(ndim=2, k=args.k, dtype=dtype, smoother="rbgs",
                       cycle=args.cycle, tol=args.tol)
    mesh = sharded.make_mesh()
    solver = sharded.ShardedSolver(cfg, mesh)

    if args.eigen:
        res = solver.eigensolve(k=args.eigen, tol=max(args.tol, 1e-9))
        if jax.process_index() == 0:
            lam = np.sort(np.asarray(res.eigenvalues))
            print(f"n={cfg.n}^2 on {solver.ndev} devices: "
                  f"iters={int(res.iters)} converged={bool(res.converged)}")
            print(f"eigenvalues: {lam}  (lambda_1 -> 2*pi^2 = "
                  f"{2 * np.pi ** 2:.6f} as h -> 0)")
        return

    prob = mg.poisson2d(k=args.k, dtype=dtype)
    res = solver.solve(prob.b)
    if jax.process_index() == 0:
        rho = float(mg.convergence_factor(res))
        print(f"n={cfg.n}^2 on {solver.ndev} devices: iters={int(res.iters)}"
              f"  converged={bool(res.converged)}  rho={rho:.4f}")
        err = np.abs(np.asarray(mg.interior(res.x))
                     - np.asarray(mg.interior(prob.u_exact))).max()
        print(f"max error vs analytic solution: {err:.3e}")


if __name__ == "__main__":
    main()
