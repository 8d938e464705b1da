"""Structured solver metrics: per-iteration JSONL records (SURVEY.md §5).

The reference prints residuals and draws matplotlib plots; the build emits
machine-readable records from host 0 so multi-host runs have one
observability stream: residual, convergence factor rho, iteration timings,
and achieved nnz/s — the BASELINE.json:2 metric set.
"""
from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

import jax
import numpy as np


def is_host0() -> bool:
    return jax.process_index() == 0


class MetricsLogger:
    """JSONL metrics writer (host 0 only; no-ops elsewhere).

    >>> m = MetricsLogger(open("solve.jsonl", "w"))
    >>> m.log("iteration", iter=3, residual=1.2e-5, rho=0.09)
    """

    def __init__(self, stream: Optional[IO] = None):
        self.stream = stream if stream is not None else sys.stderr
        self.enabled = is_host0()
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields):
        if not self.enabled:
            return
        rec = {"event": event,
               "t": round(time.perf_counter() - self._t0, 6)}
        rec.update({k: (float(v) if isinstance(v, (jax.Array, np.floating))
                        else v) for k, v in fields.items()})
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()

    def log_solve_result(self, result, config=None):
        """Expand a SolveResult into per-iteration records + a summary."""
        hist = np.asarray(result.res_history)
        iters = int(result.iters)
        for k in range(iters + 1):
            rho = float(hist[k] / hist[k - 1]) if k > 0 and hist[k - 1] > 0 \
                else None
            self.log("iteration", iter=k, residual=float(hist[k]), rho=rho)
        mean_rho = float((hist[iters] / hist[0]) ** (1.0 / max(iters, 1)))
        self.log("solve_done", iters=iters, converged=bool(result.converged),
                 final_residual=float(hist[iters]), mean_rho=mean_rho,
                 config=None if config is None else {
                     "ndim": config.ndim, "k": config.k,
                     "smoother": config.smoother, "cycle": config.cycle,
                     "nu1": config.nu1, "nu2": config.nu2,
                     "tol": config.tol})


def divergence_guard(res_history, iters, threshold: float = 1.0) -> bool:
    """Numerical-failure detection (SURVEY.md §5 "Failure detection"):
    True if the solve is diverging (rho >= threshold over the last steps)."""
    hist = np.asarray(res_history)
    iters = int(iters)
    if iters < 2:
        return False
    return bool(hist[iters] > threshold * hist[iters - 1]
                and hist[iters - 1] > threshold * hist[iters - 2])
