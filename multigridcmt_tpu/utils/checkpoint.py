"""Checkpoint/resume via Orbax (SURVEY.md §5 "Checkpoint / resume").

The reference solves finish in seconds and have no checkpointing; the
build's long multi-host runs snapshot (x, residual history, iteration) so
an interrupted solve replays deterministically: resume restarts the outer
V-cycle loop from the saved x — V-cycle iteration is a fixed-point map, so
restart-from-x is bitwise the same algorithm the uninterrupted solve runs.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(path: str, x: jax.Array, res_history: jax.Array,
               iters, extra: Optional[Dict[str, Any]] = None) -> None:
    """Snapshot solver state to `path` (an empty/fresh directory)."""
    ocp = _ocp()
    state = {
        "x": np.asarray(x),
        "res_history": np.asarray(res_history),
        "iters": np.asarray(iters),
    }
    if extra:
        state.update({k: np.asarray(v) for k, v in extra.items()})
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_state(path: str) -> Dict[str, Any]:
    """Restore a snapshot saved by `save_state`."""
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def resume_solve(solver, path: str, b=None, **solve_kwargs):
    """Resume an interrupted solve from a snapshot.

    Works against both ``MultigridSolver`` (b defaults to the problem's
    RHS) and ``ShardedSolver`` (pass the padded RHS as ``b``, or save it
    in the snapshot via ``extra={"b": ...}``). Restarts the outer
    iteration with x0 = saved x — V-cycle iteration is a fixed-point map,
    so the returned result's history is the post-resume tail of the same
    algorithm the uninterrupted solve runs. Extra kwargs (e.g.
    ``method="pcg"``) pass through to ``solver.solve``.
    """
    state = load_state(path)
    import jax.numpy as jnp

    x0 = jnp.asarray(state["x"])
    if "eigenvalues" in state:
        # Eigensolver snapshot (save the eigenvector block as "x" plus
        # extra={"eigenvalues": ...}): resume via the v0 warm start —
        # the block is re-orthonormalized on entry, so a partially
        # converged block resumes the same subspace iteration.
        return solver.eigensolve(v0=x0, **solve_kwargs)
    if b is None and "b" in state:
        b = jnp.asarray(state["b"])
    if b is None:
        if not hasattr(solver, "problem"):
            # ShardedSolver has no stored RHS: solver.solve(b, ...) needs
            # it explicitly, and falling through would raise an opaque
            # TypeError about a missing positional argument.
            raise ValueError(
                "ShardedSolver resume needs the RHS: pass b= to "
                "resume_solve, or save it in the snapshot via "
                'extra={"b": ...}')
        return solver.solve(x0=x0, **solve_kwargs)
    return solver.solve(b, x0=x0, **solve_kwargs)
