"""Matplotlib plot artifacts matching the reference's demo outputs.

The reference's scripts verify by eye with residual-history decay plots,
FMG error-vs-h plots, and eigenmode pictures (SURVEY.md §2 "Plot/demo
scripts" row, §4 artifact classes). These helpers reproduce those artifact
classes from the build's on-device results; every example CLI exposes them
behind ``--plot FILE``. Headless-safe (Agg backend), no display needed.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_residual_history(histories, path: str, title: str = ""):
    """Semilogy relative-residual decay; `histories` maps label -> 1D array
    (trailing repeated entries past convergence are trimmed)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for label, hist in histories.items():
        h = np.asarray(hist, dtype=float)
        keep = len(h)
        while keep > 2 and h[keep - 1] == h[keep - 2]:
            keep -= 1
        ax.semilogy(np.arange(keep), h[:keep], marker="o", ms=3, label=label)
    ax.set_xlabel("V-cycle")
    ax.set_ylabel(r"$\|r_k\| / \|r_0\|$")
    ax.grid(True, which="both", alpha=0.3)
    if title:
        ax.set_title(title)
    if len(histories) > 1 or any(histories):
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)


def plot_error_convergence(ns, errs, path: str, title: str = "FMG accuracy"):
    """Log-log discrete-L2 error vs n with an O(h^2) guide line."""
    plt = _plt()
    ns = np.asarray(ns, dtype=float)
    errs = np.asarray(errs, dtype=float)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.loglog(ns, errs, marker="o", label="FMG discrete-$L_2$ error")
    guide = errs[0] * (ns[0] / ns) ** 2
    ax.loglog(ns, guide, "k--", alpha=0.6, label=r"$O(h^2)$")
    ax.set_xlabel("grid side $n$")
    ax.set_ylabel("error")
    ax.grid(True, which="both", alpha=0.3)
    ax.set_title(title)
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)


def plot_eigenmodes(vectors, n: int, ndim: int, eigenvalues, path: str):
    """Grid of computed eigenmodes (2D: imshow; 1D: line plots)."""
    plt = _plt()
    vecs = np.asarray(vectors)
    k = vecs.shape[0] if vecs.ndim > ndim else 1
    vecs = vecs.reshape((k,) + (n,) * ndim)
    lams = np.atleast_1d(np.asarray(eigenvalues, dtype=float))
    cols = min(k, 3)
    rows = -(-k // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 2.8 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        if i >= k:
            ax.axis("off")
            continue
        if ndim == 2:
            ax.imshow(vecs[i], cmap="RdBu_r", origin="lower")
            ax.set_xticks([])
            ax.set_yticks([])
        else:
            ax.plot(vecs[i])
        ax.set_title(rf"$\lambda_{{{i + 1}}}$ = {lams[i]:.5f}", fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=140)
    plt.close(fig)
