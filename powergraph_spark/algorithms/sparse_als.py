"""Sparse-ALS — ALS with a CoSaMP sparse-recovery apply.

Reference: /root/reference/toolkits/collaborative_filtering/sparse_als.cpp
- identical bipartite ratings graph, gather, and scheduling to
  als.cpp; the ONLY delta is in apply (:317-347): after adding the
  flat (un-normalized) LAMBDA to XtX's diagonal (:329), the sparse
  side solves CoSaMP(XtX, Xy, K, 10, 1e-4, NLATENT) with
  K = ceil((1 - sparsity) * NLATENT) (:334-341) while the other side
  keeps the plain LDLT solve (:343) — note BOTH paths use the flat
  lambda, i.e. regnormal=False semantics.
- modes (:69-76): sparse user factors (default), sparse item factors,
  or both; user_sparsity = movie_sparsity = 0.8, LAMBDA = 0.01.
- CoSaMP (cosamp.hpp:38-82): iterate (1) rank the columns by
  |Phi^T v|, keep the top 2K as Omega, (2) T = sorted union of Omega
  with the previous support, (3) least-squares on Phi[:, T],
  (4) keep the K largest |coefficients|, (5) residual v = u - Phi S,
  stop when max|v| < tol or 10 iterations. TWO reference quirks are
  mirrored EXACTLY because correctness here means matching the
  reference, not the paper: (a) the kept coefficients are ABSOLUTE
  values (b = fabs(b), :64 — factors come out nonnegative), and
  (b) the selected coefficients are scattered to Sest at the
  *positions within T* (set_val(Sest, z3[i], ...), :68-69), not at
  the column ids T[z3[i]].

Spark mapping: rides als()'s scatter join + segmented Arrow kernel
unchanged via the per-side ``solver`` hook — only the per-vertex
apply differs (a k x k CoSaMP per updating vertex inside the Arrow
batch; k <= ~tens, so the python loop per segment is bounded work per
row group, and nothing about the shuffle plan changes).
"""

from __future__ import annotations

import math

import numpy as np

from ..graph import Graph
from .als import ALSResult, als


def cosamp(
    Phi: np.ndarray,
    u: np.ndarray,
    K: int,
    max_iter: int = 10,
    tol: float = 1e-4,
) -> np.ndarray:
    """cosamp.hpp:38-82 replica (quirks included — see module doc)."""
    D = u.shape[0]
    assert 1 <= K <= 2 * D
    Sest = np.zeros(D)
    v = u.copy()
    T2 = np.zeros(0, dtype=np.int64)
    t = 1
    while t < max_iter:
        z = np.argsort(-np.abs(Phi.T @ v), kind="stable")
        Omega = z[: 2 * K]
        T = np.union1d(Omega, T2).astype(np.int64)  # sort_union
        phit = Phi[:, T]
        b = np.abs(np.linalg.lstsq(phit, u, rcond=None)[0])
        z3 = np.argsort(-b, kind="stable")
        Sest = np.zeros(D)
        sel = z3[:K]
        Sest[sel] = b[sel]  # reference quirk (b): positions, not T[sel]
        z2 = np.argsort(-np.abs(Sest), kind="stable")
        T2 = z2[: K - 1]
        v = u - Phi @ Sest
        if np.max(np.abs(v)) < tol:
            break
        t += 1
    return Sest


def _sparse_solver(k: int, lam: float, sparsity: float):
    K = int(math.ceil((1.0 - sparsity) * k))

    def solver(ids, xtx, xy, n):
        eye = lam * np.eye(k)
        out = np.empty((len(ids), k))
        for i in range(len(ids)):
            out[i] = cosamp(xtx[i] + eye, xy[i], K)
        return out

    return solver


def _flat_solver(k: int, lam: float):
    def solver(ids, xtx, xy, n):
        A = xtx + lam * np.eye(k)[None, :, :]
        return np.linalg.solve(A, xy[..., None])[..., 0]

    return solver


def sparse_als(
    graph: Graph,
    k: int = 10,
    lam: float = 0.01,  # sparse_als.cpp:446
    user_sparsity: float = 0.8,   # sparse_als.cpp:75
    item_sparsity: float = 0.8,   # sparse_als.cpp:76 movie_sparsity
    mode: str = "user",  # user | item | both (sparse_als.cpp:69-74)
    tolerance: float = 1e-3,
    max_iterations: int = 10,
    init_expr: str | None = None,
    with_rmse: bool = True,
    verbose: bool = False,
) -> ALSResult:
    """Run sparse-ALS on a ratings_graph. The sparse side(s) per
    ``mode`` apply CoSaMP with K = ceil((1 - sparsity) * k) retained
    coefficients; the other side solves the flat-lambda normal
    equation — exactly the reference's apply split."""
    if mode not in ("user", "item", "both"):
        raise ValueError(f"sparse_als: unknown mode {mode!r}")
    flat = _flat_solver(k, lam)
    us = (
        _sparse_solver(k, lam, user_sparsity)
        if mode in ("user", "both") else flat
    )
    its = (
        _sparse_solver(k, lam, item_sparsity)
        if mode in ("item", "both") else flat
    )
    return als(
        graph,
        k=k,
        lam=lam,
        regnormal=False,
        tolerance=tolerance,
        max_iterations=max_iterations,
        init_expr=init_expr,
        with_rmse=with_rmse,
        user_solver=us,
        item_solver=its,
        verbose=verbose,
    )
