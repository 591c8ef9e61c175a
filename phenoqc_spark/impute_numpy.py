"""NumPy implementations of the advanced imputers.

The reference uses sklearn's ``KNNImputer`` / ``IterativeImputer`` and
fancyimpute's ``IterativeSVD`` (reference: src/phenoqc/missing_data.py:
134-173).  Those libraries are not available in this runtime, so the
published algorithms are implemented directly:

- KNN: nan-Euclidean distance (missing dims masked, rescaled by
  n_features/n_present), k nearest donors per missing cell, uniform mean.
- Iterative (MICE-style): column-mean init, then round-robin ridge
  regressions of each missing-bearing feature on the others until the
  change falls below tol (IterativeImputer's default chained-equations).
- IterativeSVD: column-mean init, repeated rank-k SVD reconstruction of
  the missing entries until convergence.

These run inside ``mapInPandas`` partitions, which matches the reference's
*chunk-local* fitting semantics (a fresh engine is constructed per chunk at
batch_processing.py:575-578) — partition-local = same statistical scope.
"""

from __future__ import annotations

import numpy as np


def nan_euclidean_distances(X: np.ndarray) -> np.ndarray:
    """Pairwise nan-Euclidean distances (sklearn semantics)."""
    n, d = X.shape
    present = ~np.isnan(X)
    Xz = np.where(present, X, 0.0)
    # squared distances over mutually-present dims
    sq = (Xz**2 @ present.T) + (present @ (Xz**2).T) - 2.0 * (Xz @ Xz.T)
    shared = present.astype(float) @ present.T.astype(float)
    with np.errstate(divide="ignore", invalid="ignore"):
        dist2 = np.where(shared > 0, sq * (d / shared), np.inf)
    np.fill_diagonal(dist2, 0.0)
    dist2 = np.maximum(dist2, 0.0)
    return np.sqrt(dist2)


def knn_impute(X: np.ndarray, n_neighbors: int = 5) -> np.ndarray:
    """KNNImputer(n_neighbors, weights='uniform') equivalent."""
    X = np.asarray(X, dtype=float)
    out = X.copy()
    missing = np.isnan(X)
    if not missing.any():
        return out
    col_means = np.nanmean(np.where(np.isinf(X), np.nan, X), axis=0)
    dist = nan_euclidean_distances(X)
    n = X.shape[0]
    for j in range(X.shape[1]):
        mis_rows = np.where(missing[:, j])[0]
        if mis_rows.size == 0:
            continue
        donors = np.where(~missing[:, j])[0]
        if donors.size == 0:
            out[mis_rows, j] = col_means[j] if np.isfinite(col_means[j]) else 0.0
            continue
        for i in mis_rows:
            drow = dist[i, donors]
            finite = np.isfinite(drow)
            cand = donors[finite]
            if cand.size == 0:
                out[i, j] = col_means[j] if np.isfinite(col_means[j]) else 0.0
                continue
            k = min(n_neighbors, cand.size)
            order = np.argsort(drow[finite], kind="stable")[:k]
            out[i, j] = X[cand[order], j].mean()
    return out


def iterative_impute(
    X: np.ndarray,
    max_iter: int = 10,
    tol: float = 1e-3,
    ridge: float = 1e-6,
    random_state: int = 0,
) -> np.ndarray:
    """IterativeImputer-style chained ridge regressions."""
    X = np.asarray(X, dtype=float)
    missing = np.isnan(X)
    if not missing.any():
        return X.copy()
    col_means = np.nanmean(X, axis=0)
    col_means = np.where(np.isfinite(col_means), col_means, 0.0)
    out = X.copy()
    for j in range(X.shape[1]):
        out[missing[:, j], j] = col_means[j]
    # fewest-missing-first feature order (sklearn default 'ascending')
    order = np.argsort(missing.sum(axis=0), kind="stable")
    order = [j for j in order if missing[:, j].any()]
    prev = out.copy()
    scale = np.nanmax(np.abs(X)) if np.isfinite(np.nanmax(np.abs(X))) else 1.0
    for _ in range(max_iter):
        for j in order:
            obs = ~missing[:, j]
            mis = missing[:, j]
            others = [k for k in range(X.shape[1]) if k != j]
            if not others or obs.sum() < 2:
                continue
            A = out[np.ix_(obs, others)]
            b = out[obs, j]
            A1 = np.hstack([A, np.ones((A.shape[0], 1))])
            try:
                G = A1.T @ A1 + ridge * np.eye(A1.shape[1])
                w = np.linalg.solve(G, A1.T @ b)
            except np.linalg.LinAlgError:
                continue
            P = out[np.ix_(mis, others)]
            out[mis, j] = np.hstack([P, np.ones((P.shape[0], 1))]) @ w
        delta = np.max(np.abs(out - prev)) if out.size else 0.0
        if delta < tol * max(scale, 1.0):
            break
        prev = out.copy()
    return out


def iterative_svd_impute(
    X: np.ndarray,
    rank: int | None = None,
    max_iter: int = 30,
    tol: float = 1e-4,
) -> np.ndarray:
    """fancyimpute.IterativeSVD equivalent (mean init, rank-k refit loop)."""
    X = np.asarray(X, dtype=float)
    missing = np.isnan(X)
    if not missing.any():
        return X.copy()
    n, d = X.shape
    if rank is None:
        rank = max(1, min(n, d) - 1)
    rank = max(1, min(rank, min(n, d)))
    col_means = np.nanmean(X, axis=0)
    col_means = np.where(np.isfinite(col_means), col_means, 0.0)
    out = X.copy()
    for j in range(d):
        out[missing[:, j], j] = col_means[j]
    prev_missing = out[missing]
    for _ in range(max_iter):
        try:
            U, s, Vt = np.linalg.svd(out, full_matrices=False)
        except np.linalg.LinAlgError:
            break
        recon = (U[:, :rank] * s[:rank]) @ Vt[:rank]
        out[missing] = recon[missing]
        cur = out[missing]
        denom = np.linalg.norm(prev_missing) or 1.0
        if np.linalg.norm(cur - prev_missing) / denom < tol:
            break
        prev_missing = cur
    return out
