"""Dense single-process oracles for small-scale correctness tests.

These implement the reference's semantics directly:
- pagerank_oracle: damped random-walk-with-restart fixed point,
  /root/reference/src/ega/algorithms/graph_kernels.py:72-79
- components_oracle: BFS flood-fill coloring,
  /root/reference/src/planar_separators/lipton_tarjan/utils.py:62-76
- label_prop_oracle: sequential min-label rounds
- triangles_oracle: ((A @ A) * A).sum(axis=1) / 2 per vertex
  (common-neighbor counting per the A² term of
  ``interconnected_kernel``, graph_kernels.py:109-112)

All take a deduped edge array (src, dst) of uint64 vids, exactly the
engine's edge table after normalization/hashing, and return results
keyed by vid.
"""

from __future__ import annotations

import numpy as np

from ..config import UNLABELED


def _index(src: np.ndarray, dst: np.ndarray):
    vids = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    return vids, si, di


def dedup_edges(src: np.ndarray, dst: np.ndarray, drop_self: bool = True):
    keep = src != dst if drop_self else np.ones(len(src), dtype=bool)
    src, dst = src[keep], dst[keep]
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    return src[keep], dst[keep]


def pagerank_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
):
    """Returns (vids, ranks) after power iteration to ‖Δ‖∞ < tol
    (or exactly max_iters iterations when tol == 0)."""
    src, dst = dedup_edges(src, dst)
    vids, si, di = _index(src, dst)
    n = len(vids)
    out_deg = np.bincount(si, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iters):
        contrib = np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
        msg = np.bincount(di, weights=contrib[si], minlength=n)
        dangling = r[out_deg == 0].sum()
        r_new = (1.0 - damping) / n + damping * (msg + dangling / n)
        delta = np.abs(r_new - r).max()
        r = r_new
        if tol > 0 and delta < tol:
            break
    return vids, r


def components_oracle(src: np.ndarray, dst: np.ndarray):
    """Exact CC via union-find; component label = min vid in component."""
    src, dst = dedup_edges(src, dst)
    vids, si, di = _index(src, dst)
    parent = np.arange(len(vids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(si, di):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(len(vids))])
    # min vid per component == vid of the min index root (vids sorted)
    return vids, vids[roots]


def label_prop_oracle(src: np.ndarray, dst: np.ndarray, seeds: dict[int, int]):
    """Sequential min-label rounds over the symmetrized graph."""
    src, dst = dedup_edges(src, dst)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    vids, si, di = _index(s2, d2)
    labels = np.full(len(vids), UNLABELED, dtype=np.uint64)
    for v, lab in seeds.items():
        i = np.searchsorted(vids, np.uint64(v))
        if i < len(vids) and vids[i] == np.uint64(v):
            labels[i] = np.uint64(lab)
    for _ in range(len(vids) + 1):
        incoming = labels.copy()
        np.minimum.at(incoming, di, labels[si])
        if np.array_equal(incoming, labels):
            break
        labels = incoming
    return vids, labels


def triangles_oracle(src: np.ndarray, dst: np.ndarray):
    """Per-vertex triangle counts on the simple undirected graph."""
    src, dst = dedup_edges(src, dst)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    s2, d2 = dedup_edges(s2, d2)
    vids, si, di = _index(s2, d2)
    n = len(vids)
    A = np.zeros((n, n), dtype=np.float64)
    A[si, di] = 1.0
    tri = ((A @ A) * A).sum(axis=1) / 2
    return vids, tri.astype(np.int64)
