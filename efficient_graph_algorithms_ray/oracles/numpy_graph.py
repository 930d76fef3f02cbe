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


def _set_at(arr: np.ndarray, vids: np.ndarray, key, value) -> None:
    """arr[position of key in vids] = value, ignoring keys not in vids
    (guarded searchsorted — silent wrong-vertex writes are worse than
    ignored keys)."""
    i = int(np.searchsorted(vids, np.uint64(key)))
    if i < len(vids) and vids[i] == np.uint64(key):
        arr[i] = value


def _index(src: np.ndarray, dst: np.ndarray, universe: np.ndarray | None = None):
    """Vertex universe defaults to the given endpoints; pass the raw
    (pre-self-loop-drop) endpoints as ``universe`` to keep vertices
    whose only edge was a self-loop — engine semantics: the vertex
    exists, the self-edge doesn't."""
    vids = np.unique(np.concatenate([src, dst]) if universe is None else universe)
    si = np.searchsorted(vids, src)
    di = np.searchsorted(vids, dst)
    return vids, si, di


def dedup_edges(src: np.ndarray, dst: np.ndarray, drop_self: bool = True):
    keep = src != dst if drop_self else np.ones(len(src), dtype=bool)
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return src, dst
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
    universe = np.concatenate([src, dst])
    src, dst = dedup_edges(src, dst)
    vids, si, di = _index(src, dst, universe)
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
    universe = np.concatenate([src, dst])
    src, dst = dedup_edges(src, dst)
    vids, si, di = _index(src, dst, universe)
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
    universe = np.concatenate([src, dst])
    src, dst = dedup_edges(src, dst)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    vids, si, di = _index(s2, d2, universe)
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
    universe = np.concatenate([src, dst])
    src, dst = dedup_edges(src, dst)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    s2, d2 = dedup_edges(s2, d2)
    vids, si, di = _index(s2, d2, universe)
    n = len(vids)
    A = np.zeros((n, n), dtype=np.float64)
    A[si, di] = 1.0
    tri = ((A @ A) * A).sum(axis=1) / 2
    return vids, tri.astype(np.int64)


def generalized_walk_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    *,
    weights: np.ndarray | None = None,
    damping: float = 0.85,
    teleport: dict[int, float] | None = None,
    init: dict[int, float] | None = None,
    tol: float = 1e-6,
    max_iters: int = 100,
):
    """Dense oracle for the generalized damped walk:
    r ← (1-d)·T + d·(P_w·r + T·dangling_mass), matching
    state/bsp.py combine semantics. teleport=None → uniform;
    teleport={} with damping=1 → pure k-step walk (dangling absorbed).
    Duplicate edges sum their weights (unit if weights is None)."""
    universe = np.concatenate([src, dst])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = (weights[keep] if weights is not None else np.ones(len(src))).astype(np.float64)
    if len(src):
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        first = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
        gid = np.cumsum(first) - 1
        w = np.bincount(gid, weights=w)
        src, dst = src[first], dst[first]

    vids, si, di = _index(src, dst, universe)
    n = len(vids)
    wdeg = np.bincount(si, weights=w, minlength=n)
    if teleport is None:
        T = np.full(n, 1.0 / n)
    else:
        T = np.zeros(n)
        for v, tw in teleport.items():
            _set_at(T, vids, v, tw)
        if T.sum() > 0:
            T = T / T.sum()
    if init is None:
        # fixed point is init-independent for damping<1 (tol mode);
        # fixed-k runs (tol=0) match the engine's uniform start
        r = np.full(n, 1.0 / n)
    else:
        r = np.zeros(n)
        for v, val in init.items():
            _set_at(r, vids, v, val)
    for _ in range(max_iters):
        contrib = np.divide(r, wdeg, out=np.zeros(n), where=wdeg > 0)
        msg = np.bincount(di, weights=contrib[si] * w, minlength=n)
        dangling = r[wdeg == 0].sum()
        r_new = (1.0 - damping) * T + damping * (msg + T * dangling)
        delta = np.abs(r_new - r).max()
        r = r_new
        if tol > 0 and delta < tol:
            break
    return vids, r


def interpolate_oracle(
    src: np.ndarray, dst: np.ndarray, values: dict[int, float], mask: dict[int, float]
):
    """Dense masked neighbor interpolation: gather(F·m)/gather(m) over
    the normalized walk matrix (Interpolator semantics)."""
    universe = np.concatenate([src, dst])
    src2, dst2 = dedup_edges(src, dst)
    vids, si, di = _index(src2, dst2, universe)
    n = len(vids)
    deg = np.bincount(si, minlength=n)
    F = np.zeros(n)
    M = np.zeros(n)
    for v, val in values.items():
        _set_at(F, vids, v, val)
    for v, mv in mask.items():
        _set_at(M, vids, v, mv)
    def gather(x):
        contrib = np.divide(x, deg, out=np.zeros(n), where=deg > 0)
        return np.bincount(di, weights=contrib[si], minlength=n)
    nu, de = gather(F * M), gather(M)
    return vids, np.divide(nu, de, out=np.zeros(n), where=de > 0)


def msf_oracle(src: np.ndarray, dst: np.ndarray, weights: np.ndarray | None = None):
    """Kruskal + union-find under the (w, min, max) total order —
    reference semantics (spanning_trees.py:98-124 / DisjointSetADT).
    Returns (a, b, w) arrays of the unique minimum spanning forest."""
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = (weights[keep] if weights is not None else np.ones(len(src))).astype(np.float64)
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    order = np.lexsort((b, a))
    a, b, w = a[order], b[order], w[order]
    first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    # duplicate undirected edges collapse; weights summed to mirror the
    # engine's duplicate-weight aggregation in CSR pack
    gid = np.cumsum(first) - 1
    w = np.bincount(gid, weights=w)
    a, b = a[first], b[first]

    vids = np.unique(np.concatenate([a, b]))
    ia, ib = np.searchsorted(vids, a), np.searchsorted(vids, b)
    order = np.lexsort((b, a, w))
    parent = np.arange(len(vids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out_a, out_b, out_w = [], [], []
    for i in order:
        ra, rb = find(ia[i]), find(ib[i])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out_a.append(a[i])
            out_b.append(b[i])
            out_w.append(w[i])
    return (
        np.array(out_a, dtype=np.uint64),
        np.array(out_b, dtype=np.uint64),
        np.array(out_w, dtype=np.float64),
    )
