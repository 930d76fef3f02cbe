"""Connected components & label propagation — min-label supersteps.

CC semantics: exact BFS flood-fill coloring per the reference's
``color_connected_components`` (/root/reference/src/planar_separators/
lipton_tarjan/utils.py:62-76) and ``DisjointSetADT``
(/root/reference/src/ega/algorithms/spanning_trees.py:11-47): every
vertex ends with component label = min vid in its (undirected)
component — deterministic, so exact-match testable.

Label propagation: same skeleton with seeded initial labels
(unlabeled = UNLABELED sentinel, the monoid identity); at convergence
each vertex holds the min seed label reachable from it. Reference
shape: ``node_cluster_assignment`` label assignment
(/root/reference/src/ega/algorithms/gromov_wasserstein_graphs.py:867-919).

Convergence is O(diameter) rounds of one-shuffle supersteps; web
graphs have small diameter, so pointer-jumping is not needed at the
bench scales (documented trade-off — it would halve rounds at the
cost of mutating the edge set every round).
"""

from __future__ import annotations

import numpy as np

from ..config import UNLABELED
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset


def connected_components(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    max_iters: int = 200,
    resume: bool = False,
) -> tuple:
    """Min-label propagation to fixpoint; returns (Dataset (vid, component), summary).

    ``graph`` must be built with directed=False (symmetrized).
    """
    assert not graph.directed, "connected components requires an undirected graph"

    def init_fn(csr):
        return csr["vids"].copy()  # label(v) = vid

    summary = run_supersteps(
        graph, ckpt_dir, "min", init_fn, tol=0.0, max_iters=max_iters, resume=resume
    )
    comp = state_vertex_dataset(graph, summary["final_iter_dir"], "component")
    return comp, summary


def label_propagation(
    graph: ShardedGraph,
    ckpt_dir: str,
    seeds: dict[int, int] | None = None,
    *,
    max_iters: int = 200,
    resume: bool = False,
) -> tuple:
    """Seeded min-label propagation; returns (Dataset (vid, label), summary).

    seeds: {vid: label}; unseeded vertices start UNLABELED and adopt
    the min reachable seed label. seeds=None → every vertex seeds its
    own vid (≡ connected components).
    """
    if seeds is None:
        return connected_components(graph, ckpt_dir, max_iters=max_iters, resume=resume)

    seed_vids = np.fromiter(seeds.keys(), dtype=np.uint64, count=len(seeds))
    seed_labels = np.fromiter((seeds[int(v)] for v in seed_vids), dtype=np.uint64, count=len(seeds))
    order = np.argsort(seed_vids)
    seed_vids, seed_labels = seed_vids[order], seed_labels[order]

    def init_fn(csr):
        value = np.full(len(csr["vids"]), UNLABELED, dtype=np.uint64)
        pos = np.searchsorted(seed_vids, csr["vids"])
        pos_ok = pos < len(seed_vids)
        hit = np.zeros(len(csr["vids"]), dtype=bool)
        hit[pos_ok] = seed_vids[pos[pos_ok]] == csr["vids"][pos_ok]
        value[hit] = seed_labels[np.searchsorted(seed_vids, csr["vids"][hit])]
        return value

    summary = run_supersteps(
        graph, ckpt_dir, "min", init_fn, tol=0.0, max_iters=max_iters, resume=resume
    )
    labels = state_vertex_dataset(graph, summary["final_iter_dir"], "label")
    return labels, summary


def connected_components_warm(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    warm_graph: ShardedGraph,
    warm_final_dir: str,
    max_iters: int = 200,
) -> tuple:
    """Incremental connected components — warm-start from a previous
    run's final labels (the crawl-delta pattern, CC edition; see
    pagerank.pagerank_warm for the mechanics). Valid for EDGE-ADDITION
    deltas only: min-label propagation only ever decreases labels, and
    the old labels (per-old-component min vids) are upper bounds of
    the new fixed point, so the warm run converges to EXACTLY the
    cold answer on the new graph — usually in rounds proportional to
    how far merges propagate, not the full diameter. Edge deletions
    can orphan a too-small label and need a cold run (documented
    contract). New vertices start at label = vid.

    ``init_fn`` reads only its own shard's old state file inside the
    worker — no driver funnel, no broadcast. Returns
    (Dataset (vid, component), summary).
    """
    from ..state.ckpt import read_state_part

    assert not graph.directed, "connected components requires an undirected graph"
    if len(graph.parts) != len(warm_graph.parts):
        raise ValueError("warm start requires the same partition count")
    old_refs = warm_graph.refs

    def init_fn(csr):
        import ray

        p = int(csr["part"])
        vids = csr["vids"]
        out = vids.copy()
        if p in old_refs:
            old_vids = ray.get(old_refs[p])["vids"]
            old_state = np.asarray(read_state_part(warm_final_dir, p))
            pos = np.searchsorted(old_vids, vids)
            ok = pos < len(old_vids)
            match = np.zeros(len(vids), dtype=bool)
            match[ok] = old_vids[pos[ok]] == vids[ok]
            out[match] = old_state[pos[match]].astype(out.dtype)
        return out

    summary = run_supersteps(
        graph, ckpt_dir, "min", init_fn, tol=0.0, max_iters=max_iters
    )
    comp = state_vertex_dataset(graph, summary["final_iter_dir"], "component")
    return comp, summary
