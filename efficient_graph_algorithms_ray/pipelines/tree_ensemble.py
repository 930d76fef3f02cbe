"""Tree-ensemble kernel approximation — random spanning trees.

Reference parity: ``BartalTreeGFIntegrator`` / ``FRTTreeGFIntegrator``
(/root/reference/src/ega/algorithms/bartal_trees.py:15-45,
frt_trees.py:8-46) estimate the graph-metric kernel
M_ij = exp(a·dist_G(i,j)) by averaging the EXACT tree-metric kernel
over k random trees whose metrics dominate the graph metric:
``integrate_graph_field`` = (1/k) Σ_T two-pass-DP(T) (frt_trees.py:
41-46). The reference samples trees from ball-growing hierarchies
over dense all-pairs distances — O(N²) machinery that cannot exist
at 10^12 vertices.

The distributed sampler here is the **random-weight spanning tree**:
give every edge the weight splitmix64(min⊕max⊕seed) (deterministic,
symmetric, partition-independent) and take the minimum spanning
forest under the engine's distributed Borůvka — one spanning tree
per connected component, uniformly randomized by the seed. Tree
edges are graph edges, so dist_T ≥ dist_G always (the domination the
reference's trees provide); the distortion-band analysis of
``print_subopt_ratios`` (graphs_networkx_utils.py:70-76) is mirrored
in tests/test_tree_ensemble.py.

Per tree: MSF → rooted_bfs orientation → zero-shuffle map-side
dense-id→vid translation (shard base ranges) →
``integrate_tree_field_g`` (the dataset-native two-pass integrator).
The ensemble average is one ``groupby(vid)`` mean over the k outputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig, HASH_SEED
from ..state.graph import ShardedGraph
from .graph_build import build_graph
from .mst import minimum_spanning_forest
from .tree_dp import forest_graphs, integrate_tree_field_g, rooted_bfs
from ..util import parts_dataset

_SEED_STRIDE = 1000003  # distinct-seed spacing across ensemble members


def random_spanning_forest_edges(graph: ShardedGraph, seed: int):
    """One random spanning tree per connected component: the MSF under
    seeded hash edge weights w(u,v) = splitmix64(min⊕max⊕seed) >> 11
    (a 53-bit integer — exact as float64 on both the engine and any
    SQL oracle; residual ties break on (min, max)). Returns the
    undirected (a, b) tree-edge Dataset."""
    edges, _ = minimum_spanning_forest(graph, edge_weight_seed=seed)
    return edges


def _orient_forest(tree_graph: ShardedGraph, ckpt_dir: str, cc_dir: str | None = None):
    """Oriented (src=child, dst=parent) vid edges of an undirected
    forest — ZERO-shuffle: rooted_bfs writes (depth << 32 | parent
    dense-id) per partition, and a dense id maps back to its vid
    through the shard base ranges (owner shard's sorted vids), so each
    partition translates its parents map-side against the pinned
    shards. Roots emit self rows (singleton trees survive the pack)."""
    from ..state.ckpt import read_state_part
    from .decomposition import _id_bases

    _, summary = rooted_bfs(tree_graph, ckpt_dir, cc_dir=cc_dir)
    final_dir = summary["final_iter_dir"]
    bases = _id_bases(tree_graph)
    parts_sorted = sorted(bases)
    base_arr = np.array([bases[p] for p in parts_sorted], dtype=np.int64)
    parts_arr = np.array(parts_sorted, dtype=np.int64)
    refs = tree_graph.refs
    _LOW32 = np.uint64(0xFFFFFFFF)

    def _emit(batch: pa.Table) -> pa.Table:
        import ray

        src_o, dst_o = [], []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            p = int(p)
            vids = ray.get(refs[p])["vids"]
            enc = read_state_part(final_dir, p).astype(np.uint64)
            own = bases[p] + np.arange(len(enc), dtype=np.int64)
            parent_id = (enc & _LOW32).astype(np.int64)
            nonroot = parent_id != own
            pid = parent_id[nonroot]
            owner_idx = np.searchsorted(base_arr, pid, side="right") - 1
            pvid = np.empty(len(pid), dtype=np.uint64)
            for oi in np.unique(owner_idx):
                q = int(parts_arr[oi])
                qvids = vids if q == p else ray.get(refs[q])["vids"]
                sel = owner_idx == oi
                pvid[sel] = qvids[pid[sel] - base_arr[oi]]
            src_o.extend([vids[nonroot], vids[~nonroot]])
            dst_o.extend([pvid, vids[~nonroot]])
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate(src_o) if src_o else np.empty(0, np.uint64),
                    type=pa.uint64(),
                ),
                "dst": pa.array(
                    np.concatenate(dst_o) if dst_o else np.empty(0, np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    parts_ds = parts_dataset(tree_graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)


def random_forest_graphs(
    graph: ShardedGraph,
    seed: int,
    ckpt_dir: str,
    num_partitions: int = 16,
    cc_dir: str | None = None,
):
    """(g_up, g_down) of one sampled random spanning forest — the
    aligned-shard pair the dataset-native tree DP runs on. The tree
    vertex set is the FULL graph vertex set (self rows keep vertices
    the MSF left isolated)."""
    tree_edges = random_spanning_forest_edges(graph, seed)

    def _sd(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("a"), "dst": batch.column("b")})

    def _selfrows(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("vid"), "dst": batch.column("vid")})

    und = tree_edges.map_batches(_sd, batch_format="pyarrow").union(
        graph.vertex_dataset().map_batches(_selfrows, batch_format="pyarrow")
    )
    tree_g = build_graph(
        und, EngineConfig(num_partitions=num_partitions), directed=False
    )
    oriented = _orient_forest(tree_g, f"{ckpt_dir}/orient", cc_dir=cc_dir)
    return forest_graphs(oriented, num_partitions)


def tree_ensemble_kernel(
    graph: ShardedGraph,
    x_lookup,
    a: float,
    ckpt_dir: str,
    *,
    n_trees: int = 3,
    seed: int = HASH_SEED,
    num_partitions: int = 16,
):
    """Ensemble estimate y ≈ (1/k) Σ_T exp(a·dist_T)·x over k seeded
    random spanning forests — the reference's tree-ensemble readout
    (frt_trees.py:41-46) on the distributed two-pass integrator.

    Returns (Dataset (vid, integral), per-tree summaries). Cross-tree
    pairs contribute 0 per tree (disconnected-kernel convention);
    dist_T ≥ dist_G per tree, so for a < 0 and x ≥ 0 the estimate
    lower-bounds the dense graph-metric kernel matvec — and is EXACT
    when the graph is itself a forest.
    """
    from ray.data.aggregate import Mean

    # a spanning forest has exactly its source graph's components, and
    # the tree graphs share the source's partitioner when P matches —
    # so ONE CC run on the source serves every tree's root detection
    cc_dir = None
    if graph.num_partitions == num_partitions:
        from .components import connected_components

        _, cc_s = connected_components(graph, f"{ckpt_dir}/src_cc")
        cc_dir = cc_s["final_iter_dir"]

    outs = []
    summaries = []
    for i in range(n_trees):
        g_up, g_down = random_forest_graphs(
            graph, seed + i * _SEED_STRIDE, f"{ckpt_dir}/tree_{i}", num_partitions,
            cc_dir=cc_dir,
        )
        out, s = integrate_tree_field_g(
            g_up, g_down, x_lookup, a, f"{ckpt_dir}/tree_{i}/dp"
        )
        outs.append(out)
        summaries.append(s)
    ds = outs[0].union(*outs[1:]) if len(outs) > 1 else outs[0]
    avg = ds.groupby("vid").aggregate(Mean("integral", alias_name="integral"))
    return avg.select_columns(["vid", "integral"]), summaries
