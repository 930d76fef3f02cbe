"""efficient_graph_algorithms_ray — a Ray-Data-native link-graph analytics engine.

From-scratch re-implementation of the *capabilities* of
``topographers/efficient_graph_algorithms`` (reference snapshot at
``/root/reference``) on top of ``ray.data.Dataset``:

- PageRank (power iteration, damping 0.85) — reference semantics:
  ``random_walk_with_restart_kernel`` (graph_kernels.py:72-79)
- Connected components (iterative min-label propagation) — reference
  semantics: BFS coloring (lipton_tarjan/utils.py:62-76) /
  ``DisjointSetADT`` (spanning_trees.py:11-47)
- Label propagation (min-label with deterministic tie-break) —
  reference shape: ``node_cluster_assignment``
  (gromov_wasserstein_graphs.py:867-919)
- Per-vertex triangle counting — reference machinery:
  ``interconnected_kernel`` A² common-neighbor term
  (graph_kernels.py:109-112)

plus the training-data operators a 100 TB pipeline needs (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is expressed Ray-Data-first: Datasets of Arrow batches,
``map_batches`` with vectorized kernels, actor pools for stateful
stages, explicit hash partitioning for the iterative graph kernels.
Raw ``ray.put``/``ray.get`` is used in exactly one place — the
immutable CSR shard index shared across supersteps — which the
Dataset API cannot express.
"""

__version__ = "0.1.0"
