"""Superstep driver: checkpointed BSP loop over the actor pool.

Engine equivalent of the reference's abstract integrator contract
``GFIntegrator.integrate_graph_field(field) -> field`` (/root/
reference/src/ega/algorithms/gf_integrator.py:3-37): one superstep is
one distributed matvec over the partitioned graph. Three combine
monoids cover the algorithm families:

- mode='sum'  → PageRank power iteration (damped random walk with
  restart, /root/reference/src/ega/algorithms/graph_kernels.py:72-79);
  with ``msg_fn`` also gated tree-DP accumulation (pipelines/tree_dp.py)
- mode='min'  → connected components / label propagation (min-label
  hash propagation; BFS-coloring semantics per
  /root/reference/src/planar_separators/lipton_tarjan/utils.py:62-76);
  with ``msg_fn``/``edge_shift_fn`` also encoded-key propagation:
  random-shift decomposition, rooted BFS, weighted shortest paths
- mode='max'  → elementwise max over non-negative vector fields
  (HyperANF HLL-register propagation, pipelines/anf.py)

Why the superstep loop is actors + tasks rather than a Dataset
``groupby`` (the one deliberate departure — everything non-iterative
stays pure Ray Data): a Dataset is a DAG with no iteration primitive,
so each superstep would be a fresh pipeline; measured here, the
sort-based all-to-all costs 1.5–3 s *fixed* per execution even for a
few hundred pre-aggregated message rows — over 30–50 sequential
supersteps that is pure latency. The exchange is a static, per-pair
pre-aggregated transfer between pinned shards (the "shared index"
case), executed by ``state/bsp.py`` workers with precomputed message
structure. See bsp.py for the skew story (hub fan-in ≤ W partials).

Checkpointing (north-rule requirement): every superstep writes each
partition's state to ``{ckpt}/iter_{k:05d}/part_*.parquet`` (atomic
tmp+rename) and the driver writes a sibling ``iter_{k:05d}.json``
manifest with per-partition lineage + metrics (seconds, ‖Δ‖∞, L1,
label changes, dangling mass, edges/sec). Resume scans for the last
manifest, reloads that state into a fresh pool, and continues to an
identical final output (tested in tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import list_array, list_rows
from .graph import ShardedGraph

from .ckpt import (  # noqa: F401  (re-exported: public checkpoint API)
    find_last_complete,
    iter_dir as _iter_dir_fn,
    manifest_path as _manifest_path,
    read_state_part,
    write_state_part,
)

_F64 = pa.float64()
_U64 = pa.uint64()


def _iter_dir(ckpt: str, k: int) -> str:
    return _iter_dir_fn(ckpt, k)


def _write_manifest(ckpt: str, k: int, obj: dict) -> None:
    """Atomic manifest write (tmp + rename), mirroring write_state_part:
    find_last_complete keys on file existence, so a torn manifest from a
    mid-write crash must never be left behind."""
    path = _manifest_path(ckpt, k)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _pool_plan(num_parts: int) -> tuple[int, float]:
    """(W, num_cpus per worker). W = one worker per CPU (balanced
    partition ownership), but the pool reserves only cpus − max(1, cpus/8)
    CPUs in total: Ray Data stages (e.g. a just-finished parse pool) can
    hold stray reservations for tens of seconds after their dataset
    completes, and a single pending worker blocks the pool's init
    barrier (measured: a 19 s stall for the 32nd actor on a 32-cpu
    grant with 1-CPU headroom, and a 12.7 s init in BENCH_r03 showing
    one CPU of headroom is not enough). Reservations only gate
    placement — the supersteps are BSP-synchronized, so up to cpus/8 of
    nominal oversubscription costs nothing while no other pipeline is
    executing, which is the case everywhere run_supersteps is called
    (graph shards are materialized before the loop starts)."""
    cpus = int(ray.cluster_resources().get("CPU", 4))
    W = max(1, min(cpus, num_parts))
    headroom = max(1, cpus // 8)
    frac = max(0.5, (cpus - headroom) / cpus) if cpus > 1 else 1.0
    return W, frac


def run_supersteps(
    graph: ShardedGraph,
    ckpt: str,
    mode: str,
    init_fn,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    resume: bool = False,
    teleport_fn=None,
    normalize: bool = True,
    apply_fn=None,
    msg_fn=None,
    edge_shift_fn=None,
    multi_returns: bool | None = None,
    msg_edge_weights: bool = False,
    msg_edge_min: bool = False,
    ckpt_every: int = 1,
) -> dict:
    """Drive supersteps to convergence; returns the run summary dict.

    Convergence: mode='sum' → L∞ delta < tol; mode='min' → zero label
    changes. ``tol=0`` with mode='sum' runs exactly max_iters
    iterations (used for SQL-oracle-matching fixed-k runs).

    ``ckpt_every``: checkpoint cadence. 1 (default) writes state +
    manifest every superstep (finest-grained resume — the north-rule
    contract for the flagship runs). N>1 writes every N-th iteration
    plus ALWAYS the final one (flushed after the convergence break),
    trading resume granularity for wall time on long fixpoint loops
    (hundreds of cheap rounds, e.g. DAG layering) where the parquet
    write dominates the superstep.
    """
    import shutil

    from .bsp import BSPWorker, make_owner_map

    if not resume:
        shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(ckpt, exist_ok=True)
    parts = graph.parts
    P = graph.num_partitions
    N = graph.n_vertices
    E = graph.n_edges
    W, cpu_frac = _pool_plan(len(parts))
    owner_map = make_owner_map(parts, P, W)
    # multi-node exchange flip: per-destination scatter objects
    # (num_returns=W) instead of one fused object per worker — see
    # BSPWorker.scatter_multi. Default: fused (single-node optimum).
    if multi_returns is None:
        multi_returns = os.environ.get("GRAFT_MULTI_RETURNS", "0") == "1"
    multi_returns = bool(multi_returns) and W > 1

    owned_by_w: list[list[tuple[int, ray.ObjectRef]]] = [[] for _ in range(W)]
    for p in parts:
        owned_by_w[owner_map[p]].append((p, graph.refs[p]))

    t_pool0 = time.perf_counter()
    actors = [
        BSPWorker.options(num_cpus=cpu_frac).remote(
            w, W, owned_by_w[w], P, mode, N, damping, owner_map, teleport_fn,
            normalize, apply_fn, msg_fn, edge_shift_fn, multi_returns,
            msg_edge_weights, msg_edge_min,
        )
        for w in range(W)
    ]
    try:
        start_iter = 0
        dangling = 0.0
        phase_secs = {"pool_submit": time.perf_counter() - t_pool0}
        t_init0 = time.perf_counter()
        last = find_last_complete(ckpt)
        if resume and last >= 0:
            with open(_manifest_path(ckpt, last)) as f:
                m = json.load(f)
            start_iter = last
            dangling = m.get("dangling", 0.0)  # float, or list for vector fields
            prev = m.get("metrics") or {}
            if last > 0 and (
                (mode == "sum" and tol > 0 and prev.get("delta_inf", np.inf) < tol)
                or (mode in ("min", "max") and prev.get("changed", 1) == 0)
            ):
                # already converged — nothing to recompute
                return {
                    "iterations": last,
                    "converged": True,
                    "final_iter_dir": _iter_dir(ckpt, last),
                    "history": [prev],
                    "n_vertices": N,
                    "n_edges": E,
                    "phase_secs": {},
                }
            ray.get([a.load_state.remote(_iter_dir(ckpt, last)) for a in actors])
        else:
            iter0 = _iter_dir(ckpt, 0)
            parts_d = [
                np.asarray(d) for d in ray.get([a.init_state.remote(init_fn, iter0) for a in actors])
            ]
            tot = sum(parts_d)
            dangling = tot.tolist() if np.ndim(tot) else float(tot)
            _write_manifest(
                ckpt,
                0,
                {"iter": 0, "mode": mode, "dangling": dangling, "parts": parts, "metrics": {}},
            )

        phase_secs["init"] = time.perf_counter() - t_init0
        history: list[dict] = []
        k = start_iter
        last_written = start_iter
        while k < max_iters:
            k += 1
            t0 = time.perf_counter()
            do_ckpt = ckpt_every <= 1 or k % ckpt_every == 0 or k >= max_iters
            iter_dir = _iter_dir(ckpt, k) if do_ckpt else None
            if multi_returns:
                per_worker = [
                    a.scatter_multi.options(num_returns=W).remote() for a in actors
                ]
                metric_refs = [
                    actors[w].combine.remote(
                        k, iter_dir, dangling, *[pw[w] for pw in per_worker]
                    )
                    for w in range(W)
                ]
            else:
                scatter_refs = [a.scatter.remote() for a in actors]
                metric_refs = [
                    a.combine.remote(k, iter_dir, dangling, *scatter_refs) for a in actors
                ]
            rows = [m for ms in ray.get(metric_refs) for m in ms]
            seconds = time.perf_counter() - t0
            delta_inf = max((r["delta_inf"] for r in rows), default=0.0)
            changed = int(sum(r["changed"] for r in rows))
            dn = sum(np.asarray(r["dangling_next"]) for r in rows)
            dangling = dn.tolist() if np.ndim(dn) else float(dn)
            metrics = {
                "iter": k,
                "seconds": seconds,
                "delta_inf": delta_inf,
                "l1": float(sum(r["l1"] for r in rows)),
                "changed": changed,
                "edges": E,
                "edges_per_sec": E / seconds if seconds > 0 else 0.0,
                "dangling": dangling,
                "msg_bytes": int(sum(r.get("msg_bytes", 0) for r in rows)),
            }
            history.append(metrics)
            if do_ckpt:
                _write_manifest(
                    ckpt,
                    k,
                    {
                        "iter": k,
                        "mode": mode,
                        "dangling": dangling,
                        "parts": sorted(int(r["part"]) for r in rows),
                        "metrics": metrics,
                    },
                )
                last_written = k
            if (mode == "sum" and tol > 0 and delta_inf < tol) or (
                mode in ("min", "max") and changed == 0
            ):
                if not do_ckpt:
                    # flush the final (converged) state so
                    # final_iter_dir always exists
                    ray.get([a.flush_state.remote(_iter_dir(ckpt, k)) for a in actors])
                    _write_manifest(
                        ckpt,
                        k,
                        {
                            "iter": k,
                            "mode": mode,
                            "dangling": dangling,
                            "parts": sorted(int(r["part"]) for r in rows),
                            "metrics": metrics,
                        },
                    )
                    last_written = k
                break
    finally:
        for a in actors:
            ray.kill(a)  # release the pool's CPU reservations for Dataset stages

    return {
        "iterations": k,
        "phase_secs": phase_secs,
        "converged": (
            (history[-1]["delta_inf"] < tol if mode == "sum" else history[-1]["changed"] == 0)
            if history
            else True
        ),
        "final_iter_dir": _iter_dir(ckpt, last_written if ckpt_every > 1 else k),
        "history": history,
        "n_vertices": N,
        "n_edges": E,
    }


def state_vertex_dataset(graph: ShardedGraph, iter_dir: str, value_name: str):
    """Checkpointed per-partition state → plain (vid, <value_name>) Dataset."""
    refs = graph.refs

    def _explode(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        widths = (
            batch.column("width").to_numpy(zero_copy_only=False)
            if "width" in batch.schema.names
            else np.zeros(len(parts), dtype=np.int64)
        )
        values = list_rows(batch, "value")
        vid_out, val_out = [], []
        # width 0 = scalar state; width >= 1 = 2-D [n, width] vector field
        # (so d=1 fields keep the documented list<float64>[d] output schema)
        width = int(widths[0]) if len(widths) else 0
        for p, v, w in zip(parts, values, widths):
            csr = ray.get(refs[int(p)])
            vid_out.append(csr["vids"])
            val_out.append(v.reshape(-1, int(w)) if int(w) >= 1 else v)
        vids = np.concatenate(vid_out) if vid_out else np.empty(0, dtype=np.uint64)
        if width >= 1:
            mat = np.concatenate(val_out) if val_out else np.empty((0, width))
            val_arr = list_array(list(mat), np.float64, pa.float64())
        else:
            val_arr = pa.array(np.concatenate(val_out) if val_out else np.empty(0))
        return pa.table({"vid": pa.array(vids, type=_U64), value_name: val_arr})

    return rd.read_parquet(iter_dir).map_batches(_explode, batch_format="pyarrow")
