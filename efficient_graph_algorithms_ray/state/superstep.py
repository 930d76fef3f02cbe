"""The superstep kernel: gather-scatter + groupby-aggregate shuffle.

Engine equivalent of the reference's abstract integrator contract
``GFIntegrator.integrate_graph_field(field) -> field`` (/root/
reference/src/ega/algorithms/gf_integrator.py:3-37): one superstep is
one distributed matvec over the partitioned graph. Two combine
monoids cover the north-star algorithms:

- mode='sum'  → PageRank power iteration (damped random walk with
  restart, /root/reference/src/ega/algorithms/graph_kernels.py:72-79)
- mode='min'  → connected components / label propagation (min-label
  hash propagation; BFS-coloring semantics per
  /root/reference/src/planar_separators/lipton_tarjan/utils.py:62-76)

Dataflow per superstep (ONE all-to-all exchange):

  state(iter k-1) parquet  ──read──►  Dataset[(part, value: list)]
    ──map_batches(scatter)──►  messages [(part→dst_part, dsts, partials)]
    ──groupby(dst_part).map_groups(combine)──►  metrics rows (tiny)
                  └── combine writes state(iter k) part file atomically

Skew handling: scatter pre-aggregates messages *per source partition*
(vectorized sort+reduceat per destination), so a hub vertex receives
at most P partial rows no matter its in-degree — the salted two-level
aggregation is built into the dataflow rather than bolted on. Hub
*sources* are handled vectorized by ``np.repeat`` over CSR rows.

Checkpointing: state for iteration k lives at
``{ckpt}/iter_{k:05d}/part_*.parquet`` (atomic tmp+rename per
partition) with a sibling ``iter_{k:05d}.json`` manifest holding
per-partition lineage + metrics. Resume scans for the last manifest
and continues — re-running a partially-written iteration is
idempotent because combine output is deterministic.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import UNLABELED
from ..util import flatten_list_column, group_reduce, list_array, list_rows
from .graph import ShardedGraph

_F64 = pa.float64()
_U64 = pa.uint64()


def _iter_dir(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"iter_{k:05d}")


def _manifest_path(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"iter_{k:05d}.json")


def _part_file(iter_dir: str, p: int) -> str:
    return os.path.join(iter_dir, f"part_{p:05d}.parquet")


def _write_state_part(iter_dir: str, p: int, value: np.ndarray, arrow_type) -> None:
    os.makedirs(iter_dir, exist_ok=True)
    tbl = pa.table(
        {
            "part": pa.array([p], type=pa.int64()),
            "value": list_array([value], value.dtype, arrow_type),
        }
    )
    tmp = os.path.join(iter_dir, f".part_{p:05d}.tmp.parquet")
    pq.write_table(tbl, tmp)
    os.replace(tmp, _part_file(iter_dir, p))


def _read_state_part(iter_dir: str, p: int) -> np.ndarray:
    tbl = pq.read_table(_part_file(iter_dir, p))
    return list_rows(tbl, "value")[0]


def find_last_complete(ckpt: str) -> int:
    """Highest iteration with a manifest, or -1."""
    last = -1
    if not os.path.isdir(ckpt):
        return last
    for name in os.listdir(ckpt):
        if name.startswith("iter_") and name.endswith(".json"):
            last = max(last, int(name[5:10]))
    return last


# --------------------------------------------------------------------------
# scatter
# --------------------------------------------------------------------------

def make_scatter(graph: ShardedGraph, mode: str):
    refs = graph.refs
    P = graph.num_partitions
    value_type = _F64 if mode == "sum" else _U64
    np_dtype = np.float64 if mode == "sum" else np.uint64

    def scatter(batch: pa.Table) -> pa.Table:
        out_parts: list[int] = []
        out_dsts: list[np.ndarray] = []
        out_partials: list[np.ndarray] = []
        part_col = batch.column("part").to_numpy(zero_copy_only=False)
        value_rows = list_rows(batch, "value")
        for p, value in zip(part_col, value_rows):
            p = int(p)
            csr = ray.get(refs[p])
            deg = csr["deg"]
            dst = csr["indices"]
            if mode == "sum":
                contrib = np.divide(
                    value, deg, out=np.zeros_like(value, dtype=np.float64), where=deg > 0
                )
                partials = np.repeat(contrib, deg)
            else:
                # don't ship the UNLABELED sentinel — it's the monoid identity
                labeled = value != UNLABELED
                eff_deg = np.where(labeled, deg, 0)
                partials = np.repeat(value, eff_deg)
                dst = csr["indices"][np.repeat(labeled, deg)]
            dpart = (dst % np.uint64(P)).astype(np.int64)
            order = np.argsort(dpart, kind="stable")
            dpart_s, dst_s, par_s = dpart[order], dst[order], partials[order]
            if len(dpart_s):
                bounds = np.flatnonzero(
                    np.concatenate(([True], dpart_s[1:] != dpart_s[:-1]))
                )
                ends = np.append(bounds[1:], len(dpart_s))
            else:
                bounds = ends = np.empty(0, dtype=np.int64)
            for b, e in zip(bounds, ends):
                uk, red = group_reduce(
                    dst_s[b:e], par_s[b:e], "sum" if mode == "sum" else "min"
                )
                out_parts.append(int(dpart_s[b]))
                out_dsts.append(uk)
                out_partials.append(red)
            # presence row → every partition always forms a combine group
            out_parts.append(p)
            out_dsts.append(np.empty(0, dtype=np.uint64))
            out_partials.append(np.empty(0, dtype=np_dtype))
        return pa.table(
            {
                "part": pa.array(out_parts, type=pa.int64()),
                "dsts": list_array(out_dsts, np.uint64, _U64),
                "partials": list_array(out_partials, np_dtype, value_type),
            }
        )

    return scatter


# --------------------------------------------------------------------------
# combine
# --------------------------------------------------------------------------

def make_combine(
    graph: ShardedGraph,
    mode: str,
    iter_dir: str,
    prev_dir: str,
    *,
    damping: float = 0.85,
    total_n: int = 0,
    dangling_mass: float = 0.0,
):
    refs = graph.refs

    def combine(group: pa.Table) -> pa.Table:
        p = int(group.column("part")[0].as_py())
        csr = ray.get(refs[p])
        vids = csr["vids"]
        deg = csr["deg"]
        n = len(vids)
        dsts = flatten_list_column(group, "dsts").astype(np.uint64, copy=False)
        old = _read_state_part(prev_dir, p)
        if mode == "sum":
            partials = flatten_list_column(group, "partials").astype(np.float64, copy=False)
            idx = np.searchsorted(vids, dsts)
            agg = np.bincount(idx, weights=partials, minlength=n) if len(idx) else np.zeros(n)
            new = (1.0 - damping) / total_n + damping * (agg + dangling_mass / total_n)
            delta = np.abs(new - old)
            delta_inf = float(delta.max()) if n else 0.0
            l1 = float(delta.sum())
            changed = int((delta > 0).sum())
            dangling_next = float(new[deg == 0].sum())
            _write_state_part(iter_dir, p, new, _F64)
        else:
            partials = flatten_list_column(group, "partials").astype(np.uint64, copy=False)
            idx = np.searchsorted(vids, dsts)
            agg = np.full(n, UNLABELED, dtype=np.uint64)
            if len(idx):
                uk, red = group_reduce(idx, partials, "min")
                agg[uk] = red
            new = np.minimum(old, agg)
            changed = int((new != old).sum())
            delta_inf = float(changed)
            l1 = float(changed)
            dangling_next = 0.0
            _write_state_part(iter_dir, p, new, _U64)
        return pa.table(
            {
                "part": pa.array([p], type=pa.int64()),
                "n": pa.array([n], type=pa.int64()),
                "delta_inf": pa.array([delta_inf], type=pa.float64()),
                "l1": pa.array([l1], type=pa.float64()),
                "changed": pa.array([changed], type=pa.int64()),
                "dangling_next": pa.array([dangling_next], type=pa.float64()),
            }
        )

    return combine


# --------------------------------------------------------------------------
# driver loop
# --------------------------------------------------------------------------

def init_state(graph: ShardedGraph, ckpt: str, mode: str, init_fn) -> dict:
    """Write iteration-0 state part files (distributed) and return metrics.

    init_fn(csr_dict) -> np.ndarray value vector aligned with csr['vids'].
    """
    refs = graph.refs
    iter0 = _iter_dir(ckpt, 0)
    arrow_type = _F64 if mode == "sum" else _U64

    def _init(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        out = {"part": [], "dangling": []}
        for p in parts:
            p = int(p)
            csr = ray.get(refs[p])
            value = init_fn(csr)
            _write_state_part(iter0, p, value, arrow_type)
            dang = float(value[csr["deg"] == 0].sum()) if mode == "sum" else 0.0
            out["part"].append(p)
            out["dangling"].append(dang)
        return pa.table(
            {
                "part": pa.array(out["part"], type=pa.int64()),
                "dangling": pa.array(out["dangling"], type=pa.float64()),
            }
        )

    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))
    rows = parts_ds.map_batches(_init, batch_format="pyarrow", batch_size=1).take_all()
    dangling = float(sum(r["dangling"] for r in rows))
    manifest = {
        "iter": 0,
        "mode": mode,
        "dangling": dangling,
        "parts": sorted(int(r["part"]) for r in rows),
        "metrics": {},
    }
    with open(_manifest_path(ckpt, 0), "w") as f:
        json.dump(manifest, f)
    return manifest


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
) -> dict:
    """Drive supersteps to convergence; returns the run summary dict.

    Convergence: mode='sum' → L∞ delta < tol; mode='min' → zero label
    changes. ``tol=0`` with a finite max_iters runs exactly max_iters
    iterations (used for SQL-oracle-matching fixed-k runs).
    """
    import shutil

    if not resume:
        shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(ckpt, exist_ok=True)
    start_iter = 0
    dangling = 0.0
    last = find_last_complete(ckpt)
    if resume and last >= 0:
        with open(_manifest_path(ckpt, last)) as f:
            m = json.load(f)
        start_iter = last
        dangling = float(m.get("dangling", 0.0))
    else:
        m0 = init_state(graph, ckpt, mode, init_fn)
        dangling = m0["dangling"]

    N = graph.n_vertices
    E = graph.n_edges
    history: list[dict] = []
    k = start_iter
    while k < max_iters:
        k += 1
        t0 = time.perf_counter()
        prev_dir, iter_dir = _iter_dir(ckpt, k - 1), _iter_dir(ckpt, k)
        state = rd.read_parquet(prev_dir)
        msgs = state.map_batches(make_scatter(graph, mode), batch_format="pyarrow")
        combine = make_combine(
            graph, mode, iter_dir, prev_dir,
            damping=damping, total_n=N, dangling_mass=dangling,
        )
        rows = msgs.groupby("part").map_groups(combine, batch_format="pyarrow").take_all()
        seconds = time.perf_counter() - t0
        delta_inf = max((r["delta_inf"] for r in rows), default=0.0)
        changed = int(sum(r["changed"] for r in rows))
        dangling = float(sum(r["dangling_next"] for r in rows))
        metrics = {
            "iter": k,
            "seconds": seconds,
            "delta_inf": delta_inf,
            "l1": float(sum(r["l1"] for r in rows)),
            "changed": changed,
            "edges": E,
            "edges_per_sec": E / seconds if seconds > 0 else 0.0,
            "dangling": dangling,
        }
        history.append(metrics)
        with open(_manifest_path(ckpt, k), "w") as f:
            json.dump(
                {
                    "iter": k,
                    "mode": mode,
                    "dangling": dangling,
                    "parts": sorted(int(r["part"]) for r in rows),
                    "metrics": metrics,
                },
                f,
            )
        converged = (delta_inf < tol) if mode == "sum" else (changed == 0)
        if converged and tol > 0:
            break
        if mode == "min" and changed == 0:
            break
    return {
        "iterations": k,
        "converged": (history[-1]["delta_inf"] < tol if mode == "sum" else history[-1]["changed"] == 0)
        if history
        else True,
        "final_iter_dir": _iter_dir(ckpt, k),
        "history": history,
        "n_vertices": N,
        "n_edges": E,
    }


def state_vertex_dataset(graph: ShardedGraph, iter_dir: str, value_name: str):
    """Final per-partition state → plain (vid, <value_name>) Dataset."""
    refs = graph.refs

    def _explode(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        values = list_rows(batch, "value")
        vid_out, val_out = [], []
        for p, v in zip(parts, values):
            csr = ray.get(refs[int(p)])
            vid_out.append(csr["vids"])
            val_out.append(v)
        vids = np.concatenate(vid_out) if vid_out else np.empty(0, dtype=np.uint64)
        vals = np.concatenate(val_out) if val_out else np.empty(0)
        return pa.table({"vid": pa.array(vids, type=_U64), value_name: pa.array(vals)})

    return rd.read_parquet(iter_dir).map_batches(_explode, batch_format="pyarrow")
