"""Flagship link-graph job — the `ray job submit` entry point.

    ray job submit --working-dir . -- python jobs/flagship.py \
        --pages /data/pages --out /data/out --ckpt /data/ckpt \
        [--resume] [--damping 0.85] [--tol 1e-6] [--partitions 256]

Reads the Common-Crawl-style pages parquet (url, warc_ts, html, text,
lang), builds the link graph, runs PageRank to convergence, connected
components and per-vertex triangles, and writes partitioned parquet
outputs. Every PageRank superstep checkpoints under --ckpt; rerunning
with --resume continues from the last completed iteration.

On the sandbox (single node) this runs with the preset RAY_ADDRESS=local;
on a real cluster the same script submits unchanged — the engine sizes
its worker pool from the granted CPUs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="pages parquet dir")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--ckpt", required=True, help="checkpoint root")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--skip-triangles", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.components import connected_components
    from efficient_graph_algorithms_ray.pipelines.graph_build import (
        build_graph,
        edges_from_parsed,
    )
    from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
    from efficient_graph_algorithms_ray.pipelines.triangles import triangle_count
    from efficient_graph_algorithms_ray.stages.extract import parse_pages

    cfg = EngineConfig(num_partitions=args.partitions)
    t0 = time.time()
    # prune at the read: the parse stage uses only url+html, so the large
    # text/lang/warc_ts columns never leave storage
    pages = rd.read_parquet(args.pages, columns=["url", "html"])
    edges = edges_from_parsed(parse_pages(pages, batch_size=cfg.parse_batch_size)).materialize()
    g = build_graph(edges, cfg, directed=True)
    build_s = time.time() - t0

    t0 = time.time()
    ranks, pr = pagerank(
        g,
        os.path.join(args.ckpt, "pagerank"),
        damping=args.damping,
        tol=args.tol,
        max_iters=args.max_iters,
        resume=args.resume,
    )
    ranks.write_parquet(os.path.join(args.out, "pagerank"))
    pr_s = time.time() - t0

    t0 = time.time()
    gu = build_graph(edges, cfg, directed=False)
    comp, cc = connected_components(
        gu, os.path.join(args.ckpt, "components"), resume=args.resume
    )
    comp.write_parquet(os.path.join(args.out, "components"))
    cc_s = time.time() - t0

    tri_s = None
    if not args.skip_triangles:
        t0 = time.time()
        triangle_count(gu).write_parquet(os.path.join(args.out, "triangles"))
        tri_s = time.time() - t0

    report = {
        "n_vertices": g.n_vertices,
        "n_edges": g.n_edges,
        "build_sec": round(build_s, 2),
        "pagerank": {
            "iterations": pr["iterations"],
            "converged": pr["converged"],
            "sec": round(pr_s, 2),
            "edges_per_sec_per_superstep": round(
                g.n_edges / min(h["seconds"] for h in pr["history"]), 1
            )
            if pr["history"]
            else None,
        },
        "components": {"rounds": cc["iterations"], "sec": round(cc_s, 2)},
        "triangles_sec": round(tri_s, 2) if tri_s is not None else None,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
