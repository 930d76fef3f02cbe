"""Session-scoped Ray for the whole test run (driver instruction)."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages():
    """Deterministic 400-page fixture table (pages schema)."""
    from efficient_graph_algorithms_ray.sources.pages import pages_table

    return pages_table(400)


@pytest.fixture(scope="session")
def tiny_edges(tiny_pages):
    """Deduped-at-oracle edge arrays + the raw engine edge table."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.pipelines.graph_build import edges_from_parsed
    from efficient_graph_algorithms_ray.stages.extract import parse_pages

    edges = edges_from_parsed(parse_pages(rd.from_arrow(tiny_pages), batch_size=64))
    etbl = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = etbl.column("src").to_numpy().astype(np.uint64)
    dst = etbl.column("dst").to_numpy().astype(np.uint64)
    return src, dst
