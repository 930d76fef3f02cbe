"""HITS hubs/authorities vs a dense alternating-matvec oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.hits import hits, l2_normalize

HUB_OFF = 0
AUTH_OFF = 1_000_000  # authority-side vid offset (bipartite split)


def _bipartite(rng, n_hub=40, n_auth=25, p=0.15):
    mask = rng.random((n_hub, n_auth)) < p
    mask[0, :3] = True  # guarantee non-empty sides
    hi, ai = np.nonzero(mask)
    src = hi.astype(np.uint64) + HUB_OFF
    dst = ai.astype(np.uint64) + AUTH_OFF
    return src, dst, mask


def _dense_hits(mask, k):
    """Reference recurrence: a_t = Bᵀ h_{t-1}, h_t = B a_t, h0 = 1."""
    B = mask.astype(np.float64)
    h = np.ones(B.shape[0])
    a = None
    for _ in range(k):
        a = B.T @ h
        h = B @ a
    a_next = B.T @ h
    return h, a_next


def _engine_hits(tmp_path, src, dst, k, P=6):
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=P), directed=False)
    hub, auth, summary = hits(g, str(tmp_path / "hits"), k=k)
    hdf = hub.to_pandas().sort_values("vid").reset_index(drop=True)
    adf = auth.to_pandas().sort_values("vid").reset_index(drop=True)
    return hdf, adf, summary


def test_hits_matches_dense_oracle(tmp_path):
    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    src, dst, mask = _bipartite(rng)
    for k in (1, 2):
        hdf, adf, _ = _engine_hits(tmp_path, src, dst, k)
        h_ref, a_ref = _dense_hits(mask, k)
        hub_side = hdf[hdf["vid"] < AUTH_OFF]
        auth_side = adf[adf["vid"] >= AUTH_OFF]
        # engine vertex set = edge endpoints; restrict the oracle to them
        hub_ids = hub_side["vid"].to_numpy().astype(np.int64)
        auth_ids = auth_side["vid"].to_numpy().astype(np.int64) - AUTH_OFF
        assert np.allclose(hub_side["hub"].to_numpy(), h_ref[hub_ids], rtol=0, atol=1e-9)
        assert np.allclose(auth_side["auth"].to_numpy(), a_ref[auth_ids], rtol=0, atol=1e-9)


def _dense_salsa(mask, k):
    """Degree-normalized alternating walk, x0 = 1 on the authority
    side: h read at superstep 2k-1, a at superstep 2k."""
    B = mask.astype(np.float64)
    n_hub, n_auth = B.shape
    A = np.zeros((n_hub + n_auth, n_hub + n_auth))
    A[:n_hub, n_hub:] = B
    A[n_hub:, :n_hub] = B.T
    deg = A.sum(axis=1)
    x = np.concatenate([np.zeros(n_hub), np.ones(n_auth)])
    h = None
    for t in range(1, 2 * k + 1):
        x = A.T @ np.divide(x, deg, out=np.zeros_like(x), where=deg > 0)
        if t == 2 * k - 1:
            h = x[:n_hub].copy()
    return h, x[n_hub:]


def test_salsa_matches_dense_oracle(tmp_path):
    from efficient_graph_algorithms_ray.pipelines.hits import salsa

    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    src, dst, mask = _bipartite(rng)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=6), directed=False)
    for k in (1, 2):
        hub, auth, _ = salsa(
            g,
            str(tmp_path / f"salsa{k}"),
            k=k,
            auth_pred=lambda v: v >= np.uint64(AUTH_OFF),
        )
        hdf = hub.to_pandas().sort_values("vid").reset_index(drop=True)
        adf = auth.to_pandas().sort_values("vid").reset_index(drop=True)
        h_ref, a_ref = _dense_salsa(mask, k)
        hub_side = hdf[hdf["vid"] < AUTH_OFF]
        auth_side = adf[adf["vid"] >= AUTH_OFF]
        hub_ids = hub_side["vid"].to_numpy().astype(np.int64)
        auth_ids = auth_side["vid"].to_numpy().astype(np.int64) - AUTH_OFF
        assert np.allclose(hub_side["hub"].to_numpy(), h_ref[hub_ids], rtol=0, atol=1e-12)
        assert np.allclose(auth_side["auth"].to_numpy(), a_ref[auth_ids], rtol=0, atol=1e-12)
        # bipartite chain: at even supersteps all mass sits on the auth side
        assert abs(adf[adf["vid"] < AUTH_OFF]["auth"].sum()) < 1e-12


def test_hits_l2_normalize(tmp_path):
    rng = np.random.Generator(np.random.Philox(key=[9, 0]))
    src, dst, _ = _bipartite(rng, n_hub=20, n_auth=12)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    hub, auth, _ = hits(g, str(tmp_path / "h2"), k=1)
    normed = l2_normalize(hub, "hub").to_pandas()
    assert abs(np.square(normed["hub"].to_numpy()).sum() - 1.0) < 1e-9
