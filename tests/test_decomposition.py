"""Random-shift low-diameter decomposition vs a dense Bellman-Ford
replica (identical integer arithmetic) + structural invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.decomposition import (
    CAP,
    SCALE,
    low_diameter_decomposition,
    shift_quanta,
)
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _random_graph(n=120, p=0.06, seed=13):
    names = [f"v{i}" for i in range(n)]
    vids = hash_to_vid(names)
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < p
    src, dst = vids[iu[keep]], vids[ju[keep]]
    ds = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    return g, src, dst


def _dense_fixpoint(vid_arr, own_id, nbrs, beta, seed):
    """Dense replica of the same encoded min-propagation."""
    step = np.uint64(SCALE) << np.uint64(32)
    key0 = CAP - shift_quanta(vid_arr, beta, seed)
    enc = (key0 << np.uint64(32)) | own_id.astype(np.uint64)
    while True:
        msg = enc + step
        new = enc.copy()
        for u, vs in nbrs.items():
            if len(vs):
                new[u] = min(new[u], msg[vs].min())
        if (new == enc).all():
            return enc
        enc = new


def test_ldd_matches_dense_replica(tmp_path):
    g, src, dst = _random_graph()
    beta, seed = 0.4, 99
    out, summary = low_diameter_decomposition(
        g, str(tmp_path / "ldd"), beta=beta, seed=seed
    )
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)

    vid_arr = df["vid"].to_numpy().astype(np.uint64)
    own = df["own_id"].to_numpy()
    pos = {v: i for i, v in enumerate(vid_arr)}
    nbrs = {i: [] for i in range(len(vid_arr))}
    for s, d in zip(src, dst):
        si, di = pos[s], pos[d]
        nbrs[si].append(di)
        nbrs[di].append(si)
    nbrs = {u: np.array(vs, dtype=np.int64) for u, vs in nbrs.items()}

    enc = _dense_fixpoint(vid_arr, own, nbrs, beta, seed)
    assert (df["cluster"].to_numpy() == (enc & np.uint64(0xFFFFFFFF)).astype(np.int64)).all()
    assert (df["keyhi"].to_numpy() == (enc >> np.uint64(32)).astype(np.int64)).all()
    assert summary["converged"]


def test_ldd_structural_invariants(tmp_path):
    g, src, dst = _random_graph(n=150, p=0.05, seed=21)
    beta, seed = 0.3, 7
    out, summary = low_diameter_decomposition(
        g, str(tmp_path / "ldd2"), beta=beta, seed=seed
    )
    df = out.to_pandas()

    # every vertex is assigned, and every cluster id is a real center
    assert df["cluster"].notna().all()
    centers = df[df["is_center"]]
    assert set(df["cluster"]) <= set(centers["own_id"])

    # radius invariant: hops·SCALE ≤ shift_q(center) for every vertex
    cvid = centers.set_index("own_id")["vid"]
    center_vids = df["cluster"].map(cvid).to_numpy().astype(np.uint64)
    cshift = shift_quanta(center_vids, beta, seed).astype(np.int64)
    key0_center = (int(CAP) - cshift).astype(np.int64)
    hops_q = df["keyhi"].to_numpy() - key0_center
    assert (hops_q >= 0).all()
    assert (hops_q <= cshift).all()

    # determinism: a rerun is bit-identical
    out2, _ = low_diameter_decomposition(g, str(tmp_path / "ldd3"), beta=beta, seed=seed)
    df2 = out2.to_pandas()
    a = df.sort_values("vid").reset_index(drop=True)
    b = df2.sort_values("vid").reset_index(drop=True)
    assert a.equals(b)


def test_cluster_slice_fanout_invariance(tmp_path):
    """Outputs of the sliced-cluster pipelines are fan-out independent:
    every cluster folds entirely inside one bucket, so B only routes.
    Pins B ∈ {16, 64, 256} bit-identical (VERDICT r4 task #4)."""
    from efficient_graph_algorithms_ray.pipelines.decomposition import (
        _slice_fanout,
        cluster_distance_slices,
        cluster_sliced_integrate,
    )

    g, _, _ = _random_graph(n=140, p=0.05, seed=5)
    ref_slices = ref_integ = None
    for i, b in enumerate((16, 64, 256)):
        s = (
            cluster_distance_slices(
                g, str(tmp_path / f"cs{b}"), beta=0.4, seed=11, fanout=b
            )
            .to_pandas()
            .sort_values(["cluster", "slice"])
            .reset_index(drop=True)
        )
        v = (
            cluster_sliced_integrate(
                g, str(tmp_path / f"ci{b}"), beta=0.4, seed=11, fanout=b
            )
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
        if i == 0:
            ref_slices, ref_integ = s, v
        else:
            assert s.equals(ref_slices)
            assert v.equals(ref_integ)

    # derived default: scales with shard count / graph size, floor 16
    assert _slice_fanout(g, None) == max(16, 4 * g.num_partitions, g.n_vertices // 100_000)
    assert _slice_fanout(g, 32) == 32


def test_cluster_cross_integrate_matches_dense(tmp_path):
    """cluster_cross_integrate vs a dense double-loop replica of the
    reference cross-term semantics (separator_utils.py:310-332) with
    the SAME per-pair floor-quantization — bit-exact, plus fan-out
    invariance of the distributed route."""
    from efficient_graph_algorithms_ray.pipelines.decomposition import (
        SCALE,
        cluster_cross_integrate,
        low_diameter_decomposition,
    )

    g, _, _ = _random_graph(n=160, p=0.05, seed=3)
    beta, seed, u = 0.4, 17, 1
    out = (
        cluster_cross_integrate(
            g, str(tmp_path / "cx"), beta=beta, seed=seed, unit=u
        )
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )

    # dense replica from the raw LDD assignment
    assign, _ = low_diameter_decomposition(
        g, str(tmp_path / "ldd"), beta=beta, seed=seed
    )
    df = assign.to_pandas()
    clu = df["cluster"].to_numpy().astype(np.int64)
    key = df["keyhi"].to_numpy().astype(np.int64)
    deg = df["deg"].to_numpy().astype(np.int64)
    vid = df["vid"].to_numpy().astype(np.int64)
    kmin = {}
    for c, k in zip(clu, key):
        kmin[c] = min(kmin.get(c, k), k)
    band = np.array([(k - kmin[c]) // SCALE // u for c, k in zip(clu, key)])
    # per-(cluster, band) field sums → per-cluster Hankel scalar K
    F: dict = {}
    for c, b, d in zip(clu, band, deg):
        F[(c, b)] = F.get((c, b), 0) + int(d)
    K: dict = {}
    for (c, b), s in F.items():
        K[c] = K.get(c, 0.0) + s * 2.0 ** -(b * u)
    vals, vids = [], []
    for v, c, b in zip(vid, clu, band):
        acc, seen = 0, False
        for cr, kv in sorted(K.items()):
            if (cr % 2) == (c % 2):
                continue
            seen = True
            shift = 1 + (3 * c + 5 * cr) % 4
            acc += int(np.floor(kv * 1048576.0 / 2.0 ** ((b + shift) * u)))
        if seen:
            vids.append(v)
            vals.append(np.round(acc / 1048576.0, 6))
    ref = (
        __import__("pandas")
        .DataFrame({"vid": vids, "value_r6": vals})
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert out.equals(ref)

    # fan-out invariance for the cross route as well
    out2 = (
        cluster_cross_integrate(
            g, str(tmp_path / "cx2"), beta=beta, seed=seed, unit=u, fanout=256
        )
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert out2.equals(out)
