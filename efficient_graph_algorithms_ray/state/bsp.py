"""BSP actor pool — the superstep execution engine.

One ``BSPWorker`` actor per CPU (W = cluster CPUs, capped by P); each
worker *owns* ceil(P/W) CSR partitions, so the data partitioning P
stays a property of the layout (stable shards, stable checkpoints)
while W tracks the cluster size — exactly how a fixed-size multi-node
cluster would run it, and what makes the N-vs-4N scaling measurement
honest (worker count == granted CPUs; tasks never oversubscribe).

Why actors instead of per-superstep tasks: the message *structure* of
a superstep is static — which destinations each partition talks to is
a function of the graph only; only the float/label values change.
Workers therefore precompute, once at startup:

- the fused gather index (edge src row ∘ permutation grouping edges
  by (dst_worker, dst)) so one ``np.take`` + one ``reduceat`` replaces
  a per-iteration O(E log E) argsort;
- per-destination-worker segment slices;
and cache, on first receipt, the ``searchsorted`` scatter indices of
every (src_worker → partition) message block. Per-superstep work
drops to two vectorized passes over E plus 2W actor calls.

Reference analogue for heavy per-worker init reused across
iterations: the Cholesky pre-factorization in ``get_mesh_data``
(/root/reference/src/ega/util/get_mesh_data.py:77-98).

Messages remain pre-aggregated per (src worker, dst) — a hub vertex
receives ≤ W partial values per superstep regardless of in-degree
(built-in two-level/salted aggregation).
"""

from __future__ import annotations

import numpy as np
import ray

from ..config import UNLABELED


def make_owner_map(parts: list[int], num_partitions: int, W: int) -> np.ndarray:
    """part id → worker id (−1 for parts with no shard)."""
    wmap = np.full(num_partitions, -1, dtype=np.int64)
    for i, p in enumerate(sorted(parts)):
        wmap[p] = i % W
    return wmap


@ray.remote
class BSPWorker:
    def __init__(
        self,
        worker_id: int,
        W: int,
        owned: list[tuple[int, "ray.ObjectRef"]],
        num_partitions: int,
        mode: str,
        total_n: int,
        damping: float,
        owner_map: np.ndarray,
        teleport_fn=None,
        normalize: bool = True,
        apply_fn=None,
        msg_fn=None,
        edge_shift_fn=None,
        multi_returns: bool = False,
        msg_edge_weights: bool = False,
        msg_edge_min: bool = False,
    ) -> None:
        self.w = worker_id
        self.W = W
        # multi_returns: combine receives ITS OWN W incoming blocks
        # directly (per-destination objects) instead of W fused
        # all-destination objects to slice
        self.multi = multi_returns
        self.P = num_partitions
        self.mode = mode
        self.N = total_n
        self.damping = damping
        self.parts = [p for p, _ in owned]
        # normalize=True → random-walk matvec (P = A·D⁻¹); False → raw A·x
        # (diffusion / heat-kernel / common-neighbor machinery).
        self.normalize = normalize
        # apply_fn(agg, old, T, dangling_mass, csr) -> new state: custom
        # update rule (pluggable superstep UDF — the engine's
        # user-extension surface, mirroring the reference's abstract
        # GFIntegrator contract). None → damped-walk update.
        self.apply_fn = apply_fn
        # apply_fn may opt in to the 1-based superstep index by
        # declaring an ``it`` keyword (e.g. Katz's per-iteration α^j
        # Horner constant); detected once here, not per superstep.
        import inspect

        self._apply_takes_it = bool(apply_fn) and "it" in inspect.signature(
            apply_fn
        ).parameters
        # msg_fn(value, csr) -> per-vertex message values: transforms
        # state before the gather. min mode: e.g. the +1-hop encoded
        # distance increment of the random-shift decomposition (None →
        # forward the label unchanged, connected components). sum mode:
        # replaces the contribution entirely (e.g. readiness-gated
        # tree-DP sends).
        self.msg_fn = msg_fn
        # msg_edge_weights: explicit opt-in for sum-mode msg_fn pipelines
        # whose per-vertex message should STILL be scaled by the per-edge
        # weight in the scatter (e.g. DSD's walk power on a weighted
        # graph: msg = state/wdeg, scatter × w(u,v) → row-stochastic P).
        # Default False: msg_fn replaces the contribution entirely
        # (one-hot histograms / readiness gates must not weight-scale).
        self.msg_edge_weights = msg_edge_weights
        # msg_edge_min: max-mode opt-in — clamp each per-edge message to
        # the edge weight (vals = min(msg, w)) before the max-reduce.
        # Turns the max monoid into the max-min (bottleneck/widest-path)
        # semiring; identity stays 0 (min(0, w) = 0 — unreached state
        # never propagates).
        self.msg_edge_min = msg_edge_min
        self.csrs = {p: ray.get(r) for p, r in owned}  # zero-copy plasma views
        self.values: dict[int, np.ndarray] = {}
        # teleport distribution per partition (sum mode): uniform 1/N by
        # default; a teleport_fn(csr) -> array enables personalized /
        # seeded PageRank (reference: get_projection seed-set scoring,
        # graph_kernels.py:387-519) and pure k-step walks (zeros).
        self.teleport: dict[int, np.ndarray] = {}
        if mode == "sum":
            for p, csr in self.csrs.items():
                if teleport_fn is None:
                    self.teleport[p] = np.full(len(csr["vids"]), 1.0 / total_n)
                else:
                    self.teleport[p] = np.asarray(teleport_fn(csr), dtype=np.float64)
        self._idx_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        # --- static scatter structures, one pass per owned partition ---
        self._sc: dict[int, dict] = {}
        for p, csr in self.csrs.items():
            deg = csr["deg"]
            dst = csr["indices"]
            n = len(csr["vids"])
            edge_src_row = np.repeat(np.arange(n, dtype=np.int64), deg)
            dw = owner_map[(dst % np.uint64(self.P)).astype(np.int64)]
            perm = np.lexsort((dst, dw))
            dst_s, dw_s = dst[perm], dw[perm]
            if len(dst_s):
                seg_starts = np.flatnonzero(
                    np.concatenate(([True], (dst_s[1:] != dst_s[:-1]) | (dw_s[1:] != dw_s[:-1])))
                )
            else:
                seg_starts = np.empty(0, dtype=np.int64)
            seg_dst = dst_s[seg_starts]
            seg_dw = dw_s[seg_starts]
            w_bounds = np.searchsorted(seg_dw, np.arange(W + 1))
            self._sc[p] = {
                # int32 halves the per-edge index stream (partition rows
                # are < 2^31 by the dense-id contract) — measured +17%
                # on the DRAM-bound gather at 32 workers
                "gather": edge_src_row[perm].astype(np.int32),
                "seg_starts": seg_starts,
                "seg_dst": seg_dst,
                "w_bounds": w_bounds,
                # per-edge weights in permuted order (weighted graphs only)
                "w_perm": csr["weights"][perm] if "weights" in csr else None,
                # per-width chunk plans, built lazily on first scatter
                "chunks": {},
            }
            # edge_shift_fn(w_perm | None, csr) -> uint64 per-edge addend
            # for min-mode messages (weighted shortest paths: quantized
            # edge length in the encoded key's high bits). Precomputed
            # once — static like the rest of the scatter structure.
            if edge_shift_fn is not None:
                self._sc[p]["edge_shift"] = np.asarray(
                    edge_shift_fn(self._sc[p]["w_perm"], csr), dtype=np.uint64
                )
            else:
                self._sc[p]["edge_shift"] = None

    # ---- state management -------------------------------------------------
    def init_state(self, init_fn, iter0_dir: str) -> float:
        from .ckpt import write_state_part

        dangling = None
        for p, csr in self.csrs.items():
            v = init_fn(csr)
            self.values[p] = v
            write_state_part(iter0_dir, p, v, self.mode)
            if self.mode == "sum":
                norm = csr.get("wdeg", csr["deg"])
                d = v[norm == 0].sum(axis=0)
                dangling = d if dangling is None else dangling + d
        if dangling is None:
            return 0.0
        return dangling.tolist() if np.ndim(dangling) else float(dangling)

    def load_state(self, iter_dir: str) -> bool:
        from .ckpt import read_state_part

        for p in self.parts:
            self.values[p] = read_state_part(iter_dir, p)
        return True

    def get_state(self, p: int) -> np.ndarray:
        return self.values[p]

    # ---- fused chunked gather+reduce --------------------------------------
    _CHUNK_VALS = 65536  # gathered-temp elements per chunk (512 KB f64)

    def _chunk_plan(self, sc, width: int):
        """Chunk boundaries aligned to segment starts (a segment never
        straddles a chunk), sized so the gathered temp stays L2-resident.
        Static per (partition, state width) — computed once, cached."""
        plan = sc["chunks"].get(width)
        if plan is None:
            seg_starts = sc["seg_starts"]
            e = len(sc["gather"])
            ch = max(4096, self._CHUNK_VALS // max(width, 1))
            bounds = [0]
            while bounds[-1] < e:
                j = int(np.searchsorted(seg_starts, bounds[-1] + ch))
                bounds.append(e if j >= len(seg_starts) else int(seg_starts[j]))
            b = np.asarray(bounds, dtype=np.int64)
            plan = (
                b,
                np.searchsorted(seg_starts, b[:-1]),
                np.searchsorted(seg_starts, b[1:]),
            )
            sc["chunks"][width] = plan
        return plan

    def _chunked_reduce(self, sc, contrib, reducer, transform=None):
        """reducer.reduceat over the permuted gather WITHOUT the E-sized
        temp hitting DRAM: the gather+transform+reduce runs chunk by
        chunk (each chunk's vals array is L2-resident). Bit-identical
        to the unchunked form — chunks are segment-aligned and reduceat
        sums left-to-right either way; measured +35-43% on the
        DRAM-bound kernel (the E×8B vals round-trip was a third of the
        streamed bytes). ``transform(vals, lo, hi)`` applies the
        per-edge weight/shift inside the chunk for the same reason."""
        seg_starts = sc["seg_starts"]
        width = contrib.shape[1] if contrib.ndim == 2 else 1
        bounds, slos, shis = self._chunk_plan(sc, width)
        g = sc["gather"]
        shape = (len(seg_starts),) if contrib.ndim == 1 else (
            len(seg_starts), contrib.shape[1],
        )
        out = np.empty(shape, dtype=contrib.dtype)
        for c in range(len(bounds) - 1):
            lo, hi = int(bounds[c]), int(bounds[c + 1])
            vals = contrib[g[lo:hi]]
            if transform is not None:
                vals = transform(vals, lo, hi)
            out[slos[c]:shis[c]] = reducer.reduceat(
                vals, seg_starts[slos[c]:shis[c]] - lo, axis=0
            )
        return out

    # ---- superstep --------------------------------------------------------
    def scatter(self):
        """Returns ONE object holding W blocks (dsts, partials), one per
        destination worker (concatenated over owned partitions; dsts may
        repeat across partitions — combine's accumulation handles it).

        Fused-return rationale: on this single-node target plasma is
        shared memory, so every combine reads its slice zero-copy and
        one object per scatter avoids the W² small-object creation cost
        (measured ~0.2 ms each — the dominant superstep cost at W=32
        with sub-MB blocks). On a multi-node cluster you would flip to
        per-destination returns (``num_returns=W``) so each combine
        fetches only its own block over the network; block sizes at
        cluster scale (≥16 MB) amortize the per-object cost there.
        """
        out_d: list[list[np.ndarray]] = [[] for _ in range(self.W)]
        out_v: list[list[np.ndarray]] = [[] for _ in range(self.W)]
        for p in self.parts:
            csr, sc, value = self.csrs[p], self._sc[p], self.values[p]
            if self.mode == "sum":
                if self.msg_fn is not None:
                    # gated/transformed messages (e.g. readiness-gated
                    # tree-DP accumulation) — replaces the contribution;
                    # normalization is the msg_fn's responsibility.
                    contrib = np.asarray(self.msg_fn(value, csr), dtype=np.float64)
                elif not self.normalize:
                    contrib = value.astype(np.float64, copy=False)
                else:
                    norm = csr.get("wdeg", csr["deg"])  # random-walk normalizer
                    if value.ndim == 2:
                        nz = norm > 0
                        contrib = np.zeros_like(value, dtype=np.float64)
                        contrib[nz] = value[nz] / norm[nz, None]
                    else:
                        contrib = np.divide(
                            value, norm, out=np.zeros_like(value, dtype=np.float64), where=norm > 0
                        )
                # msg_fn replaces the contribution ENTIRELY (documented
                # contract) — per-edge weights must not scale gated sends
                # (one-hot histograms / readiness gates would silently
                # weight-scale on a weighted graph).
                weight = (
                    sc["w_perm"]
                    if sc["w_perm"] is not None
                    and (self.msg_fn is None or self.msg_edge_weights)
                    else None
                )
                tr = None
                if weight is not None:
                    tr = lambda v, lo, hi, w=weight: v * (
                        w[lo:hi, None] if v.ndim == 2 else w[lo:hi]
                    )
                sums = (
                    self._chunked_reduce(sc, contrib, np.add, tr)
                    if len(sc["seg_starts"])
                    else np.empty((0,) + contrib.shape[1:])
                )
            elif self.mode == "max":
                # elementwise-max monoid over non-negative float fields
                # (HLL register propagation / neighborhood sketches);
                # identity = 0, so the state contract is value ≥ 0.
                msg = value if self.msg_fn is None else self.msg_fn(value, csr)
                contrib = np.asarray(msg, dtype=np.float64)
                w_min = sc["w_perm"] if (self.msg_edge_min and sc["w_perm"] is not None) else None
                shift = sc["edge_shift"]

                def tr(v, lo, hi):
                    if w_min is not None:
                        v = np.minimum(
                            v, w_min[lo:hi, None] if v.ndim == 2 else w_min[lo:hi]
                        )
                    if shift is not None:
                        # max-PLUS semiring (longest path / DAG layering):
                        # candidate = msg(u) + shift(u,v); float state, no
                        # saturation (identity 0 is a valid reached level)
                        v = v + (shift[lo:hi, None] if v.ndim == 2 else shift[lo:hi])
                    return v

                sums = (
                    self._chunked_reduce(
                        sc, contrib, np.maximum,
                        tr if (w_min is not None or shift is not None) else None,
                    )
                    if len(sc["seg_starts"])
                    else np.empty((0,) + contrib.shape[1:])
                )
            else:
                msg = value if self.msg_fn is None else self.msg_fn(value, csr)
                contrib = np.asarray(msg)
                shift = sc["edge_shift"]
                tr = None
                if shift is not None:
                    # saturation guard: identity/unreached messages
                    # (≥ 2^62) must not wrap past UNLABELED
                    tr = lambda v, lo, hi: np.where(
                        v >= np.uint64(1 << 62), v, v + shift[lo:hi]
                    )
                sums = (
                    self._chunked_reduce(sc, contrib, np.minimum, tr)
                    if len(sc["seg_starts"])
                    else np.empty(0, dtype=np.uint64)
                )
            wb = sc["w_bounds"]
            for w in range(self.W):
                lo, hi = wb[w], wb[w + 1]
                if hi > lo:
                    out_d[w].append(sc["seg_dst"][lo:hi])
                    out_v[w].append(sums[lo:hi])
        blocks = []
        for w in range(self.W):
            if out_d[w]:
                blocks.append((np.concatenate(out_d[w]), np.concatenate(out_v[w])))
            else:
                blocks.append(None)
        return blocks

    def scatter_multi(self):
        """Multi-node variant of :meth:`scatter`: the same W blocks, but
        returned as W SEPARATE objects (call with
        ``.options(num_returns=W)``) so each destination's ``combine``
        fetches ONLY its own block over the network instead of the whole
        fused object. On one box the fused return wins (measured 2.5× —
        W² sub-MB objects cost more than they save); on a real N→4N
        cluster per-destination blocks are ≥16 MB and this is the
        network-honest exchange. Enabled via
        ``run_supersteps(..., multi_returns=True)`` /
        ``GRAFT_MULTI_RETURNS=1``."""
        blocks = self.scatter()
        return tuple(blocks) if self.W > 1 else blocks[0]

    def combine(self, k: int, iter_dir: str, dangling_mass: float, *scatter_outs):
        """Merge this worker's slice of every scatter output, apply,
        checkpoint; returns per-part metrics."""
        from .ckpt import write_state_part

        blocks = (
            list(scatter_outs) if self.multi else [out[self.w] for out in scatter_outs]
        )
        msg_bytes = int(
            sum(b[0].nbytes + b[1].nbytes for b in blocks if b is not None)
        )  # reported once (on the first owned part) so the driver can sum
        metrics = []
        for p in self.parts:
            csr = self.csrs[p]
            vids, deg = csr["vids"], csr["deg"]
            n = len(vids)
            old = self.values[p]
            is2d = old.ndim == 2
            width = old.shape[1] if is2d else 1
            if self.mode in ("sum", "max"):  # max identity: 0 (value ≥ 0)
                acc = np.zeros((n, width)) if is2d else np.zeros(n)
            else:
                acc = np.full(n, UNLABELED, dtype=np.uint64)
            for v_src, blk in enumerate(blocks):
                if blk is None:
                    continue
                dsts, reds = blk
                key = (v_src, p)
                cached = self._idx_cache.get(key)
                if cached is not None and len(cached[0]) == len(dsts):
                    mask, idx = cached
                else:
                    mask = (dsts % np.uint64(self.P)).astype(np.int64) == p
                    idx = np.searchsorted(vids, dsts[mask])
                    self._idx_cache[key] = (mask, idx)
                if not len(idx):
                    continue
                if self.mode == "sum":
                    reds_m = reds[mask]
                    if is2d:
                        for j in range(width):
                            acc[:, j] += np.bincount(idx, weights=reds_m[:, j], minlength=n)
                    else:
                        acc += np.bincount(idx, weights=reds_m, minlength=n)
                elif self.mode == "max":
                    np.maximum.at(acc, idx, reds[mask])
                else:
                    np.minimum.at(acc, idx, reds[mask])
            if self.mode == "sum":
                norm = csr.get("wdeg", deg)
                dm = np.asarray(dangling_mass)
                if self.apply_fn is not None:
                    # pluggable update rule (heat kernel, Sinkhorn steps, …)
                    if self._apply_takes_it:
                        new = self.apply_fn(acc, old, self.teleport.get(p), dm, csr, it=k)
                    else:
                        new = self.apply_fn(acc, old, self.teleport.get(p), dm, csr)
                else:
                    # generalized damped-walk update with a teleport
                    # distribution T (uniform → classic PageRank; seeded →
                    # personalized PageRank; zeros + damping=1 → pure
                    # k-step walk). Dangling mass re-enters via T.
                    T = self.teleport[p]
                    if is2d:
                        Tm = T if T.ndim == 2 else T[:, None]
                        new = (1.0 - self.damping) * Tm + self.damping * (acc + Tm * dm)
                    else:
                        new = (1.0 - self.damping) * T + self.damping * (acc + T * float(dm))
                delta = np.abs(new - old)
                dn = new[norm == 0].sum(axis=0)
                m = {
                    "part": p,
                    "n": n,
                    "delta_inf": float(delta.max()) if delta.size else 0.0,
                    "l1": float(delta.sum()),
                    "changed": int((delta > 0).sum()),
                    "dangling_next": dn.tolist() if np.ndim(dn) else float(dn),
                    "msg_bytes": msg_bytes if not metrics else 0,
                }
            else:
                new = np.maximum(old, acc) if self.mode == "max" else np.minimum(old, acc)
                ch = int((new != old).sum())
                m = {
                    "part": p,
                    "n": n,
                    "delta_inf": float(ch),
                    "l1": float(ch),
                    "changed": ch,
                    "dangling_next": 0.0,
                    "msg_bytes": msg_bytes if not metrics else 0,
                }
            self.values[p] = new
            if iter_dir is not None:  # None = skipped checkpoint (ckpt_every > 1)
                write_state_part(iter_dir, p, new, self.mode)
            metrics.append(m)
        return metrics

    def flush_state(self, iter_dir: str):
        """Write the CURRENT in-memory state of every owned part — the
        final-iteration flush for ``ckpt_every > 1`` runs."""
        from .ckpt import write_state_part

        for p in self.parts:
            write_state_part(iter_dir, p, self.values[p], self.mode)
