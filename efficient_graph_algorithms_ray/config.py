"""Engine configuration.

Sizing rationale (single node, 32 CPU sandbox — but chosen to hold at
cluster scale):

- ``num_partitions`` P: one CSR shard per partition. Pick P so a shard
  (~16 B/vertex + 8 B/edge) stays well under the 128 MiB default block
  size; at bench scale (1e5..1e6 pages) P=32..64 is plenty, at 1e12
  docs you would raise P to ~1e5 — nothing in the engine assumes P is
  small except the O(P) driver-side metrics rows per superstep.
- ``parse_batch_size``: html blobs are the big payload; keep batches
  small so a batch × actor-pool concurrency fits in worker heaps.
"""

from __future__ import annotations

from dataclasses import dataclass

HASH_SEED = 42  # vid hash seed — fixed so vids are stable across runs
UNLABELED = (1 << 64) - 1  # sentinel label for min-propagation (uint64 max)


@dataclass
class EngineConfig:
    num_partitions: int = 32
    damping: float = 0.85
    tol: float = 1e-6
    max_iters: int = 100
    parse_batch_size: int = 256
    parse_concurrency: int | None = None  # None → stateless tasks sizing by Ray
    checkpoint_dir: str | None = None
