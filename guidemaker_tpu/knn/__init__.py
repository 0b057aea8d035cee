"""Exact k-nearest-neighbor engine for guide off-target search.

Replaces the reference's approximate NMSLib/HNSW index
(``/root/reference/guidemaker/core.py:418-523``) with exact, deterministic
nearest-neighbor search designed for TPU:

* **Hamming**: guides are one-hot encoded so the match count between two
  guides is an inner product — the full distance computation is a single
  (tiled) bfloat16 matmul on the MXU, fused with a running top-k so the
  N x N distance matrix is never materialized.
* **Levenshtein**: batched banded DP with a cummin-based row recurrence,
  vectorized over guide pairs on the VPU.
* **Sharding**: the database shards across a device mesh; per-shard top-k
  results merge with an ``all_gather`` over ICI (see ``sharded.py``).

Exactness makes recall 1.0 by construction (the reference's tuned HNSW
achieves ~0.99, ``tests/GridOptimization.ipynb``), and index-based
tie-breaking makes results deterministic (the reference's ``set()`` ordering
was not, core.py:446).
"""
from .driver import KnnIndex, knn_search

__all__ = ["KnnIndex", "knn_search"]
