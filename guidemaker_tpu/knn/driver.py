"""Unified exact k-NN index over guide sequences (Hamming or Levenshtein).

This is the owned, deterministic replacement for the reference's NMSLib
index object (core.py:418-523): build once over the deduplicated target set,
query in batches, reuse for control-guide search.  Distances are exact and
tie-broken by database index, so results are reproducible across runs,
devices, and mesh sizes.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .. import dna
from .hamming import hamming_topk
from .leven import leven_topk


class KnnIndex:
    """An exact nearest-neighbor index over equal-length guide sequences."""

    def __init__(self, seqs: Sequence[str], metric: str = "hamming"):
        if len(seqs) == 0:
            raise ValueError("cannot build an index over zero sequences")
        self.seqs: List[str] = list(seqs)
        self.metric = "hamming" if metric == "hamming" else "leven"
        self.length = len(self.seqs[0])
        for s in self.seqs:
            if len(s) != self.length:
                raise ValueError("all indexed sequences must share one length")
        codes = np.stack([dna.encode(s) for s in self.seqs])
        self._codes = codes.astype(np.uint8)
        self._onehot = (dna.one_hot_matrix(codes, dtype=np.float32)
                        if self.metric == "hamming" else None)

    def __len__(self) -> int:
        return len(self.seqs)

    def _encode_queries(self, seqs: Sequence[str]) -> np.ndarray:
        return np.stack([dna.encode(s) for s in seqs]).astype(np.uint8)

    def query(self, seqs: Sequence[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
        """k nearest database entries for each query sequence.

        Returns (dists, idx), each (nq, k) int32, ascending by
        (distance, database index); -1 padding when k > len(db).
        Distances are in *bases* (the reference's one-hot bit-Hamming
        doubling, core.py:510-514, is already divided out).
        """
        if len(seqs) == 0:
            return (np.empty((0, k), np.int32), np.empty((0, k), np.int32))
        qc = self._encode_queries(seqs)
        if self.metric == "hamming":
            q_oh = dna.one_hot_matrix(qc, dtype=np.float32)
            return hamming_topk(q_oh, self._onehot, k, self.length)
        return leven_topk(qc, self._codes, k)

    def neighbor_seqs(self, idx_row: np.ndarray) -> List[str]:
        """Map database indices to sequences (fixes the reference's
        set-ordering index bug, core.py:446 vs core.py:513)."""
        return [self.seqs[int(i)] for i in idx_row if int(i) >= 0]


def knn_search(db_seqs: Sequence[str], q_seqs: Sequence[str], k: int,
               metric: str = "hamming") -> Tuple[np.ndarray, np.ndarray]:
    """One-shot exact k-NN: build + query."""
    return KnnIndex(db_seqs, metric).query(q_seqs, k)
