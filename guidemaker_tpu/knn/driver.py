"""Unified exact k-NN index over guide sequences (Hamming or Levenshtein).

This is the owned, deterministic replacement for the reference's NMSLib
index object (core.py:418-523): build once over the deduplicated target set,
query in batches, reuse for control-guide search.  Distances are exact and
tie-broken by database index, so results are reproducible across runs,
devices, and mesh sizes.
"""
from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import numpy as np

from .. import dna
from .hamming import hamming_topk
from .leven import leven_topk


#: databases at/above this size use the streaming (in-kernel DMA) kernel
STREAM_THRESHOLD = 65536

#: fixed query-chunk rows for streaming top-k dispatches above one chunk
#: (the pallas grid bakes query rows into the executable; a fixed chunk
#: keeps the program set at ONE for any genome and makes it prewarmable)
_STREAM_Q_CHUNK = 32768


def _use_packed(length: int) -> bool:
    """Packed-pair kernels (2 guides per 128-lane row, pallas_packed.py)
    halve MXU+DMA work per pair for guide lengths <= 21, but measured on
    v5e the scale-decode makes the counting kernel VPU-bound (0.42 vs
    1.25 T pairs/s for the one-hot kernel; see docs/SCALING.md) — so they
    are opt-in via GUIDEMAKER_TPU_PACKED=1, kept as the memory-lean
    option (half the resident database bytes) and as the proof point
    that the lane padding is not the binding constraint."""
    from .pallas_packed import MAX_PACKED_LEN
    return (length <= MAX_PACKED_LEN
            and bool(os.environ.get("GUIDEMAKER_TPU_PACKED")))


def _default_backend() -> str:
    """Kernel backend: 'pallas' (fused, TPU), 'xla' (portable), 'native'
    (C++ popcount, CPU).  Selectable via GUIDEMAKER_TPU_KERNEL; defaults to
    the fused Pallas kernel on TPU and XLA elsewhere."""
    env = os.environ.get("GUIDEMAKER_TPU_KERNEL")
    if env in ("pallas", "xla", "native", "sharded"):
        return env
    import jax
    try:
        devices = jax.devices()
        platform = devices[0].platform
    except RuntimeError:
        devices, platform = [None], "cpu"
    if len(devices) > 1:
        return "sharded"  # multi-chip: 2-D mesh + all_gather top-k merge
    return "pallas" if platform == "tpu" else "xla"


class KnnIndex:
    """An exact nearest-neighbor index over equal-length guide sequences."""

    def __init__(self, seqs, metric: str = "hamming",
                 backend: str = None, num_threads: int = 0):
        if len(seqs) == 0:
            raise ValueError("cannot build an index over zero sequences")
        self.metric = "hamming" if metric == "hamming" else "leven"
        self.backend = backend or _default_backend()
        self.num_threads = num_threads  # native backend only (0 = all cores)
        if self.backend != "native":
            from ..util import warm_d2h_channel
            warm_d2h_channel()  # start opening the d2h channel early
        if isinstance(seqs, (list, tuple)):
            # string input: eager list, validated per row (original path)
            self._seqs_list: List[str] = list(seqs)
            self._seq_arr = None     # Arrow form built lazily on demand
            self.length = len(self._seqs_list[0])
            for s in self._seqs_list:
                if len(s) != self.length:
                    raise ValueError(
                        "all indexed sequences must share one length")
            codes = dna.encode_batch(self._seqs_list, self.length)
        else:
            # pandas / pyarrow column input: the codes come straight off
            # the Arrow data buffer and the Python string list is only
            # materialized if a caller asks for `.seqs` (the dict-shaped
            # neighbors API) — saves ~2 s of join/encode at 1.16M guides
            self._seqs_list = None
            codes, self._seq_arr = dna.encode_pandas(seqs)
            self.length = codes.shape[1]
        self._n = codes.shape[0]
        self._codes = codes.astype(np.uint8)
        # the native engines pack 2 bits/base, which aliases INVALID=4
        # to 'A'; ambiguous-base guides must take the JAX paths (one-hot
        # zero rows: N matches nothing)
        self._codes_ambiguous = bool(self._codes.max(initial=0) >= 4)
        self._db_dev = None   # device-resident padded database (lazy)
        self._db_tile = None
        self._db_packed = None       # packed-pair database (pallas_packed)
        self._db_packed_tile = None
        self._mesh = None     # device mesh (sharded backend, lazy)
        self._seqset = None   # frozenset(self.seqs), built on first use
        self._dedup_ok = None  # Arrow-path dedup validity, built on first use
        # one lock for every lazy device-database init: the pipeline's
        # background control search calls into the index concurrently
        # with the main thread (pipeline.py launches it right after
        # create_index), and a torn _db_dev/_db_tile init can hand a
        # kernel a tile size inconsistent with the padded database
        import threading
        self._lazy_lock = threading.Lock()

    @property
    def seqs(self) -> List[str]:
        """Indexed sequences as a Python list (materialized lazily — the
        pipeline's Arrow path never needs it; the dict-shaped neighbors
        API does)."""
        if self._seqs_list is None:
            self._seqs_list = self._seq_arr.to_pylist()
        return self._seqs_list

    @property
    def seq_array(self):
        """Indexed sequences as a pyarrow StringArray (no Python
        strings; built from the code matrix when the index was
        constructed from a list)."""
        if self._seq_arr is None:
            import pyarrow as pa
            arr = dna.rows_to_str_array(self._codes)
            self._seq_arr = pa.array(arr, from_pandas=True)
        return self._seq_arr

    def _counting_filter_valid(self, seqs) -> bool:
        """True iff the counting retention shortcut is exact for these
        queries: the database must be duplicate-free and every query a
        member (so the self-hit contributes exactly one count).  Non-member
        queries or duplicated database entries fall back to the k=2 path,
        which implements the general semantics."""
        if not isinstance(seqs, (list, tuple)):
            # Arrow path: C++ hash kernels, no Python sets
            import pyarrow as pa
            import pyarrow.compute as pc
            if self._dedup_ok is None:
                self._dedup_ok = bool(
                    len(self.seq_array.unique()) == self._n)
            if not self._dedup_ok:
                return False
            qa = seqs if isinstance(seqs, pa.Array) \
                else pa.array(seqs, from_pandas=True)
            if qa is self._seq_arr or len(qa) == 0:
                return True
            return bool(pc.all(pc.is_in(
                qa, value_set=self.seq_array)).as_py())
        if self._seqset is None:
            self._seqset = frozenset(self.seqs)
        if len(self._seqset) != self._n:
            return False
        if len(seqs) == self._n and list(seqs) == self.seqs:
            return True
        return all(s in self._seqset for s in seqs)

    def _ensure_packed_db(self) -> None:
        """Device-resident packed-pair database (pallas_packed.py), built
        once and reused by every streaming query/filter/count call."""
        if self._db_packed is None:
            with self._lazy_lock:
                if self._db_packed is None:
                    from .pallas_packed import prepare_db_packed
                    n2 = -(-self._n // 2)
                    tile = min(
                        4096, max(128, 1 << int(max(n2, 2) - 1).bit_length()))
                    self._db_packed_tile = tile
                    self._db_packed = prepare_db_packed(self._codes, tile)

    def _sharded_db(self):
        """Device-resident sharded database (built once, reused by every
        query/filter call — the database never re-crosses the host link)."""
        if self._db_dev is None or not hasattr(self._db_dev, "db_oh"):
            with self._lazy_lock:
                if self._db_dev is None or not hasattr(self._db_dev, "db_oh"):
                    from ..distributed import auto_mesh
                    from .sharded import prepare_db_sharded
                    if self._mesh is None:
                        self._mesh = auto_mesh()
                    self._db_dev = prepare_db_sharded(self._codes, self._mesh)
        return self._db_dev

    def _ensure_pallas_db(self, want: int):
        """Device-resident 2-bit code database for the pallas kernels
        (thread-safe, first caller's tile wins).  Returns (db_dev, tile)."""
        if self._db_dev is None:
            with self._lazy_lock:
                if self._db_dev is None:
                    from . import pallas_hamming as ph
                    nd = self._n
                    tile = min(want, max(128, 1 << int(nd - 1).bit_length()))
                    dev = ph.prepare_db_codes(self._codes, tile)
                    self._db_tile = tile   # publish tile BEFORE db_dev:
                    self._db_dev = dev     # readers check db_dev first
        return self._db_dev, self._db_tile

    def _ensure_xla_db(self, want: int):
        """Device-resident bf16 one-hot database for the xla backend
        (thread-safe).  Returns (db_dev, tile)."""
        if self._db_dev is None:
            with self._lazy_lock:
                if self._db_dev is None:
                    from .hamming import fit_tile, prepare_db
                    tile = fit_tile(want, self._n)
                    dev = prepare_db(self._onehot, tile)
                    self._db_tile = tile
                    self._db_dev = dev
        return self._db_dev, self._db_tile

    @property
    def _onehot(self) -> np.ndarray:
        # host one-hot is only needed by the xla backend; built lazily
        # (the pallas path one-hot-encodes the uint8 codes on device)
        if getattr(self, "_onehot_cache", None) is None:
            self._onehot_cache = dna.one_hot_matrix(self._codes,
                                                    dtype=np.float32)
        return self._onehot_cache

    def __len__(self) -> int:
        return self._n

    def _encode_queries(self, seqs) -> np.ndarray:
        if isinstance(seqs, (list, tuple)):
            return dna.encode_batch(seqs, self.length)
        codes, _ = dna.encode_pandas(seqs, self.length)
        return codes

    def _seqs_equal_db(self, seqs) -> bool:
        """Query batch == the whole database, in order (enables the
        all-vs-all shortcuts that reuse the resident device database)."""
        if isinstance(seqs, (list, tuple)):
            return list(seqs) == self.seqs
        if seqs is self._seq_arr:
            return True
        import pyarrow as pa
        import pyarrow.compute as pc
        qa = seqs if isinstance(seqs, pa.Array) \
            else pa.array(seqs, from_pandas=True)
        return bool(pc.all(pc.equal(qa, self.seq_array)).as_py())

    def query(self, seqs: Sequence[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
        """k nearest database entries for each query sequence.

        Returns (dists, idx), each (nq, k) int32, ascending by
        (distance, database index); -1 padding when k > len(db).
        Distances are in *bases* (the reference's one-hot bit-Hamming
        doubling, core.py:510-514, is already divided out).
        """
        if len(seqs) == 0:
            return (np.empty((0, k), np.int32), np.empty((0, k), np.int32))
        return self.query_codes(self._encode_queries(seqs), k)

    def query_codes(self, qc: np.ndarray,
                    k: int) -> Tuple[np.ndarray, np.ndarray]:
        """query() on pre-encoded (nq, L) uint8 codes — skips the string
        round-trip (the control-guide search samples codes directly)."""
        if qc.shape[0] == 0:
            return (np.empty((0, k), np.int32), np.empty((0, k), np.int32))
        if self.backend != "native":
            # compiled-executable downloads and result transfers both ride
            # the relay's return channel: never dispatch against it cold
            from ..util import warm_d2h_channel
            warm_d2h_channel(wait=True)
        qc = np.asarray(qc, dtype=np.uint8)
        if self.metric != "hamming":
            if (self.backend == "native" and self.length <= 32
                    and not self._codes_ambiguous
                    and not (qc >= 4).any()):
                from .. import native
                if native.available():
                    return native.leven_topk(qc, self._codes, k,
                                             n_threads=self.num_threads)
            if self.backend == "sharded":
                from ..distributed import auto_mesh
                from .sharded import sharded_leven_topk
                if self._mesh is None:
                    self._mesh = auto_mesh()
                return sharded_leven_topk(qc, self._codes, k, mesh=self._mesh)
            if getattr(self, "_leven_db", None) is None:
                with self._lazy_lock:
                    if getattr(self, "_leven_db", None) is None:
                        import jax.numpy as jnp
                        from .hamming import _pad_rows
                        nd = self._n
                        tile = min(4096, max(
                            128, 1 << int(nd - 1).bit_length()))
                        self._leven_tile = tile
                        self._leven_db = jnp.asarray(
                            _pad_rows(self._codes, tile))
            return leven_topk(qc, self._codes, k, db_tile=self._leven_tile,
                              db_dev=self._leven_db)
        return self.hamming_query_codes(qc, k)

    def hamming_query_codes(self, qc: np.ndarray,
                            k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact HAMMING k-NN on pre-encoded codes, regardless of the
        index metric — the 2-bit code database is metric-agnostic, so a
        Levenshtein index answers Hamming queries for free.  Used by the
        control-guide search, whose distance rule is Hamming by
        definition (config key ``MINIMUM_HMDIST``; the controls table's
        reported column is literally "Hamming distance")."""
        qc = np.asarray(qc, dtype=np.uint8)
        if (self.backend == "native" and not self._codes_ambiguous
                and not (qc >= 4).any()):
            from .. import native
            if native.available():
                return native.hamming_topk(qc, self._codes, k,
                                           n_threads=self.num_threads)
        nd = self._n
        if self.backend == "sharded":
            from .sharded import fused_sharded_topk
            return fused_sharded_topk(qc, self._sharded_db(), k)
        if self.backend == "pallas":
            from . import pallas_hamming as ph
            stream = nd >= STREAM_THRESHOLD
            if stream and _use_packed(self.length):
                # packed-pair streaming kernels: 2 guides per db row
                from .pallas_packed import packed_topk_device
                self._ensure_packed_db()
                return packed_topk_device(qc, self._db_packed, nd, k,
                                          self.length,
                                          db_tile=self._db_packed_tile,
                                          q_tile=256)
            # wide db tiles amortize the merge passes in the streaming
            # kernel (swept on v5e: q256/d8192 = 0.24 T pairs/s)
            db_dev, db_tile = self._ensure_pallas_db(8192 if stream else 1024)
            if stream:
                # large databases: stream db tiles inside the kernel
                # (per-grid-step overhead would dominate the 2-D grid).
                # Query sets above one chunk dispatch in FIXED 32768-row
                # chunks (tail padded): the pallas grid bakes the query
                # row count into the executable, so pow2 bucketing alone
                # still compiled+loaded a fresh program per novel bucket
                # (~4 s on the tunnel) — one chunk shape serves any
                # genome, and the retention thread prewarms it.
                from .pallas_stream import stream_topk_device
                ch = _STREAM_Q_CHUNK
                nq = qc.shape[0]
                if nq <= ch:
                    return stream_topk_device(qc, db_dev, nd, k,
                                              self.length,
                                              db_tile=db_tile, q_tile=256)
                # dispatch ALL chunks, then drain the tiny key blocks in
                # one batched fetch — per-chunk fetching serialized each
                # chunk's host one-hot prep behind the previous chunk's
                # transfer (same pattern as leven_topk's fetch_list)
                import jax
                import jax.numpy as jnp
                from . import pallas_hamming as ph
                from .pallas_stream import _stream_topk
                from .hamming import unpack_keys
                from ..util import fetch_list
                interpret = jax.default_backend() != "tpu"
                k_eff = min(k, nd, 128)
                qt, _ = ph.clamp_tiles(min(256, ch), db_tile)
                devs, ms = [], []
                for lo in range(0, nq, ch):
                    part = qc[lo:lo + ch]
                    m = part.shape[0]
                    if m < ch:   # pad tail: INVALID rows, sliced off
                        part = np.concatenate(
                            [part, np.full((ch - m, self.length), 4,
                                           np.uint8)])
                    q_dev = ph._onehot_on_device(jnp.asarray(part))
                    keys = _stream_topk(q_dev, db_dev, k=k_eff,
                                        length=self.length, q_tile=qt,
                                        db_tile=db_tile,
                                        interpret=interpret)
                    devs.append(keys[:m, :k_eff])
                    ms.append(m)
                dists, idxs = [], []
                for out in fetch_list(devs):
                    d, i = unpack_keys(np.asarray(out))
                    bad = i >= nd
                    d[bad] = -1
                    i[bad] = -1
                    dists.append(d)
                    idxs.append(i)
                d = np.concatenate(dists)
                i = np.concatenate(idxs)
                if k_eff < k:
                    pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
                    d = np.concatenate([d, pad], axis=1)
                    i = np.concatenate([i, pad], axis=1)
                return d, i
            return ph.pallas_topk_device(None, db_dev, nd, k,
                                         self.length, db_tile=db_tile,
                                         q_codes=qc)
        q_oh = dna.one_hot_matrix(qc, dtype=np.float32)
        from .hamming import hamming_topk_device
        db_dev, db_tile = self._ensure_xla_db(8192)
        return hamming_topk_device(q_oh, db_dev, nd, k, self.length,
                                   db_tile=db_tile)

    def pass_distance_filter(self, seqs: Sequence[str],
                             editdist: int) -> np.ndarray:
        """(nq,) bool: does each query's 2nd-nearest neighbor (self is the
        1st — queries must be members of this index) sit at distance
        >= editdist?  This is the reference's guide-retention rule
        (core.py:509-522) without materializing any neighbor lists.

        On the streaming TPU path this runs a counting kernel — one VPU
        pass per guide pair instead of the top-k merge's k passes, and a
        1-bit-entropy result transfer; elsewhere it derives the answer
        from a k=2 query.
        """
        if len(seqs) == 0:
            return np.zeros(0, dtype=bool)
        nd = self._n
        if nd < 2:
            # reference semantics: dists[1] is padding (-1) -> nothing passes
            return np.zeros(len(seqs), dtype=bool)
        counting_ok = self._counting_filter_valid(seqs)
        if (self.metric == "leven" and counting_ok
                and editdist <= self.length):
            # MXU dilated-filter counting + banded-DP verification (see
            # leven.leven_pass_filter); exact, and orders of magnitude
            # cheaper than the full-DP k=2 query at genome scale.  On the
            # sharded backend the counting pass runs over the mesh.
            from .leven import leven_pass_filter
            mesh = None
            if self.backend == "sharded":
                from ..distributed import auto_mesh
                if self._mesh is None:
                    self._mesh = auto_mesh()
                mesh = self._mesh
            return leven_pass_filter(self._encode_queries(seqs),
                                     self._codes, editdist, mesh=mesh)
        if (self.metric == "hamming" and self.backend == "sharded"
                and editdist <= self.length and counting_ok):
            from .sharded import fused_sharded_count
            counts = fused_sharded_count(self._encode_queries(seqs),
                                         self._sharded_db(), editdist)
            # dists[1] >= editdist  <=>  count(dist < editdist) <= 1: for
            # editdist > 0 the self-hit always contributes exactly 1; for
            # editdist == 0 nothing does and every query passes (matching
            # the reference threshold, which is vacuous at 0)
            return counts <= 1
        if (self.metric == "hamming" and self.backend == "pallas"
                and nd >= STREAM_THRESHOLD and editdist <= self.length
                and counting_ok):
            from ..util import warm_d2h_channel
            warm_d2h_channel(wait=True)  # see query(): no cold dispatches
            if _use_packed(self.length):
                from .pallas_packed import packed_count_device
                self._ensure_packed_db()
                if len(seqs) == nd and self._seqs_equal_db(seqs):
                    qc = self._codes        # all-vs-all: skip re-encoding
                else:
                    qc = self._encode_queries(seqs)
                counts = packed_count_device(
                    qc, self._db_packed, nd, editdist, self.length,
                    db_tile=self._db_packed_tile)
                return counts <= 1
            from .pallas_stream import stream_count_device
            # lock-protected init: the phase-2 prewarm thread races this
            self._ensure_pallas_db(8192)
            if len(seqs) == nd and self._seqs_equal_db(seqs):
                # all-vs-all: reuse the resident database one-hot
                counts = stream_count_device(
                    None, self._db_dev, nd, editdist, self.length,
                    db_tile=self._db_tile, q_tile=1024,
                    q_dev=self._db_dev, nq=nd)
            else:
                qc = self._encode_queries(seqs)
                counts = stream_count_device(qc, self._db_dev, nd, editdist,
                                             self.length,
                                             db_tile=self._db_tile,
                                             q_tile=1024)
            # dists[1] >= editdist  <=>  count(dist < editdist) <= 1: for
            # editdist > 0 the self-hit always contributes exactly 1; for
            # editdist == 0 nothing does and every query passes (matching
            # the reference threshold, which is vacuous at 0)
            return counts <= 1
        dists, _ = self.query(seqs, k=2)
        return (dists[:, 1] >= 0) & (dists[:, 1] >= editdist)

    def count_within(self, codes, editdist: int):
        """(nq,) int32 raw counts of database entries at HAMMING distance
        < ``editdist`` per query, or None when unsupported (native
        backend) — callers fall back to an exact k=1/k=2 query.

        Unlike :meth:`pass_distance_filter`, no membership precondition:
        these are plain counts (``count == 0`` <=> hamming nearest >=
        editdist), used by the control-guide search to triage huge
        candidate pools with one VPU pass per pair and a tiny
        device->host transfer.  The counter is meaningful on a Levenshtein
        index too: leven <= hamming always, so ``count > 0`` soundly
        implies a Levenshtein neighbor closer than ``editdist`` (callers
        must still verify the survivors exactly).  ``codes`` may be a
        host array or a device-resident one (the control sampler
        generates candidates on device — no host->device candidate
        traffic at all).
        """
        if self.backend == "native" or editdist > self.length:
            return None
        import jax
        import jax.numpy as jnp
        from ..util import fetch, warm_d2h_channel
        warm_d2h_channel(wait=True)
        nd = self._n
        nq = int(codes.shape[0])
        if self.backend == "sharded":
            from .sharded import fused_sharded_count
            return fused_sharded_count(
                np.asarray(codes, dtype=np.uint8), self._sharded_db(),
                editdist)
        if self.backend == "pallas":
            from . import pallas_hamming as ph
            if _use_packed(self.length):
                from .pallas_packed import (clamp_packed_tiles,
                                            packed_count_device, _query_rows)
                from .pallas_hamming import bucket_rows
                self._ensure_packed_db()
                q_tile = clamp_packed_tiles(
                    min(512, max(8, 1 << (nq - 1).bit_length())),
                    self._db_packed_tile, merge=False)
                dev = jnp.asarray(codes)
                pad = bucket_rows(nq, q_tile) - nq
                if pad:  # pad rows on device with INVALID=4 (tetra -> 0)
                    dev = jnp.pad(dev, ((0, pad), (0, 0)),
                                  constant_values=4)
                q_dev = _query_rows(dev, length=self.length)
                return packed_count_device(
                    None, self._db_packed, nd, editdist, self.length,
                    db_tile=self._db_packed_tile, q_tile=q_tile,
                    q_dev=q_dev, nq=nq)
            from .pallas_stream import stream_count_device
            db_dev, db_tile = self._ensure_pallas_db(8192)
            q_tile, _ = ph.clamp_tiles(
                min(1024, max(8, 1 << (nq - 1).bit_length())), db_tile)
            dev = jnp.asarray(codes)
            pad = (-nq) % q_tile
            if pad:   # pad rows on device with INVALID=4 (one-hots to zero)
                dev = jnp.pad(dev, ((0, pad), (0, 0)), constant_values=4)
            q_dev = ph._onehot_on_device(dev)
            return stream_count_device(None, db_dev, nd, editdist,
                                       self.length, db_tile=db_tile,
                                       q_tile=q_tile, q_dev=q_dev, nq=nq)
        # xla backend: scan-matmul counting twin
        from .hamming import _count_all, fit_tile
        db_dev, db_tile = self._ensure_xla_db(8192)
        q_tile = fit_tile(2048, nq)
        dev = jnp.asarray(codes)
        pad = (-nq) % q_tile
        if pad:
            dev = jnp.pad(dev, ((0, pad), (0, 0)), constant_values=4)
        q_oh = jax.nn.one_hot(dev, 4, dtype=jnp.bfloat16).reshape(
            dev.shape[0], -1)
        counts = _count_all(q_oh, db_dev, jnp.int32(nd),
                            editdist=editdist, length=self.length,
                            db_tile=db_tile, q_tile=q_tile)
        return fetch(counts)[:nq]

    def pass_mask_within(self, codes, editdist: int,
                         chunk: int = 1 << 21):
        """(nq,) uint8 host mask — 1 iff NO database entry lies at
        Hamming distance < ``editdist`` from the candidate (the control
        ladder's triage decision), or None when unsupported.

        Transfer-minimal variant of :meth:`count_within` for tunneled
        backends where every device→host round trip costs a ~2 s RTT:
        all ``chunk``-row dispatches stay on device, the counts reduce
        to a uint8 mask on device, everything concatenates on device,
        and ONE fetch moves nq bytes (the int32-counts path moved 4×
        the bytes in one fetch PER chunk — measured 22 s of a 24 s
        control search on the 10M-candidate rung).
        """
        nq = int(codes.shape[0])
        if nq == 0:
            return np.empty(0, np.uint8)
        if (self.backend != "pallas" or _use_packed(self.length)
                or editdist > self.length):
            # fallback backends keep the original per-chunk dispatch
            # discipline (bounded peak memory + bounded head-of-line
            # blocking of concurrent pipeline device work)
            parts = []
            for lo in range(0, nq, chunk):
                counts = self.count_within(codes[lo:lo + chunk], editdist)
                if counts is None:
                    return None
                parts.append((counts == 0).astype(np.uint8))
            return parts[0] if len(parts) == 1 else np.concatenate(parts)
        import jax
        import jax.numpy as jnp
        from ..util import fetch, warm_d2h_channel
        from . import pallas_hamming as ph
        from .pallas_stream import _stream_count
        warm_d2h_channel(wait=True)
        db_dev, db_tile = self._ensure_pallas_db(8192)
        interpret = jax.default_backend() != "tpu"
        masks = []
        for lo in range(0, nq, chunk):
            part = codes[lo:lo + chunk]
            m = int(part.shape[0])
            q_tile, _ = ph.clamp_tiles(
                min(1024, max(8, 1 << (m - 1).bit_length())), db_tile)
            dev = part if isinstance(part, jnp.ndarray) else jnp.asarray(part)
            pad = (-m) % q_tile
            if pad:  # pad rows on device with INVALID=4 (one-hots to zero)
                dev = jnp.pad(dev, ((0, pad), (0, 0)), constant_values=4)
            counts = _stream_count(
                ph._onehot_on_device(dev), db_dev,
                length=self.length, editdist=editdist,
                q_tile=q_tile, db_tile=db_tile, interpret=interpret)
            masks.append((counts[:m, 0] == 0).astype(jnp.uint8))
            if len(masks) >= 2:
                # bound in-flight chunks to 2: each queued _stream_count
                # output is a (chunk, 128)-int32 buffer (1 GiB at 2^21
                # rows) allocated at dispatch; waiting on the mask two
                # chunks back caps transient HBM at ~2 buffers while
                # keeping the dispatch pipeline full
                masks[-2].block_until_ready()
        out = masks[0] if len(masks) == 1 else jnp.concatenate(masks)
        return fetch(out)

    def supports_chunk_triage(self, editdist: int) -> bool:
        """True iff :meth:`pass_mask_chunks` will run (the fixed-shape
        streaming triage) — lets the control ladder pick its path ONCE
        instead of sampling a chunk group per rung only to discard it
        when the backend says no."""
        return (self.backend == "pallas" and not _use_packed(self.length)
                and editdist <= self.length)

    def pass_mask_chunks(self, chunks, editdist: int):
        """:meth:`pass_mask_within` over a list of EQUAL-SHAPE device
        candidate chunks — every dispatch reuses ONE fixed-shape counting
        executable, or None when unsupported.

        On tunneled backends each distinct program shape pays a
        multi-second executable upload; the control ladder's rungs
        (10k/100k/1M/10M candidates) used to compile+load a fresh
        counting program per rung (measured ~12 s of a ~27 s search was
        shape churn, not arithmetic).  Sampling candidates in fixed-size
        chunks makes every rung — and the prewarm — hit the same
        program.  Returns one uint8 mask over all chunk rows in order
        (callers slice off any tail rows beyond the rung size).
        """
        if not self.supports_chunk_triage(editdist):
            return None
        import jax
        import jax.numpy as jnp
        from ..util import fetch, warm_d2h_channel
        from . import pallas_hamming as ph
        from .pallas_stream import _stream_count
        warm_d2h_channel(wait=True)
        db_dev, db_tile = self._ensure_pallas_db(8192)
        interpret = jax.default_backend() != "tpu"
        rows = int(chunks[0].shape[0])
        q_tile, _ = ph.clamp_tiles(min(1024, rows), db_tile)
        pad = (-rows) % q_tile   # the pallas grid floor-divides by q_tile
        masks = []
        for dev in chunks:
            if pad:  # pad rows on device with INVALID=4 (one-hots to zero)
                dev = jnp.pad(dev, ((0, pad), (0, 0)), constant_values=4)
            counts = _stream_count(
                ph._onehot_on_device(dev), db_dev,
                length=self.length, editdist=editdist,
                q_tile=q_tile, db_tile=db_tile, interpret=interpret)
            masks.append((counts[:rows, 0] == 0).astype(jnp.uint8))
            if len(masks) >= 2:
                # cap transient HBM at ~2 in-flight count buffers while
                # keeping the dispatch pipeline full (see pass_mask_within)
                masks[-2].block_until_ready()
        out = masks[0] if len(masks) == 1 else jnp.concatenate(masks)
        return fetch(out)

    def neighbor_seqs(self, idx_row: np.ndarray) -> List[str]:
        """Map database indices to sequences (fixes the reference's
        set-ordering index bug, core.py:446 vs core.py:513)."""
        return [self.seqs[int(i)] for i in idx_row if int(i) >= 0]

    # ------------------------------------------------------------------
    # persistence (the reference never saves its NMSLib index; exact
    # indexes round-trip trivially as the packed code matrix)
    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Save the index to an .npz file (codes + metric + backend)."""
        np.savez_compressed(path, codes=self._codes,
                            metric=np.str_(self.metric),
                            backend=np.str_(self.backend))

    @classmethod
    def load(cls, path: str, backend: str = None) -> "KnnIndex":
        z = np.load(path)
        codes = z["codes"]
        seqs = dna.decode_rows(codes)
        return cls(seqs, metric=str(z["metric"]),
                   backend=backend or str(z["backend"]))


def knn_search(db_seqs: Sequence[str], q_seqs: Sequence[str], k: int,
               metric: str = "hamming") -> Tuple[np.ndarray, np.ndarray]:
    """One-shot exact k-NN: build + query."""
    return KnnIndex(db_seqs, metric).query(q_seqs, k)
