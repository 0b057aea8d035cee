"""Exact Levenshtein k-NN: batched DP with a cummin row recurrence.

Replaces the reference's NMSLib ``leven`` space (core.py:459-467).  The
classic DP has a sequential dependency along the row (``D[i,j-1] + 1``);
we break it with the standard prefix-min identity::

    E[j]   = min(D[i-1, j] + 1, D[i-1, j-1] + cost(i, j))   # vectorizable
    D[i,j] = min_{m <= j} (E[m] + (j - m))                   # cummin form
           = cummin_j(E[j] - j) + j

so each DP row is pure elementwise + ``lax.cummin`` work on the VPU,
vectorized over a (query_tile x db_tile) block of guide pairs.  The scan
over rows has ``L`` (guide length, <= 27) steps.

All guides in a run share one length (the reference's ``check_target``
enforces ``len == target_len``, core.py:127-140), which keeps shapes static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..util import fetch

from .hamming import INF_KEY, _merge_topk, _pad_rows, pack_keys, unpack_keys


@functools.partial(jax.jit, static_argnames=("length",))
def leven_block(qc: jnp.ndarray, dc: jnp.ndarray, *, length: int) -> jnp.ndarray:
    """Full Levenshtein distance for every (query, db) pair in the block.

    qc: (tq, L) uint8 codes; dc: (td, L) uint8 codes -> (tq, td) int32.
    """
    tq, td = qc.shape[0], dc.shape[0]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, length + 1), 2)
    d_prev = jnp.broadcast_to(jcol, (tq, td, length + 1)).astype(jnp.int32)

    # rows unrolled (length <= 27 is static): flat straight-line HLO
    # compiles far faster than a nested lax.scan on tunneled TPU backends
    for i in range(length):
        qchar = qc[:, i:i + 1]                                  # (tq, 1)
        cost = (qchar[:, None, :] != dc[None, :, :]).astype(jnp.int32)
        sub = d_prev[..., :-1] + cost
        dele = d_prev[..., 1:] + 1
        e_tail = jnp.minimum(sub, dele)
        e_head = jnp.full((tq, td, 1), i + 1, dtype=jnp.int32)
        e = jnp.concatenate([e_head, e_tail], axis=-1)
        d_prev = jax.lax.cummin(e - jcol, axis=2) + jcol
    return d_prev[..., -1]


@functools.partial(jax.jit, static_argnames=("k", "length", "db_tile"))
def _topk_tiles_leven(qc, db_codes, db_n, idx_offset, *, k, length, db_tile):
    """Running top-k of packed (dist, idx) keys over Levenshtein db tiles."""
    n_tiles = db_codes.shape[0] // db_tile
    tq = qc.shape[0]
    init = jnp.full((tq, k), INF_KEY, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, db_tile), 1)

    def body(best, t):
        tile = jax.lax.dynamic_slice_in_dim(db_codes, t * db_tile, db_tile)
        dist = leven_block(qc, tile, length=length)
        gidx = t * db_tile + lane
        keys = jnp.where(gidx < db_n, pack_keys(dist, gidx + idx_offset), INF_KEY)
        return _merge_topk(best, keys, k), None

    best, _ = jax.lax.scan(body, init, jnp.arange(n_tiles, dtype=jnp.int32))
    return best


@functools.partial(jax.jit, static_argnames=("k", "length", "db_tile",
                                              "q_tile"))
def _topk_scan_leven(q_pad, db_codes, db_n, idx_offset, *, k, length,
                     db_tile, q_tile):
    """Single-dispatch driver: lax.scan over query tiles around the db-tile
    running top-k — one kernel launch for the whole query set (the per-tile
    host loop used to cost one tunnel RTT per 512 queries)."""
    n_qt = q_pad.shape[0] // q_tile
    qt = q_pad.reshape(n_qt, q_tile, length)

    def step(_, qtile):
        return None, _topk_tiles_leven(qtile, db_codes, db_n, idx_offset,
                                       k=k, length=length, db_tile=db_tile)

    _, keys = jax.lax.scan(step, None, qt)
    return keys.reshape(n_qt * q_tile, k)


def leven_topk(q_codes: np.ndarray, db_codes: np.ndarray, k: int, *,
               db_tile: int = 1024, q_tile: int = 512, idx_offset: int = 0,
               db_dev=None):
    """Exact k smallest Levenshtein distances per query (see hamming_topk).

    One device dispatch for the whole query set; pass a pre-transferred
    ``db_dev`` (from ``jnp.asarray(_pad_rows(db_codes, db_tile))``) to
    reuse a device-resident database across calls.
    """
    nq, nd = q_codes.shape[0], db_codes.shape[0]
    length = q_codes.shape[1]
    k_eff = min(k, nd)
    db_tile = min(db_tile, max(128, 1 << (int(nd - 1).bit_length())))
    q_tile = min(q_tile, max(128, 1 << (int(nq - 1).bit_length())))

    if db_dev is None:
        db_dev = jnp.asarray(_pad_rows(db_codes, db_tile))
    q_pad = _pad_rows(q_codes, q_tile)
    out = fetch(_topk_scan_leven(jnp.asarray(q_pad), db_dev, jnp.int32(nd),
                                 jnp.int32(idx_offset), k=k_eff,
                                 length=length, db_tile=db_tile,
                                 q_tile=q_tile))[:nq]

    dist, idx = unpack_keys(out)
    if k_eff < k:
        pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
        dist = np.concatenate([dist, pad], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return dist, idx


# ---------------------------------------------------------------------------
# Genome-scale Levenshtein retention: MXU prefilter + banded-DP verification
#
# The reference handles million-guide `leven` runs through one NMSLib index
# (core.py:459-467).  Exact brute-force DP over all pairs is VPU work
# (~3.4k ops/pair) — 1e12 pairs would take hours.  Retention, however, only
# needs "is the 2nd-nearest neighbor at distance >= e", and that decision
# can ride the MXU:
#
#   If leven(a, b) <= t (t = e-1), an optimal alignment has >= L - t
#   matched characters, each matched pair offset by at most t positions
#   (an alignment with i insertions / d deletions never leaves the
#   diagonal band |j - i| <= t).  Therefore
#
#     dot(onehot(a), dilated_t(b)) >= L - t   AND
#     dot(dilated_t(a), onehot(b)) >= L - t
#
#   where dilated_t ORs each position's one-hot over a +-t window.  Summing
#   both sides: dot([oh(a); dil(a)], [dil(b); oh(b)]) >= 2(L - t) — one
#   int8 MXU inner product per pair, evaluated by the existing counting /
#   top-k kernels with "length" 2L and "editdist" 2e-1.
#
# The filter is sound (never misses a true leven < e pair) but not exact;
# queries with >= 2 filter hits are verified by a banded DP over just
# their candidate pairs, and the rare queries with more than LANES
# candidates fall back to an exact k=2 full-DP query.
# ---------------------------------------------------------------------------

#: filter top-k candidate budget.  Small on purpose: the in-kernel merge
#: unrolls k min-extraction rounds (a k=64 program blew past the TPU
#: compile helper); queries with more candidates take the exact fallback.
_FILTER_K = 16


def dilated_onehot(codes: np.ndarray, t: int, lanes: int = 128) -> np.ndarray:
    """(n, L) uint8 codes -> (n, pad(4L)) int8 position-major one-hot,
    OR-dilated over a +-t position window (t=0 gives the plain one-hot).

    Layout matches pallas_hamming._onehot_on_device (pos-major, 4 channels
    per position) so dilated and plain encodings can be dotted together.
    Invalid codes (>= 4, incl. padding) contribute nothing.
    """
    n, length = codes.shape
    oh = np.zeros((n, length, 4), dtype=np.int8)
    valid = codes < 4
    np.put_along_axis(oh, np.where(valid, codes, 0)[..., None].astype(np.int64),
                      valid[..., None].astype(np.int8), axis=2)
    out = oh
    for s in range(1, t + 1):
        shifted_fwd = np.zeros_like(oh)
        shifted_fwd[:, s:] = oh[:, :-s]
        shifted_back = np.zeros_like(oh)
        shifted_back[:, :-s] = oh[:, s:]
        out = np.maximum(out, np.maximum(shifted_fwd, shifted_back))
    flat = out.reshape(n, 4 * length)
    pad = -flat.shape[1] % lanes
    if pad:
        flat = np.pad(flat, ((0, 0), (0, pad)))
    return flat


def _filter_feats(codes: np.ndarray, t: int, side: str) -> np.ndarray:
    """Two-sided filter features: queries carry [oh; dil], database rows
    carry [dil; oh], so one dot product evaluates both direction sums.
    (Host/numpy variant — the soundness oracle; production uses
    :func:`_feat_halves_on_device`.)"""
    oh = dilated_onehot(codes, 0)
    dil = dilated_onehot(codes, t)
    return np.concatenate([oh, dil] if side == "q" else [dil, oh], axis=1)


@functools.partial(jax.jit, static_argnames=("t",))
def _feat_halves_on_device(codes, *, t):
    """uint8 codes -> (plain, dilated) lane-padded int8 one-hot halves,
    built on device (the host variant cost ~30 s + a 600 MB transfer at
    genome scale).  Padding codes (>= 4) one-hot to zero rows."""
    n, length = codes.shape
    oh = jax.nn.one_hot(codes, 4, dtype=jnp.int8)          # (n, L, 4)
    dil = oh
    for s in range(1, t + 1):
        fwd = jnp.pad(oh, ((0, 0), (s, 0), (0, 0)))[:, :length]
        back = jnp.pad(oh, ((0, 0), (0, s), (0, 0)))[:, s:]
        dil = jnp.maximum(dil, jnp.maximum(fwd, back))
    ohf = oh.reshape(n, 4 * length)
    dilf = dil.reshape(n, 4 * length)
    pad = -(4 * length) % 128
    if pad:
        ohf = jnp.pad(ohf, ((0, 0), (0, pad)))
        dilf = jnp.pad(dilf, ((0, 0), (0, pad)))
    return ohf, dilf


_BIG = np.int32(1 << 20)


@functools.partial(jax.jit, static_argnames=("t", "length"))
def banded_leven_pairs(a: jnp.ndarray, b: jnp.ndarray, *, t: int,
                       length: int) -> jnp.ndarray:
    """Banded Levenshtein for row-paired codes: (n, L) x (n, L) -> (n,).

    Exact whenever the true distance is <= t; anything larger returns
    t + 1 (a path with > t edits must leave the +-t diagonal band, so the
    band bound is itself sound).  Pure VPU: w = 2t+1 lanes per pair,
    cummin row recurrence as in leven_block.
    """
    n = a.shape[0]
    w = 2 * t + 1
    offs = jnp.arange(-t, t + 1, dtype=jnp.int32)          # (w,)
    oidx = jnp.arange(w, dtype=jnp.int32)
    row = jnp.where(offs >= 0, offs, _BIG)
    B = jnp.broadcast_to(row, (n, w)).astype(jnp.int32)    # D[0][j]

    for i in range(1, length + 1):
        j = i + offs                                       # (w,) col per lane
        in_band = (j >= 0) & (j <= length)
        # substitution: B[o] + (a[i-1] != b[j-1]); j==0 handled below
        bj = jnp.take(b, jnp.clip(j - 1, 0, length - 1), axis=1)  # (n, w)
        cost = (a[:, i - 1:i] != bj).astype(jnp.int32)
        sub = B + cost
        # deletion (consume a char): D[i-1][j] = B[o+1]
        dele = jnp.concatenate(
            [B[:, 1:], jnp.full((n, 1), _BIG, jnp.int32)], axis=1) + 1
        E = jnp.minimum(sub, dele)
        E = jnp.where(j == 0, jnp.int32(i), E)             # D[i][0] = i
        E = jnp.where(in_band, E, _BIG)
        # insertion closure along the row: D[i][j] = min_{m<=j} E[m]+(j-m)
        B = jax.lax.cummin(E - oidx, axis=1) + oidx
        B = jnp.where(in_band, B, _BIG)
    return jnp.minimum(B[:, t], t + 1)                     # o=0 -> j=L


def leven_pass_filter(q_codes: np.ndarray, db_codes: np.ndarray,
                      editdist: int, *, interpret=None,
                      filter_k: int = _FILTER_K, mesh=None) -> np.ndarray:
    """(nq,) bool — is each query's 2nd-nearest Levenshtein neighbor at
    distance >= editdist?  Requires the driver's counting preconditions
    (deduplicated database, every query a member).

    Three tiers: MXU dilated-filter counting (decides the overwhelming
    majority of queries in one pass; pass <=> dot >= 2(L-t) <=>
    pseudo-dist (2L - dot) <= 2t < 2e-1), banded-DP verification of the
    filter's candidate lists, and an exact full-DP k=2 fallback for
    queries whose candidate list overflows ``filter_k``.  All feature
    matrices are built on device from 2-bit codes.

    ``mesh``: when given, the O(nq x nd) counting pass runs sharded —
    database features over the ``d`` mesh axis, queries over ``q``,
    partial counts merged with one ``psum`` (knn/sharded.py; the count
    rule is metric-agnostic matmul thresholding, so the hamming sharded
    counter evaluates the dilated-filter features unchanged).  The
    candidate-verification tiers stay single-device: they touch a few
    hundred (query, candidate) pairs, not the n^2 pair space.
    """
    from .pallas_hamming import bucket_rows, clamp_tiles
    from .pallas_stream import _stream_count, _stream_topk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nq, length = q_codes.shape
    nd = db_codes.shape[0]
    e = int(editdist)
    if e <= 1:
        # dist < 1 means identical; dedup + membership make self the only
        # such hit, so every query passes (e == 0 is vacuous, as in the
        # reference threshold core.py:517-522)
        return np.ones(nq, dtype=bool)
    t = e - 1
    two_l = 2 * length
    from .pallas_hamming import _pad_code_rows
    db_tile = min(8192, max(128, 1 << (nd - 1).bit_length()))
    q_tile = min(256, max(8, 1 << (nq - 1).bit_length()))
    q_tile, db_tile = clamp_tiles(q_tile, db_tile)
    db_oh, db_dil = _feat_halves_on_device(
        jnp.asarray(_pad_code_rows(db_codes, db_tile)), t=t)
    db_feat = jnp.concatenate([db_dil, db_oh], axis=1)
    if q_codes is db_codes:
        # all-vs-all: reuse the db halves (padded db rows are a pow2
        # multiple of db_tile >= q_tile, so the q grid divides evenly;
        # padding rows' counts are sliced off below)
        q_oh, q_dil = db_oh, db_dil
    else:
        q_oh, q_dil = _feat_halves_on_device(
            jnp.asarray(_pad_code_rows(q_codes,
                                       bucket_rows(nq, q_tile))), t=t)
    q_feat = jnp.concatenate([q_oh, q_dil], axis=1)
    if mesh is not None:
        from .sharded import sharded_hamming_count
        counts = sharded_hamming_count(
            np.asarray(q_feat)[:nq], np.asarray(db_feat),
            editdist=2 * e - 1, length=two_l, mesh=mesh)[:nq]
        # db padding rows: all-zero features -> dot 0 -> pseudo-dist 2L
        # >= 2e-1, never counted (same invariant as the fused path)
    else:
        counts = fetch(_stream_count(
            q_feat, db_feat, length=two_l, editdist=2 * e - 1,
            q_tile=q_tile, db_tile=db_tile, interpret=interpret)[:nq, 0])
    passed = counts <= 1
    ambig = np.flatnonzero((counts >= 2) & (counts <= filter_k))
    overflow = np.flatnonzero(counts > filter_k)

    if ambig.size:
        k_eff = min(filter_k, nd)
        qa_feat = jnp.take(q_feat, jnp.asarray(ambig), axis=0)
        na_pad = bucket_rows(ambig.size, min(q_tile, 256))
        if qa_feat.shape[0] < na_pad:
            qa_feat = jnp.pad(qa_feat,
                              ((0, na_pad - qa_feat.shape[0]), (0, 0)))
        keys = _stream_topk(qa_feat, db_feat, k=k_eff, length=two_l,
                            q_tile=min(q_tile, 256), db_tile=db_tile,
                            interpret=interpret)
        _, cand = unpack_keys(fetch(keys[:ambig.size, :k_eff]))
        cand[cand >= nd] = -1                    # db padding rows
        qa = np.repeat(q_codes[ambig], k_eff, axis=0)
        ca = db_codes[np.clip(cand, 0, nd - 1)].reshape(-1, length)
        bd = fetch(banded_leven_pairs(jnp.asarray(qa), jnp.asarray(ca),
                                      t=t, length=length))
        bd = bd.reshape(ambig.size, k_eff)
        # dist 0 <=> identical <=> self (db is deduplicated; queries are
        # members); any other candidate closer than e fails retention
        close = (bd > 0) & (bd < e) & (cand >= 0)
        passed[ambig] = ~close.any(axis=1)

    if overflow.size:
        d2, _ = leven_topk(q_codes[overflow], db_codes, 2)
        passed[overflow] = (d2[:, 1] >= 0) & (d2[:, 1] >= e)
    return passed
