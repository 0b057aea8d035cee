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


def leven_topk(q_codes: np.ndarray, db_codes: np.ndarray, k: int, *,
               db_tile: int = 1024, q_tile: int = 512, idx_offset: int = 0):
    """Exact k smallest Levenshtein distances per query (see hamming_topk).

    Queries run in host-side blocks (the Levenshtein path trades a few
    dispatches for a much lighter compile than a fully-nested scan).
    """
    nq, nd = q_codes.shape[0], db_codes.shape[0]
    length = q_codes.shape[1]
    k_eff = min(k, nd)
    db_tile = min(db_tile, max(128, 1 << (int(nd - 1).bit_length())))
    q_tile = min(q_tile, max(128, 1 << (int(nq - 1).bit_length())))

    db_dev = jnp.asarray(_pad_rows(db_codes, db_tile))
    q_pad = _pad_rows(q_codes, q_tile)
    out = np.empty((q_pad.shape[0], k_eff), dtype=np.int32)
    for i in range(0, q_pad.shape[0], q_tile):
        keys = _topk_tiles_leven(jnp.asarray(q_pad[i:i + q_tile]), db_dev,
                                 jnp.int32(nd), jnp.int32(idx_offset),
                                 k=k_eff, length=length, db_tile=db_tile)
        out[i:i + q_tile] = fetch(keys)
    out = out[:nq]

    dist, idx = unpack_keys(out)
    if k_eff < k:
        pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
        dist = np.concatenate([dist, pad], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return dist, idx
