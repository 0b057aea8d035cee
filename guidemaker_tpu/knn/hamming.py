"""Exact Hamming k-NN as tiled MXU matmuls with a fused running top-k.

Design (TPU-first, not a port):

The Hamming distance between two equal-length ACGT guides is
``L - matches``, and ``matches`` is the inner product of their one-hot
encodings.  So the all-pairs distance computation is a matmul of
``(nq, 4L) @ (4L, nd)`` one-hot matrices — exactly the shape the MXU wants
(bf16 inputs, f32 accumulation; 0/1 values and sums <= 30 are exact in bf16).

To avoid materializing the ``nq x nd`` matrix, the database is processed in
tiles under ``lax.scan``; each tile's distances are packed with their global
database index into a single int32 sort key ``(dist << 24) | idx`` and merged
into a per-query running top-k via ``lax.top_k``.  The key packing gives
deterministic ascending-(distance, index) ordering — replicating the
reference's "hit 0 is self" semantics (core.py:502-523) without its
nondeterministic ``set()`` ordering.

This module is pure JAX and runs on TPU and CPU (tests) unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: bits reserved for the database index inside the packed int32 sort key.
IDX_BITS = 24
IDX_MASK = (1 << IDX_BITS) - 1
#: sentinel key larger than any real (dist, idx) pair.
INF_KEY = np.int32(1 << 30)

MAX_DB = 1 << IDX_BITS  # 16.7M guides per shard; shard beyond this.


def pack_keys(dist: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(distance, db index) -> single int32 ascending sort key."""
    return (dist.astype(jnp.int32) << IDX_BITS) | idx.astype(jnp.int32)


def unpack_keys(keys: np.ndarray):
    """Packed keys -> (dist, idx); sentinel keys -> (-1, -1)."""
    from ..util import fetch
    keys = fetch(keys)
    invalid = keys >= INF_KEY
    dist = (keys >> IDX_BITS).astype(np.int32)
    idx = (keys & IDX_MASK).astype(np.int32)
    dist[invalid] = -1
    idx[invalid] = -1
    return dist, idx


def _merge_topk(best: jnp.ndarray, cand_keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Merge candidate keys into the running per-row top-k (smallest keys)."""
    allk = jnp.concatenate([best, cand_keys], axis=1)
    neg_top, _ = jax.lax.top_k(-allk, k)
    return -neg_top


def _topk_tiles_body(q_oh, db_oh, db_n, idx_offset, *, k, length, db_tile):
    """Running top-k of packed keys for one query block over all db tiles.

    Args:
      q_oh: (tq, 4L) one-hot queries (bf16).
      db_oh: (nd_pad, 4L) one-hot database, nd_pad % db_tile == 0 (bf16).
      db_n: scalar int32, number of valid database rows.
      idx_offset: scalar int32 added to local indices (global shard offset).
    Returns:
      (tq, k) int32 packed keys, ascending.
    """
    nd_pad = db_oh.shape[0]
    n_tiles = nd_pad // db_tile
    tq = q_oh.shape[0]
    init = jnp.full((tq, k), INF_KEY, dtype=jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, db_tile), 1)

    def body(best, t):
        tile = jax.lax.dynamic_slice_in_dim(db_oh, t * db_tile, db_tile)
        matches = jnp.dot(q_oh, tile.T, preferred_element_type=jnp.float32)
        dist = (jnp.float32(length) - matches).astype(jnp.int32)
        gidx = t * db_tile + lane
        keys = jnp.where(gidx < db_n,
                         pack_keys(dist, gidx + idx_offset),
                         INF_KEY)
        return _merge_topk(best, keys, k), None

    best, _ = jax.lax.scan(body, init, jnp.arange(n_tiles, dtype=jnp.int32))
    return best


_topk_tiles = jax.jit(_topk_tiles_body,
                      static_argnames=("k", "length", "db_tile"))


@functools.partial(jax.jit,
                   static_argnames=("k", "length", "db_tile", "q_tile"))
def _topk_all(q_pad, db_oh, db_n, idx_offset, *, k, length, db_tile, q_tile):
    """All query tiles in ONE dispatch (lax.map over query blocks).

    A single device call matters twice: dispatch/transfer overhead is paid
    once, and XLA pipelines the per-tile scans.
    """
    nq_pad, feat = q_pad.shape
    tiles = q_pad.reshape(nq_pad // q_tile, q_tile, feat)
    out = jax.lax.map(
        lambda q: _topk_tiles_body(q, db_oh, db_n, idx_offset,
                                   k=k, length=length, db_tile=db_tile),
        tiles)
    return out.reshape(nq_pad, k)


@functools.partial(jax.jit,
                   static_argnames=("editdist", "length", "db_tile",
                                    "q_tile"))
def _count_all(q_pad, db_oh, db_n, *, editdist, length, db_tile, q_tile):
    """count(dist < editdist) per query, all query tiles in one dispatch.

    XLA twin of the Pallas counting kernel (pallas_stream._count_kernel):
    used by backends without Pallas TPU lowering.  Padding query rows
    (all-zero one-hot) produce garbage counts that callers slice off;
    padding db rows are masked by ``db_n``.
    """
    nq_pad, feat = q_pad.shape
    n_tiles = db_oh.shape[0] // db_tile
    thresh = jnp.float32(length - editdist)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, db_tile), 1)
    tiles = q_pad.reshape(nq_pad // q_tile, q_tile, feat)

    def one(q):
        def body(cnt, t):
            tile = jax.lax.dynamic_slice_in_dim(db_oh, t * db_tile, db_tile)
            matches = jnp.dot(q, tile.T, preferred_element_type=jnp.float32)
            hit = (matches > thresh) & (t * db_tile + lane < db_n)
            return cnt + jnp.sum(hit.astype(jnp.int32), axis=1), None

        cnt, _ = jax.lax.scan(body, jnp.zeros((q_tile,), jnp.int32),
                              jnp.arange(n_tiles, dtype=jnp.int32))
        return cnt

    return jax.lax.map(one, tiles).reshape(nq_pad)


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    n = arr.shape[0]
    pad = (-n) % multiple
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)])
    return arr


def fit_tile(requested: int, n: int, floor: int = 256) -> int:
    """Shrink a tile to the next power of two covering n (min ``floor``)."""
    return min(requested, max(floor, 1 << (int(n - 1).bit_length())))


def prepare_db(db_onehot: np.ndarray, db_tile: int):
    """Pad + transfer the database one-hot matrix once (device-resident)."""
    return jnp.asarray(_pad_rows(db_onehot, db_tile), dtype=jnp.bfloat16)


def hamming_topk_device(q_onehot: np.ndarray, db_dev, nd: int, k: int,
                        length: int, *, db_tile: int, q_tile: int = 2048,
                        idx_offset: int = 0):
    """Exact k-NN against an already device-resident padded database.

    ONE device dispatch for all queries (lax.map over query tiles inside
    jit) — dispatch/transfer overhead is paid once per query batch, which
    dominates wall time on tunneled/remote TPU backends.
    """
    nq = q_onehot.shape[0]
    k_eff = min(k, nd)
    q_tile = fit_tile(q_tile, nq)
    q_dev = jnp.asarray(_pad_rows(q_onehot, q_tile), dtype=jnp.bfloat16)
    keys = _topk_all(q_dev, db_dev, jnp.int32(nd), jnp.int32(idx_offset),
                     k=k_eff, length=length, db_tile=db_tile, q_tile=q_tile)
    from ..util import fetch
    out = fetch(keys)[:nq]

    dist, idx = unpack_keys(out)
    if k_eff < k:
        pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
        dist = np.concatenate([dist, pad], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return dist, idx


def hamming_topk(q_onehot: np.ndarray, db_onehot: np.ndarray, k: int,
                 length: int, *, db_tile: int = 8192, q_tile: int = 2048,
                 idx_offset: int = 0):
    """Exact k smallest Hamming distances of every query against the database.

    Returns:
      (dists, idx): two (nq, k) int32 arrays, ascending by (dist, idx).
      Entries beyond the database size are (-1, -1).
    """
    nd = db_onehot.shape[0]
    if nd > MAX_DB:
        raise ValueError(f"database shard too large ({nd} > {MAX_DB}); shard it")
    db_tile = fit_tile(db_tile, nd)
    db_dev = prepare_db(db_onehot, db_tile)
    return hamming_topk_device(q_onehot, db_dev, nd, k, length,
                               db_tile=db_tile, q_tile=q_tile,
                               idx_offset=idx_offset)
