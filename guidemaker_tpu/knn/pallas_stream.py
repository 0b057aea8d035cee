"""Streaming fused kernel: grid over query tiles only, database tiles
double-buffer-DMA'd from HBM inside the kernel.

The first fused kernel (pallas_hamming.py) used a (q_tiles x db_tiles)
grid; at million-guide scale that is millions of grid steps and the fixed
per-step cost (~30 us observed) dominates everything.  Here the grid is
(q_tiles,) and the kernel owns the database loop:

  * the full database one-hot stays in HBM (ANY memory space);
  * two VMEM buffers double-buffer the db tiles: the DMA for tile j+1 is
    in flight while tile j is matmul'd and merged (guide pattern
    "Patterns: Double Buffering");
  * the running top-k is a fori carry in registers/VMEM, written to the
    output block once per query tile.

Merge semantics, packed keys, and padding behavior are identical to
pallas_hamming.py — the two kernels are cross-checked on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import IDX_BITS, INF_KEY, unpack_keys
from .pallas_hamming import (LANES, _onehot_on_device, _pad_code_rows,
                             bucket_rows, clamp_tiles)


def _stream_kernel(q_ref, db_hbm, out_ref, db_buf, sems, *,
                   k, length, db_tile, n_db_tiles):
    def get_dma(slot, j):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(j * db_tile, db_tile), :],
            db_buf.at[slot], sems.at[slot])

    get_dma(0, 0).start()
    q = q_ref[:]
    init = jnp.full((q.shape[0], k), INF_KEY, dtype=jnp.int32)

    def body(j, best):
        slot = j % 2

        @pl.when(j + 1 < n_db_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        matches = jnp.dot(q, db_buf[slot].T,
                          preferred_element_type=jnp.int32)
        dist = jnp.int32(length) - matches
        gidx = j * db_tile + jax.lax.broadcasted_iota(
            jnp.int32, dist.shape, dimension=1)
        keys = (dist << IDX_BITS) | gidx
        cand = jnp.concatenate([best, keys], axis=1)
        tops = []
        for s_ in range(k):
            m = jnp.min(cand, axis=1)
            tops.append(m)
            if s_ + 1 < k:  # no need to mask after the final extraction
                cand = jnp.where(cand == m[:, None], INF_KEY, cand)
        return jnp.stack(tops, axis=1)

    best = jax.lax.fori_loop(0, n_db_tiles, body, init)
    pad = jnp.full((best.shape[0], LANES - k), INF_KEY, dtype=jnp.int32)
    out_ref[:] = jnp.concatenate([best, pad], axis=1)


#: VMEM budget for the in-kernel merge: each of the k unrolled
#: min-extraction rounds materializes a (q_tile, db_tile + k) i32
#: candidate buffer; k * (db_tile + LANES) beyond ~50k elements
#: (k=16 x db_tile 8192 observed) overflows VMEM and faults the kernel.
#: k=3..5 at db_tile 8192 (the measured hot path) stays untouched.
_MERGE_BUDGET = 49152


def _merge_safe_db_tile(k: int, db_tile: int) -> int:
    while db_tile > 128 and k * (db_tile + LANES) > _MERGE_BUDGET:
        db_tile //= 2
    return db_tile


@functools.partial(jax.jit,
                   static_argnames=("k", "length", "q_tile", "db_tile",
                                    "interpret"))
def _stream_topk(q_oh, db_oh, *, k, length, q_tile, db_tile,
                 interpret=False):
    nq, feat = q_oh.shape
    nd = db_oh.shape[0]
    # db rows are padded to a multiple of the requested db_tile (a pow2),
    # so any pow2 shrink still divides them
    db_tile = _merge_safe_db_tile(k, db_tile)
    n_db_tiles = nd // db_tile
    kernel = functools.partial(_stream_kernel, k=k, length=length,
                               db_tile=db_tile, n_db_tiles=n_db_tiles)
    return pl.pallas_call(
        kernel,
        grid=(nq // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, db_tile, feat), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nd * feat,
            bytes_accessed=q_oh.size + db_oh.size * (nq // q_tile),
            transcendentals=0),
    )(q_oh, db_oh)


def _count_kernel(q_ref, db_hbm, out_ref, db_buf, sems, *,
                  length, editdist, db_tile, n_db_tiles):
    """Count database entries with distance < editdist per query.

    One VPU pass per (q, db) pair instead of the top-k merge's k passes:
    the distance-filter decision (core.py:509-522) only needs
    ``count(dist < editdist) <= 1`` when the query itself is in the
    (deduplicated) database — self is the unique dist-0 hit.  Padding
    rows (all-zero one-hot) have dist == length >= editdist, so they are
    never counted (the driver rejects editdist > length up front).
    """
    def get_dma(slot, j):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(j * db_tile, db_tile), :],
            db_buf.at[slot], sems.at[slot])

    get_dma(0, 0).start()
    q = q_ref[:]
    init = jnp.zeros((q.shape[0],), dtype=jnp.int32)
    # dist < editdist  <=>  matches > length - editdist
    thresh = jnp.int32(length - editdist)

    def body(j, cnt):
        slot = j % 2

        @pl.when(j + 1 < n_db_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        matches = jnp.dot(q, db_buf[slot].T,
                          preferred_element_type=jnp.int32)
        return cnt + jnp.sum((matches > thresh).astype(jnp.int32), axis=1)

    cnt = jax.lax.fori_loop(0, n_db_tiles, body, init)
    out_ref[:] = jnp.broadcast_to(cnt[:, None], out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("length", "editdist", "q_tile",
                                    "db_tile", "interpret"))
def _stream_count(q_oh, db_oh, *, length, editdist, q_tile, db_tile,
                  interpret=False):
    nq, feat = q_oh.shape
    nd = db_oh.shape[0]
    n_db_tiles = nd // db_tile
    kernel = functools.partial(_count_kernel, length=length,
                               editdist=editdist, db_tile=db_tile,
                               n_db_tiles=n_db_tiles)
    return pl.pallas_call(
        kernel,
        grid=(nq // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, feat), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, db_tile, feat), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nd * feat,
            bytes_accessed=q_oh.size + db_oh.size * (nq // q_tile),
            transcendentals=0),
    )(q_oh, db_oh)


def stream_count_device(q_codes: np.ndarray, db_dev, nd: int,
                        editdist: int, length: int, *, db_tile: int,
                        q_tile: int = 512, q_dev=None, nq: int = None,
                        interpret: bool = False) -> np.ndarray:
    """(nq,) int32 counts of database entries with dist < editdist.

    The count vector is almost entirely the self-hit value 1, so the
    device->host transfer compresses to nearly nothing — unlike top-k
    index matrices, which are incompressible.
    """
    if editdist > length:
        raise ValueError("editdist must be <= guide length for counting")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if q_dev is None:
        nq = q_codes.shape[0]
        q_tile = min(q_tile, max(8, 1 << int(nq - 1).bit_length()))
        q_tile, _ = clamp_tiles(q_tile, db_tile)
        q_dev = _onehot_on_device(jnp.asarray(
            _pad_code_rows(q_codes, bucket_rows(nq, q_tile))))
    else:
        # queries == database: reuse the resident one-hot (its padding
        # rows one-hot to zero -> count 0, sliced off below)
        q_tile, _ = clamp_tiles(q_tile, db_tile)
        assert nq is not None and q_dev.shape[0] % q_tile == 0
    counts = _stream_count(q_dev, db_dev, length=length, editdist=editdist,
                           q_tile=q_tile, db_tile=db_tile,
                           interpret=interpret)
    from ..util import fetch
    return fetch(counts[:nq, 0])


def stream_topk_device(q_codes: np.ndarray, db_dev, nd: int, k: int,
                       length: int, *, db_tile: int, q_tile: int = 512,
                       interpret: bool = False):
    """Streaming-kernel k-NN; contract matches pallas_topk_device."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    nq = q_codes.shape[0]
    k_eff = min(k, nd, LANES)
    q_tile = min(q_tile, max(8, 1 << int(nq - 1).bit_length()))
    q_tile, _ = clamp_tiles(q_tile, db_tile)
    q_dev = _onehot_on_device(jnp.asarray(
        _pad_code_rows(q_codes, bucket_rows(nq, q_tile))))
    keys = _stream_topk(q_dev, db_dev, k=k_eff, length=length,
                        q_tile=q_tile, db_tile=db_tile, interpret=interpret)
    from ..util import fetch
    out = fetch(keys[:nq, :k_eff])

    dist, idx = unpack_keys(out)
    bad = idx >= nd
    dist[bad] = -1
    idx[bad] = -1
    if k_eff < k:
        pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
        dist = np.concatenate([dist, pad], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return dist, idx
