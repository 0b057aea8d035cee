"""Packed-pair streaming kernels: two database guides per 128-lane row.

The one-hot int8 kernels (pallas_stream.py) spend 4L = 80 of 128 MXU
contraction lanes on real data — 48 lanes are padding, so the measured
rate saturates at ~71% of the int8 roofline *per pair*.  This module
recovers the padding by packing TWO database guides into each 128-lane
row using a rank-3 "tetrahedron" base encoding plus scale separation:

* each base maps to a vertex of the regular tetrahedron in {-1,+1}^3
  (A=(1,1,1), C=(1,-1,-1), G=(-1,1,-1), T=(-1,-1,1)); for two bases
  x, y the dot v_x . v_y is 3 if x == y else -1, so over L bases
  ``sum = 4*matches - L`` — equality counting needs only 3 lanes/base
  (the 4x4 identity has rank 4, but I + J/… shifted needs rank 3; the
  tetrahedron realizes it with exact +-1 integers);
* a database row holds ``[s * tetra(d_even) | tetra(d_odd) | 0-pad]``
  (3L + 3L <= 126 lanes for L <= 21) and a query row holds
  ``[tetra(q) | tetra(q) | 0-pad]``, so one int8 MXU dot yields
  ``v = s*A + B`` with ``A = 4*m_even - L`` and ``B = 4*m_odd - L``;
* with ``s = 4L + 1`` (81 for L=20; operands ``+-s`` fit int8) the pair
  ``(A, B)`` decodes exactly: ``A = floor((v + L + 0.5) / s)``,
  ``B = v - s*A``.  The +0.5 bias centers the quotient inside
  (A, A+1) with margin >= 0.5/s ~ 6e-3 on both sides, so a float32
  multiply-by-reciprocal (error <= a few ulp ~ 1e-5 at these
  magnitudes, all < 2^13) always floors to the exact A.

Effect: 64 MXU MACs and 64 DMA bytes per guide pair instead of 128 —
2x the pairs per second at the same MXU/HBM utilization, still exact
integer arithmetic end to end.  Applies to guide lengths <= 21 (the
CLI default is 20); longer guides fall back to the one-hot kernels.

Padding semantics: database pad slots decode to m = L/4 (pseudo-dist
3L/4), so both kernels mask by *global pair index* (>= nd) in-kernel —
unlike the one-hot kernels, where all-zero padding rows were
self-masking at distance L.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import IDX_BITS, INF_KEY, unpack_keys
from .pallas_hamming import LANES, _pad_code_rows, bucket_rows

#: max guide length for packed rows: 2 * 3L <= 128 lanes
MAX_PACKED_LEN = 21

#: tetrahedron vertices per code (A, C, G, T, invalid->0)
_TETRA = np.array([[1, 1, 1],
                   [1, -1, -1],
                   [-1, 1, -1],
                   [-1, -1, 1],
                   [0, 0, 0]], dtype=np.int8)


def pack_scale(length: int) -> int:
    """Scale separating the two packed sums: must exceed the 4L+1-wide
    range of ``4*m - L`` and keep ``+-s`` inside int8."""
    s = 4 * length + 1
    assert s <= 127, "packed encoding requires length <= 31"
    return s


@functools.partial(jax.jit, static_argnames=("length",))
def _tetra_rows(codes, *, length: int) -> jnp.ndarray:
    """(n, L) uint8 codes -> (n, 3L) int8 tetrahedron rows (invalid -> 0).

    Component-major lane order [x(L) | y(L) | z(L)]: any fixed lane
    permutation preserves the dot products as long as queries and the
    database share it, and per-component (5,)-table gathers keep every
    intermediate at (n, L) — an (n, L, 3) gather would be lane-padded
    3 -> 128 by the TPU layout (42x memory at genome scale).
    """
    idx = jnp.minimum(codes, 4).astype(jnp.int32)
    table = jnp.asarray(_TETRA)
    return jnp.concatenate(
        [jnp.take(table[:, c], idx) for c in range(3)], axis=1)


@functools.partial(jax.jit, static_argnames=("length",))
def _query_rows(codes, *, length: int) -> jnp.ndarray:
    """Query layout: [tetra | tetra | 0-pad] -> (n, 128) int8."""
    t = _tetra_rows(codes, length=length)
    pad = LANES - 6 * length
    return jnp.concatenate(
        [t, t, jnp.zeros((t.shape[0], pad), jnp.int8)], axis=1)


@functools.partial(jax.jit, static_argnames=("length",))
def _db_rows(codes_pairs, *, length: int) -> jnp.ndarray:
    """(2*n2, L) codes -> (n2, 128) packed db rows
    [s*tetra(even) | tetra(odd) | 0-pad]."""
    s = pack_scale(length)
    t = _tetra_rows(codes_pairs, length=length)
    even = (t[0::2] * np.int8(s)).astype(jnp.int8)
    odd = t[1::2]
    pad = LANES - 6 * length
    return jnp.concatenate(
        [even, odd, jnp.zeros((even.shape[0], pad), jnp.int8)], axis=1)


def prepare_db_packed(db_codes: np.ndarray, db_tile: int):
    """Pack + pad + transfer the database once: (nd2_padded, 128) int8,
    where row j holds guides 2j and 2j+1 (``db_tile`` counts packed
    rows, i.e. 2*db_tile guides per streamed tile)."""
    codes = _pad_code_rows(db_codes, 2 * db_tile)
    return _db_rows(jnp.asarray(codes), length=db_codes.shape[1])


def clamp_packed_tiles(q_tile: int, db_tile: int, *, merge: bool):
    """Packed-kernel VMEM budget: the top-k merge concatenates TWO key
    planes per db tile (width k + 2*db_tile), the count kernel only the
    (q_tile, db_tile) dot block."""
    from .pallas_hamming import MAX_TILE_ELEMS
    width = (2 * db_tile if merge else db_tile) + LANES
    while q_tile * width > MAX_TILE_ELEMS and q_tile > 8:
        q_tile //= 2
    return q_tile


def _count_kernel(q_ref, db_hbm, out_ref, db_buf, sems, *,
                  length, editdist, db_tile, n_db_tiles, nd):
    """Count db guides with dist < editdist per query, two guides/row.

    dist < e  <=>  matches > L - e  <=>  (4m - L) > 3L - 4e.
    """
    def get_dma(slot, j):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(j * db_tile, db_tile), :],
            db_buf.at[slot], sems.at[slot])

    get_dma(0, 0).start()
    q = q_ref[:]
    init = jnp.zeros((q.shape[0],), dtype=jnp.int32)
    thresh = jnp.int32(3 * length - 4 * editdist)
    s = pack_scale(length)

    def body(j, cnt):
        slot = j % 2

        @pl.when(j + 1 < n_db_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        v = jnp.dot(q, db_buf[slot].T, preferred_element_type=jnp.int32)
        # A > T  <=>  v >= s*(T+1) - L  (B in [-L, 3L] can't bridge the
        # s - (4L+1) + 1 = 1 gap)
        hit_e = v >= jnp.int32(s * (thresh + 1) - length)
        # B > T via the exact biased float32 floor-decode (module doc)
        vl = (v + jnp.int32(length)).astype(jnp.float32) + jnp.float32(0.5)
        a = jnp.floor(vl * jnp.float32(1.0 / s)).astype(jnp.int32)
        b = v - jnp.int32(s) * a
        hit_o = b > thresh
        # mask database pad slots by global pair index
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
        gidx_e = 2 * (j * db_tile + col)
        real_e = gidx_e < nd
        real_o = gidx_e + 1 < nd
        add = ((hit_e & real_e).astype(jnp.int32)
               + (hit_o & real_o).astype(jnp.int32))
        return cnt + jnp.sum(add, axis=1)

    cnt = jax.lax.fori_loop(0, n_db_tiles, body, init)
    out_ref[:] = jnp.broadcast_to(cnt[:, None], out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("length", "editdist", "q_tile",
                                    "db_tile", "nd", "interpret"))
def _packed_count(q_rows, db_rows, *, length, editdist, q_tile, db_tile,
                  nd, interpret=False):
    nq = q_rows.shape[0]
    n_db_tiles = db_rows.shape[0] // db_tile
    kernel = functools.partial(_count_kernel, length=length,
                               editdist=editdist, db_tile=db_tile,
                               n_db_tiles=n_db_tiles, nd=nd)
    return pl.pallas_call(
        kernel,
        grid=(nq // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, db_tile, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * db_rows.shape[0] * LANES,
            bytes_accessed=q_rows.size + db_rows.size * (nq // q_tile),
            transcendentals=0),
    )(q_rows, db_rows)


def _topk_kernel(q_ref, db_hbm, out_ref, db_buf, sems, *,
                 k, length, db_tile, n_db_tiles, nd):
    """Running top-k with two (dist, idx) candidates per output element."""
    def get_dma(slot, j):
        return pltpu.make_async_copy(
            db_hbm.at[pl.ds(j * db_tile, db_tile), :],
            db_buf.at[slot], sems.at[slot])

    get_dma(0, 0).start()
    q = q_ref[:]
    init = jnp.full((q.shape[0], k), INF_KEY, dtype=jnp.int32)
    s = pack_scale(length)
    three_l = jnp.int32(3 * length)

    def body(j, best):
        slot = j % 2

        @pl.when(j + 1 < n_db_tiles)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        v = jnp.dot(q, db_buf[slot].T, preferred_element_type=jnp.int32)
        vl = (v + jnp.int32(length)).astype(jnp.float32) + jnp.float32(0.5)
        a = jnp.floor(vl * jnp.float32(1.0 / s)).astype(jnp.int32)
        b = v - jnp.int32(s) * a
        dist_e = (three_l - a) >> 2                 # (3L - A)/4, exact
        dist_o = (three_l - b) >> 2
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=1)
        gidx_e = 2 * (j * db_tile + col)
        gidx_o = gidx_e + 1
        keys_e = jnp.where(gidx_e < nd,
                           (dist_e << IDX_BITS) | gidx_e, INF_KEY)
        keys_o = jnp.where(gidx_o < nd,
                           (dist_o << IDX_BITS) | gidx_o, INF_KEY)
        cand = jnp.concatenate([best, keys_e, keys_o], axis=1)
        tops = []
        for s_ in range(k):
            m = jnp.min(cand, axis=1)
            tops.append(m)
            if s_ + 1 < k:
                cand = jnp.where(cand == m[:, None], INF_KEY, cand)
        return jnp.stack(tops, axis=1)

    best = jax.lax.fori_loop(0, n_db_tiles, body, init)
    pad = jnp.full((best.shape[0], LANES - k), INF_KEY, dtype=jnp.int32)
    out_ref[:] = jnp.concatenate([best, pad], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "length", "q_tile", "db_tile",
                                    "nd", "interpret"))
def _packed_topk(q_rows, db_rows, *, k, length, q_tile, db_tile, nd,
                 interpret=False):
    nq = q_rows.shape[0]
    n_db_tiles = db_rows.shape[0] // db_tile
    kernel = functools.partial(_topk_kernel, k=k, length=length,
                               db_tile=db_tile, n_db_tiles=n_db_tiles,
                               nd=nd)
    return pl.pallas_call(
        kernel,
        grid=(nq // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, db_tile, LANES), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * db_rows.shape[0] * LANES,
            bytes_accessed=q_rows.size + db_rows.size * (nq // q_tile),
            transcendentals=0),
    )(q_rows, db_rows)


def packed_count_device(q_codes, db_dev, nd: int, editdist: int,
                        length: int, *, db_tile: int, q_tile: int = 512,
                        q_dev=None, nq: int = None,
                        interpret: bool = False) -> np.ndarray:
    """(nq,) int32 counts of db guides with dist < editdist (packed db).

    ``q_dev`` may pass pre-built query rows (queries == database runs
    reuse nothing here — query and db layouts differ — but callers may
    cache query rows across calls).
    """
    if editdist > length:
        raise ValueError("editdist must be <= guide length for counting")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if q_dev is None:
        nq = q_codes.shape[0]
        q_tile = clamp_packed_tiles(
            min(q_tile, max(8, 1 << int(nq - 1).bit_length())), db_tile,
            merge=False)
        q_dev = _query_rows(
            jnp.asarray(_pad_code_rows(q_codes, bucket_rows(nq, q_tile))),
            length=length)
    else:
        q_tile = clamp_packed_tiles(q_tile, db_tile, merge=False)
        assert nq is not None and q_dev.shape[0] % q_tile == 0
    counts = _packed_count(q_dev, db_dev, length=length, editdist=editdist,
                           q_tile=q_tile, db_tile=db_tile, nd=nd,
                           interpret=interpret)
    from ..util import fetch
    return fetch(counts[:nq, 0])


def packed_topk_device(q_codes: np.ndarray, db_dev, nd: int, k: int,
                       length: int, *, db_tile: int, q_tile: int = 512,
                       interpret: bool = False):
    """Packed-database k-NN; contract matches stream_topk_device."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    nq = q_codes.shape[0]
    k_eff = min(k, nd, LANES)
    q_tile = clamp_packed_tiles(
        min(q_tile, max(8, 1 << int(nq - 1).bit_length())), db_tile,
        merge=True)
    q_dev = _query_rows(
        jnp.asarray(_pad_code_rows(q_codes, bucket_rows(nq, q_tile))),
        length=length)
    keys = _packed_topk(q_dev, db_dev, k=k_eff, length=length,
                        q_tile=q_tile, db_tile=db_tile, nd=nd,
                        interpret=interpret)
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
