"""Fused Pallas TPU kernel: one-hot MXU matmul + in-VMEM exact top-k.

The pure-XLA path (hamming.py) materializes each (q_tile x db_tile)
distance block in HBM between the matmul and the top_k — at ~32 MB per
block that makes the scan HBM-bound (~10x off the MXU roofline).  This
kernel keeps the block in VMEM and merges it into the per-query running
top-k before anything leaves the chip:

  grid = (q_tiles, db_tiles), db dimension innermost and sequential;
  the output block for a query tile is revisited across db steps and acts
  as the running top-k accumulator (initialized at j == 0).

Top-k extraction uses k rounds of (min, mask-by-equality): packed
(dist << 24 | idx) keys are unique within a row, so masking the found
minimum by equality is exact and needs no scatter — everything stays in
VPU-friendly elementwise ops.  Distances never exist in HBM at all.

Padding rows (all-zero one-hot) produce distance == L with indices past
the true database size, so the packed-key ordering pushes them after any
real neighbor; the host driver slices/validates exactly like hamming.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import IDX_BITS, INF_KEY, _pad_rows, unpack_keys

LANES = 128  # output block lane width; top-k lives in the first k lanes

#: scoped-VMEM budget: the merge buffer is ~q_tile*(db_tile+LANES) int32
#: with ~1.2x compiler overhead; 16 MB scoped vmem => ~3.4M elements.
#: (empirical: q2048 x d4096 requested 39.9 MB and failed AOT compile.)
MAX_TILE_ELEMS = 3_000_000


def clamp_tiles(q_tile: int, db_tile: int):
    """Shrink tiles until the fused merge fits in scoped VMEM."""
    while q_tile * (db_tile + LANES) > MAX_TILE_ELEMS:
        if db_tile >= q_tile and db_tile > 128:
            db_tile //= 2
        elif q_tile > 8:
            q_tile //= 2
        else:
            break
    return q_tile, db_tile


def _kernel(q_ref, db_ref, out_ref, *, k: int, length: int, db_tile: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, INF_KEY)

    matches = jnp.dot(q_ref[:], db_ref[:].T,
                      preferred_element_type=jnp.int32)
    dist = jnp.int32(length) - matches
    gidx = j * db_tile + jax.lax.broadcasted_iota(
        jnp.int32, dist.shape, dimension=1)
    keys = (dist << IDX_BITS) | gidx

    cand = jnp.concatenate([out_ref[:, :k], keys], axis=1)
    tops = []
    for s_ in range(k):
        m = jnp.min(cand, axis=1)
        tops.append(m)
        # keys are unique per row -> equality masking removes exactly one
        if s_ + 1 < k:  # no mask needed after the final extraction
            cand = jnp.where(cand == m[:, None], INF_KEY, cand)
    topk = jnp.stack(tops, axis=1)
    pad = jnp.full((topk.shape[0], LANES - k), INF_KEY, dtype=jnp.int32)
    out_ref[:] = jnp.concatenate([topk, pad], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "length", "q_tile", "db_tile",
                                    "interpret"))
def _pallas_topk(q_oh, db_oh, *, k, length, q_tile, db_tile, interpret=False):
    nq, feat = q_oh.shape
    nd = db_oh.shape[0]
    grid = (nq // q_tile, nd // db_tile)
    kernel = functools.partial(_kernel, k=k, length=length, db_tile=db_tile)
    flops = 2 * nq * nd * feat
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, feat), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((db_tile, feat), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q_oh.size + db_oh.size,
            transcendentals=0),
        interpret=interpret,
    )(q_oh, db_oh)


def _pad_feat(onehot: np.ndarray) -> np.ndarray:
    """Pad the feature dim to the 128-lane boundary for clean MXU tiling."""
    feat_pad = -onehot.shape[1] % LANES
    if feat_pad:
        onehot = np.pad(onehot, ((0, 0), (0, feat_pad)))
    return onehot


@jax.jit
def _onehot_on_device(codes) -> jnp.ndarray:
    """(n, L) uint8 codes -> (n, ceil(4L/128)*128) int8 one-hot, on device.

    int8 runs the MXU at 2x bf16 rate on v5e (measured 1.15 vs 0.61
    T pairs/s) and halves HBM/VMEM/DMA traffic; 0/1 one-hot dot products
    are exact in int32 accumulation.

    Transfers 2-bit codes instead of the 16x larger one-hot matrix —
    host->device traffic is the scaling bottleneck for million-guide
    genomes.  Out-of-range codes (INVALID=4, also used for row padding)
    one-hot to all-zero, preserving the "padding never matches" invariant.
    """
    n, length = codes.shape
    oh = jax.nn.one_hot(codes, 4, dtype=jnp.int8).reshape(n, 4 * length)
    feat_pad = -(4 * length) % LANES
    if feat_pad:
        oh = jnp.pad(oh, ((0, 0), (0, feat_pad)))
    return oh


def bucket_rows(n: int, tile: int) -> int:
    """Row count padded to ``tile * next_pow2(n_tiles)``.

    Kernel grids (and therefore compiled programs) then come from a tiny
    logarithmic set of shapes instead of one per query-batch size — on
    tunneled TPU backends every novel shape costs a multi-second (worst
    observed: 78 s) compile+download stall, far more than the <=2x extra
    pair throughput the padding costs."""
    tiles = max(1, -(-n // tile))
    return tile * (1 << (tiles - 1).bit_length())


def _pad_code_rows(codes: np.ndarray, multiple: int) -> np.ndarray:
    pad = (-codes.shape[0]) % multiple
    if pad:
        codes = np.concatenate(
            [codes, np.full((pad, codes.shape[1]), 4, dtype=np.uint8)])
    return codes


def prepare_db_pallas(db_onehot: np.ndarray, db_tile: int):
    """Pad (rows + feature lanes) and transfer the database once."""
    return jnp.asarray(_pad_rows(_pad_feat(db_onehot), db_tile),
                       dtype=jnp.int8)


def prepare_db_codes(db_codes: np.ndarray, db_tile: int):
    """Like prepare_db_pallas but from uint8 codes (16x less transfer)."""
    return _onehot_on_device(
        jnp.asarray(_pad_code_rows(db_codes, db_tile)))


def pallas_topk_device(q_onehot: np.ndarray, db_dev, nd: int, k: int,
                       length: int, *, db_tile: int, q_tile: int = 512,
                       interpret: bool = False, q_codes: np.ndarray = None):
    """Fused-kernel k-NN against a device-resident padded database.

    Queries may be given as a one-hot matrix (``q_onehot``) or, cheaper,
    as uint8 codes (``q_codes``) one-hot-encoded on device.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # pallas TPU kernels run interpreted elsewhere
    nq = (q_codes if q_onehot is None else q_onehot).shape[0]
    k_eff = min(k, nd, LANES)
    q_tile = min(q_tile, max(8, 1 << int(nq - 1).bit_length()))
    q_tile, clamped_db = clamp_tiles(q_tile, db_tile)
    if clamped_db != db_tile:
        raise ValueError(
            f"db_tile {db_tile} with q_tile {q_tile} exceeds scoped VMEM; "
            f"prepare the database with db_tile <= {clamped_db}")
    rows = bucket_rows(nq, q_tile)   # pow2 grid: bounded program set
    if q_onehot is None:
        q_dev = _onehot_on_device(
            jnp.asarray(_pad_code_rows(q_codes, rows)))
    else:
        q_dev = jnp.asarray(_pad_rows(_pad_feat(q_onehot), rows),
                            dtype=jnp.int8)
    keys = _pallas_topk(
        q_dev, db_dev, k=k_eff, length=length, q_tile=q_tile,
        db_tile=db_tile, interpret=interpret)
    # slice on device: only (nq, k) ints cross the host link
    from ..util import fetch
    out = fetch(keys[:nq, :k_eff])

    dist, idx = unpack_keys(out)
    # entries pointing at padding rows are invalid (k > true db size)
    bad = idx >= nd
    dist[bad] = -1
    idx[bad] = -1
    if k_eff < k:
        pad = np.full((nq, k - k_eff), -1, dtype=np.int32)
        dist = np.concatenate([dist, pad], axis=1)
        idx = np.concatenate([idx, pad], axis=1)
    return dist, idx


def pallas_hamming_topk(q_onehot: np.ndarray, db_onehot: np.ndarray, k: int,
                        length: int, *, db_tile: int = 1024,
                        q_tile: int = 512, interpret: bool = False):
    """Exact k-NN with the fused kernel; contract matches hamming_topk."""
    nd = db_onehot.shape[0]
    db_tile = min(db_tile, max(128, 1 << int(nd - 1).bit_length()))
    q_tile, db_tile = clamp_tiles(q_tile, db_tile)
    db_dev = prepare_db_pallas(db_onehot, db_tile)
    return pallas_topk_device(q_onehot, db_dev, nd, k, length,
                              db_tile=db_tile, q_tile=q_tile,
                              interpret=interpret)
