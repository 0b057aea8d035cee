"""Doench 2016 on-target efficiency scoring (TreeEnsemble in JAX).

Replaces the reference's onnxruntime session (doench_predict.py:83-131) with
a batched gather-based descent over the gradient-boosted trees extracted
from the same model format: at each of ``max_depth`` steps every (sequence,
tree) pair advances one level — no data-dependent control flow, static
shapes, runs under ``jit`` on TPU or CPU.

Bit-compatibility: thresholds are compared in float32 against the float32
cast of the float64 feature matrix, and per-tree leaf weights are summed
sequentially in float32 in tree order — matching onnxruntime's accumulation
(validated against the reference's golden scores,
``/root/reference/tests/test_core.py:259-263``).
"""
from __future__ import annotations

import functools
import json
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..definitions import DATA_DIR
from .doench_features import featurize
from .onnx_tree import TreeEnsemble, parse_tree_ensemble

logger = logging.getLogger(__name__)

MODEL = os.path.join(DATA_DIR, "doench_v3_trees.npz")
MODEL_META = os.path.join(DATA_DIR, "doench_v3_options.json")

_ENSEMBLE_CACHE = {}


def load_ensemble(model_file: Optional[str] = None) -> TreeEnsemble:
    """Load a tree ensemble from our .npz or directly from a .onnx file."""
    path = model_file or MODEL
    if path not in _ENSEMBLE_CACHE:
        if path.endswith(".onnx"):
            ens = TreeEnsemble.from_attrs(parse_tree_ensemble(path))
        else:
            ens = TreeEnsemble.load_npz(path)
        _ENSEMBLE_CACHE[path] = ens
    return _ENSEMBLE_CACHE[path]


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _tree_leaf_weights(x, feature, threshold, children, is_leaf, value,
                       *, max_depth: int):
    """Per-(sequence, tree) leaf weight after descending the trees.

    x: (B, F) float32; tree arrays as in TreeEnsemble -> (B, T) float32.
    """
    n_trees = feature.shape[0]
    batch = x.shape[0]
    node = jnp.zeros((batch, n_trees), dtype=jnp.int32)
    tree_ix = jnp.arange(n_trees)[None, :]
    for _ in range(max_depth):
        feat = feature[tree_ix, node]                       # (B, T)
        thr = threshold[tree_ix, node]
        leaf = is_leaf[tree_ix, node]
        xv = jnp.take_along_axis(x, feat.reshape(batch, -1), axis=1)
        go_true = xv <= thr
        nxt = jnp.where(go_true, children[tree_ix, node, 0],
                        children[tree_ix, node, 1])
        node = jnp.where(leaf, node, nxt)
    return value[tree_ix, node]


@functools.partial(jax.jit, static_argnames=("max_depth", "wide_ids"))
def _tree_leaf_nodes(x, feature, threshold, children, is_leaf,
                     *, max_depth: int, wide_ids: bool = False):
    """Per-(sequence, tree) *leaf node id* after descending the trees.

    Returned as int8 when every node id fits (<128 nodes/tree — true for
    the bundled 15-node model), else int16 (``wide_ids``, chosen by the
    caller from ``feature.shape[1]``): the id matrix is small and
    low-entropy, so the device→host transfer is cheap even through
    tunneled transports, unlike the float32 leaf value matrix.  The host
    maps ids to values and accumulates in exact tree order.
    """
    n_trees = feature.shape[0]
    batch = x.shape[0]
    node = jnp.zeros((batch, n_trees), dtype=jnp.int32)
    tree_ix = jnp.arange(n_trees)[None, :]
    for _ in range(max_depth):
        feat = feature[tree_ix, node]                       # (B, T)
        thr = threshold[tree_ix, node]
        leaf = is_leaf[tree_ix, node]
        xv = jnp.take_along_axis(x, feat.reshape(batch, -1), axis=1)
        go_true = xv <= thr
        nxt = jnp.where(go_true, children[tree_ix, node, 0],
                        children[tree_ix, node, 1])
        node = jnp.where(leaf, node, nxt)
    return node.astype(jnp.int16 if wide_ids else jnp.int8)


@functools.partial(jax.jit, static_argnames=("max_depth", "wide_ids"))
def _tree_leaf_nodes_split(x_u8, x_f32, col_perm, feature, threshold,
                           children, is_leaf, *, max_depth: int,
                           wide_ids: bool = False):
    """`_tree_leaf_nodes` over a compactly-transferred feature matrix:
    integer-valued columns ship as uint8 (low-entropy, 4x smaller) and the
    remaining float columns as float32; `col_perm` restores column order.
    uint8→float32 conversion is exact, so descent results are unchanged."""
    x = jnp.concatenate(
        [x_u8.astype(jnp.float32), x_f32], axis=1)[:, col_perm]
    return _tree_leaf_nodes.__wrapped__(
        x, feature, threshold, children, is_leaf, max_depth=max_depth,
        wide_ids=wide_ids)


#: batch tile for tree descent: fixed shapes make the (slow, remote)
#: XLA compile a one-time cost shared by every genome via the persistent
#: compilation cache
BATCH_TILE = 32768


def ensemble_predict(ens: TreeEnsemble, features: np.ndarray,
                     int_col: Optional[np.ndarray] = None) -> np.ndarray:
    """Evaluate the ensemble; returns (B, 1) float32 like onnxruntime.

    ``int_col`` (bool per column) marks columns exactly representable as
    uint8; when the caller knows the feature layout (``predict`` passes
    ``doench_features.INT_FEATURE_MASK``) this skips a full verification
    pass over the feature matrix.
    """
    f32 = np.ascontiguousarray(features, dtype=np.float32)
    n = f32.shape[0]
    if n == 0:
        return np.zeros((0, 1), dtype=np.float32)
    # node ids ship as int8 only when they cannot wrap (>127-node trees
    # from arbitrary user .onnx files fall back to int16)
    wide_ids = ens.feature.shape[1] > 127

    # column split: small-integer columns travel as uint8
    if int_col is None:
        as_u8 = f32.astype(np.uint8)
        int_col = (as_u8.astype(np.float32) == f32).all(axis=0)
        u8_full = as_u8
    else:
        int_col = np.asarray(int_col, dtype=bool)
        u8_full = None
    u8_cols = np.flatnonzero(int_col)
    f_cols = np.flatnonzero(~int_col)
    order = np.concatenate([u8_cols, f_cols])
    col_perm = jnp.asarray(np.argsort(order).astype(np.int32))
    if u8_full is not None:
        u8_block = np.ascontiguousarray(u8_full[:, u8_cols])
    else:
        u8_block = f32[:, u8_cols].astype(np.uint8)
    f_block = np.ascontiguousarray(f32[:, f_cols])

    tree_args = (jnp.asarray(ens.feature), jnp.asarray(ens.threshold),
                 jnp.asarray(ens.children), jnp.asarray(ens.is_leaf))
    n_trees = ens.feature.shape[0]

    tile = BATCH_TILE if n > BATCH_TILE else max(
        8, 1 << int(n - 1).bit_length())
    chunks = []
    for lo in range(0, n, tile):
        hi = min(lo + tile, n)
        u8c = u8_block[lo:hi]
        fc = f_block[lo:hi]
        if hi - lo < tile:  # pad the tail chunk to the compiled shape
            pad = tile - (hi - lo)
            u8c = np.pad(u8c, ((0, pad), (0, 0)))
            fc = np.pad(fc, ((0, pad), (0, 0)))
        chunks.append(_tree_leaf_nodes_split(
            jnp.asarray(u8c), jnp.asarray(fc), col_perm, *tree_args,
            max_depth=ens.max_depth, wide_ids=wide_ids))
    nodes = np.concatenate([np.asarray(c) for c in chunks],
                           axis=0)[:n].astype(np.intp)       # (B, T)
    w = ens.value[np.arange(n_trees)[None, :], nodes]        # (B, T) f32
    # sequential float32 accumulation in tree order (onnxruntime-compatible)
    score = np.zeros(n, dtype=np.float32)
    for t in range(n_trees):
        score += w[:, t]
    score += np.float32(ens.base_value)
    return score[:, None]


def predict(seq: np.ndarray, model_file: Optional[str] = None,
            model_metadata: Optional[str] = None, pam_audit: bool = True,
            length_audit: bool = False, num_threads: int = 1) -> np.ndarray:
    """Predict Doench-2016 regression scores for 30-mer sequences.

    Signature-compatible with the reference's ``doench_predict.predict``
    (doench_predict.py:83-131).  ``model_file`` may be our ``.npz`` or an
    skl2onnx ``.onnx`` TreeEnsembleRegressor.  ``num_threads`` is accepted
    for compatibility (featurization is vectorized, no process pool).
    """
    if not isinstance(seq, np.ndarray):
        raise AssertionError("Please ensure seq is a numpy array")
    if len(seq) == 0 or len(seq[0]) <= 0:
        raise AssertionError("Make sure that seq is not empty")
    if not isinstance(seq[0], str):
        raise AssertionError(
            "Please ensure input sequences are in string format, i.e. 'AGAG' "
            "rather than ['A' 'G' 'A' 'G'] or alternate representations")
    if model_metadata is not None:
        with open(model_metadata) as f:
            json.load(f)  # accepted for API parity; all feature sets are built
    ens = load_ensemble(model_file)
    feats = featurize(list(seq), pam_audit=pam_audit)
    from .doench_features import INT_FEATURE_MASK
    return ensemble_predict(ens, feats, int_col=INT_FEATURE_MASK)


def get_doench_efficiency_score(df, pam_orientation, num_threads=1):
    """Append the ``Efficiency`` column (reference core.py:1152-1166).

    Replicates the reference's gating quirks verbatim: requires 3prime PAM
    orientation and the PAM set to equal exactly {AGG, CGG, TGG, GGG}; drops
    guides with N in the 30-mer context before scoring.
    """
    checkset = {"AGG", "CGG", "TGG", "GGG"}
    df2 = df[-df.target_seq30.str.contains("N")]
    if len(df) != len(df2):
        logger.warning(
            "%d guides were removed from consideration because there were N's "
            "in the region flanking the PAM site. These cannot be scored.",
            len(df) - len(df2))
    if pam_orientation == "3prime" and set(df2.PAM) == checkset:
        doenchscore = predict(
            np.array([x.upper() for x in df2.target_seq30]),
            num_threads=num_threads)
        df2["Efficiency"] = doenchscore.ravel()
    else:
        logger.warning(
            "NOTE: doench_efficiency_score based on Doench et al. 2016 - can "
            "only be used for NGG PAM). Check PAM sequence and PAM orientation")
        df2["Efficiency"] = "Not Available"
    return df2.drop("target_seq30", axis=1)
