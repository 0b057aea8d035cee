"""Nearest-feature interval join: first-party replacement for
``bedtools closest`` as the reference invokes it
(``/root/reference/guidemaker/core.py:831-839``).

Implements exactly the semantics of::

    mapbed.closest(featurebed, d=True, fd=True, D="a", t="first")  # downstream
    mapbed.closest(featurebed, d=True, id=True, D="a", t="first")  # upstream

with sorted inputs, i.e. for every guide interval (A) report the closest
eligible feature (B), where

* ``-fd`` (force downstream) admits only *strictly downstream* features —
  an overlapping feature is neither upstream nor downstream, so it is
  skipped (this is what makes the reference's up/down row sets disjoint);
* ``-id`` (ignore downstream) admits overlapping (distance 0) and strictly
  upstream features;
* bookended intervals (``b.start == a.end``) have distance 1 (bedtools
  convention), overlap is 0;
* sign per ``-D a`` (downstream positive, upstream negative, w.r.t. A's
  strand: "downstream" of a minus-strand guide is the lower-coordinate side);
* ties broken by first B record in sorted file order (``-t first``);
* a null row (".", -1, -1, ".", ".", distance -1) when no candidate exists.

The join is O((n+m) log m) numpy ``searchsorted`` work per chromosome —
no subprocess, no temp files, trivially exact.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd


def _prep_features(fdf: pd.DataFrame):
    """Per-chrom arrays sorted by (start, end, file order) + search helpers."""
    out: Dict[str, dict] = {}
    for chrom, grp in fdf.groupby("chrom", observed=True, sort=False):
        fs = grp["chromStart"].to_numpy(dtype=np.int64)
        fe = grp["chromEnd"].to_numpy(dtype=np.int64)
        order = np.lexsort((np.arange(len(grp)), fe, fs))
        fs, fe = fs[order], fe[order]
        names = grp["name"].to_numpy()[order]
        strands = grp["strand"].to_numpy()[order]
        prefmax = np.maximum.accumulate(fe)
        # ends-sorted view for left-nearest lookups
        e_order = np.lexsort((np.arange(fs.shape[0]), fe))
        fe_sorted = fe[e_order]
        # first position of each equal-end run (for -t first tie-breaks)
        first_same_end = np.searchsorted(fe_sorted, fe_sorted, side="left")
        out[str(chrom)] = dict(fs=fs, fe=fe, names=names, strands=strands,
                               prefmax=prefmax, e_order=e_order,
                               fe_sorted=fe_sorted,
                               first_same_end=first_same_end)
    return out


def closest_join_arrays(guides: pd.DataFrame, features: pd.DataFrame,
                        direction: str) -> dict:
    """One bedtools-closest pass; ``direction`` is "downstream" or "upstream".

    ``guides``: chrom, chromstart, chromend, name, strand (+/-).
    ``features``: chrom, chromStart, chromEnd, name, strand.
    Returns the 11 result columns (0..10) as a dict of numpy arrays —
    callers assemble DataFrames themselves (constructing string-backed
    pandas columns is the dominant cost at genome scale, so it is done
    once, not per pass).
    """
    assert direction in ("upstream", "downstream")
    return closest_join_raw(
        guides["chrom"].to_numpy(),
        guides["chromstart"].to_numpy(dtype=np.int64),
        guides["chromend"].to_numpy(dtype=np.int64),
        guides["name"].to_numpy(),
        guides["strand"].to_numpy(),
        _prep_features(features), direction)


def closest_join_raw(g_chrom, g_start, g_end, g_name, g_strand,
                     feats: Dict[str, dict], direction: str) -> dict:
    """Array-level closest pass: guides as (sorted) numpy columns,
    features pre-prepared by :func:`_prep_features`."""
    want_down = direction == "downstream"
    n = g_chrom.shape[0]

    f_acc = np.full(n, ".", dtype=object)
    f_start = np.full(n, -1, dtype=np.int64)
    f_end = np.full(n, -1, dtype=np.int64)
    f_id = np.full(n, ".", dtype=object)
    f_strand = np.full(n, ".", dtype=object)
    f_dist = np.full(n, -1, dtype=np.int64)

    for chrom in pd.unique(pd.Series(g_chrom)):
        sel = np.nonzero(g_chrom == chrom)[0]
        fc = feats.get(str(chrom))
        if fc is None:
            continue
        fs, fe = fc["fs"], fc["fe"]
        nfeat = fs.shape[0]
        gs, ge = g_start[sel], g_end[sel]
        plus = g_strand[sel] == "+"

        # --- first overlapping feature (if any): distance 0
        j_ov = np.searchsorted(fc["prefmax"], gs, side="right")
        has_ov = (j_ov < nfeat) & (np.where(j_ov < nfeat, fs[np.minimum(j_ov, nfeat - 1)], np.iinfo(np.int64).max) < ge)

        # --- nearest non-overlapping feature on the right: fs >= ge
        j_r = np.searchsorted(fs, ge, side="left")
        has_r = j_r < nfeat
        dist_r = np.where(has_r, fs[np.minimum(j_r, nfeat - 1)] - ge + 1, -1)

        # --- nearest non-overlapping feature on the left: fe <= gs
        j_l_e = np.searchsorted(fc["fe_sorted"], gs, side="right") - 1
        has_l = j_l_e >= 0
        j_l_e_first = fc["first_same_end"][np.maximum(j_l_e, 0)]
        j_l = fc["e_order"][j_l_e_first]
        dist_l = np.where(has_l, gs - fc["fe_sorted"][np.maximum(j_l_e, 0)] + 1, -1)

        # pick side by direction x strand ("downstream" of + is the right side)
        use_right = plus == want_down
        has_side = np.where(use_right, has_r, has_l)
        j_side = np.where(use_right, np.minimum(j_r, nfeat - 1), j_l)
        dist_side = np.where(use_right, dist_r, dist_l)

        if want_down:
            # -fd: strictly downstream only; overlaps are skipped
            chosen_j, chosen_has, chosen_dist = j_side, has_side, dist_side
        else:
            # -id: overlap (0) wins, else strictly upstream (negative)
            chosen_j = np.where(has_ov, np.minimum(j_ov, nfeat - 1), j_side)
            chosen_has = has_ov | has_side
            chosen_dist = np.where(has_ov, 0, -dist_side)

        hit = sel[chosen_has]
        jj = chosen_j[chosen_has]
        f_acc[hit] = str(chrom)
        f_start[hit] = fs[jj]
        f_end[hit] = fe[jj]
        f_id[hit] = fc["names"][jj]
        f_strand[hit] = fc["strands"][jj]
        f_dist[hit] = chosen_dist[chosen_has]

    return {0: g_chrom, 1: g_start, 2: g_end, 3: g_name, 4: g_strand,
            5: f_acc, 6: f_start, 7: f_end, 8: f_id, 9: f_strand,
            10: f_dist}


def closest_join(guides: pd.DataFrame, features: pd.DataFrame,
                 direction: str) -> pd.DataFrame:
    """DataFrame form of :func:`closest_join_arrays`: one row per guide
    with 11 unnamed columns (0..10) matching the reference's
    ``to_dataframe(disable_auto_names=True, header=None)`` shape."""
    return pd.DataFrame(closest_join_arrays(guides, features, direction))
