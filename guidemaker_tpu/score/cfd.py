"""CFD off-target scoring (Doench et al. 2016 mismatch weights).

First-party equivalent of the reference's ``cfd_score_calculator.py`` plus
the ``cfd_score`` DataFrame wrapper (core.py:1129-1148).  The per-pair
``calc_cfd`` replicates the reference exactly, including its length-handling
rules (>20-mers: ignore the 5' overhang; <20-mers: score what's present;
cfd_score_calculator.py:81-84) and its intentional omission of the PAM term
(header comment, cfd_score_calculator.py:5-11).

A vectorized batch path (:func:`cfd_batch`) scores (guide, off-target) code
arrays against a dense (position, rna-base, dna-base) weight tensor — the
form used by the pipeline for large guide pools.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Dict, Tuple

import numpy as np

from .. import dna
from ..definitions import DATA_DIR

logger = logging.getLogger(__name__)

MODEL_META = os.path.join(DATA_DIR, "cfd_data.json")

_RNA_OF_CODE = "ACGU"  # code -> RNA letter (T->U)
#: DNA complement letter of an off-target base, as the reference computes it
#: (basecomp applied to the U-substituted off string, calc_cfd:79).
_BASECOMP = {"A": "T", "C": "G", "G": "C", "T": "A", "U": "A"}


def get_mm_pam_scores() -> Tuple[Dict, Dict]:
    """Load mismatch and PAM score tables (cfd_score_calculator.py:26-40)."""
    try:
        with open(MODEL_META) as dat:
            scores = json.load(dat)
        return scores["mm"], scores["pam"]
    except (FileNotFoundError, IOError):
        raise Exception(
            "Could not find file with reference mismatch scores and PAM scores")


def check_len(wt: str, off: str) -> int:
    wtl, offl = len(wt), len(off)
    assert wtl == offl, \
        "The lengths wt and off differ: wt = {}, off = {}".format(wtl, offl)
    return wtl


def calc_cfd(wt: str, off: str, mm_scores=None) -> float:
    """CFD score of one guide / off-target pair (no PAM term)."""
    guidelen = check_len(wt, off)
    if mm_scores is None:
        mm_scores, _ = get_mm_pam_scores()
    score = 1.0
    off = off.upper().replace("T", "U")
    wt = wt.upper().replace("T", "U")
    for i, sl in enumerate(off):
        if (guidelen - 20 - i) <= 0:
            if wt[i] != sl:
                key = ("r" + wt[i] + ":d" + _BASECOMP[sl] + ","
                       + str(20 + i + 1 - guidelen))
                score *= mm_scores[key]
    return score


# ---------------------------------------------------------------------------
# Vectorized batch scoring
# ---------------------------------------------------------------------------

_WEIGHTS_CACHE = {}


def weight_tensor(guidelen: int) -> np.ndarray:
    """Dense (guidelen, 4, 4) float64 tensor W[i, wt_code, off_code].

    W is the multiplicative CFD weight at guide position i when the guide
    (RNA) base has code ``wt`` and the off-target (DNA) base has code
    ``off``; 1.0 on matches and positions outside the scored 20-mer window.
    """
    if guidelen in _WEIGHTS_CACHE:
        return _WEIGHTS_CACHE[guidelen]
    mm_scores, _ = get_mm_pam_scores()
    w = np.ones((guidelen, 4, 4), dtype=np.float64)
    for i in range(guidelen):
        if (guidelen - 20 - i) > 0:
            continue  # 5' overhang beyond 20 nt is ignored
        pos = 20 + i + 1 - guidelen
        for wc in range(4):
            for oc in range(4):
                if wc == oc:
                    continue
                rna = _RNA_OF_CODE[wc]
                dnab = _BASECOMP[_RNA_OF_CODE[oc]]
                w[i, wc, oc] = mm_scores[f"r{rna}:d{dnab},{pos}"]
    _WEIGHTS_CACHE[guidelen] = w
    return w


def cfd_batch(wt_codes: np.ndarray, off_codes: np.ndarray) -> np.ndarray:
    """CFD scores for (n, L) guide and off-target code arrays -> (n,)."""
    n, L = wt_codes.shape
    w = weight_tensor(L)
    pos = np.arange(L)
    vals = w[pos[None, :], wt_codes.astype(np.int64), off_codes.astype(np.int64)]
    return vals.prod(axis=1)


def cfd_score(df):
    """Append 'CFD Similar Guides' and 'Max CFD' columns (core.py:1129-1148).

    'CFD Similar Guides' scores every listed similar guide (aligned with the
    'Similar guides' column, which leads with the self-hit at distance 0).
    'Max CFD' is taken over the *non-identical* neighbors only: with this
    package's corrected neighbor mapping the first listed guide is always
    the query itself (CFD 1.0 by definition), which would make a max over
    all entries meaningless.  (The reference maxed over all entries, but its
    'Similar guides' strings were scrambled by a set-ordering bug —
    core.py:446 vs core.py:513 — so the issue was latent there.)
    """
    # flatten every (guide, similar-guide) pair and score in one vectorized
    # pass (the reference loops pure Python per pair, core.py:1130-1137)
    guides = df["Guide sequence"].tolist()
    sim_lists = [s.split(";") for s in df["Similar guides"].tolist()]
    wt_rows, off_rows, row_of_pair = [], [], []
    for r, (g, sims) in enumerate(zip(guides, sim_lists)):
        for s in sims:
            wt_rows.append(g)
            off_rows.append(s)
            row_of_pair.append(r)
    if wt_rows:
        L = len(wt_rows[0])
        wt_codes = dna.encode_batch(wt_rows, L)
        off_codes = dna.encode_batch(off_rows, L)
        scores = cfd_batch(wt_codes, off_codes)
    else:
        scores = np.empty(0)

    per_row_scores: list = [[] for _ in range(len(df))]
    for r, s in zip(row_of_pair, scores.tolist()):
        per_row_scores[r].append(s)

    max_cfds = []
    for g, sims, vals in zip(guides, sim_lists, per_row_scores):
        offtarget = [v for s, v in zip(sims, vals) if s != g]
        max_cfds.append(max(offtarget) if offtarget else max(vals))

    df["CFD Similar Guides"] = [[str(v) for v in vals]
                                for vals in per_row_scores]
    df["Max CFD"] = max_cfds
    return df
