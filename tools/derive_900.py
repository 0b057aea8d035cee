#!/usr/bin/env python
"""Derive the bedtools-closest semantics that produce the reference's
(900, 23) table on Carsonella ruddii (reference test_core.py:202-222).

The reference binary (pybedtools -> bedtools) cannot run here, so this
script searches the space of defensible `closest -fd/-id -D a -t first`
interpretations with a brute-force per-guide join (182 features x 3537
guides -- exhaustive, no index), runs each candidate through a verbatim
transcription of the reference's positional filter + format drops
(core.py:851-948), and reports every combination whose final row count
is exactly 900.

Semantic knobs searched:
  * down-pass admission: strictly-downstream | downstream-or-overlap |
    all-candidates (with/without downstream tie preference)
  * up-pass admission:   strictly-upstream | upstream-or-overlap |
    all-candidates (with/without upstream tie preference)
  * bookended-interval distance: 1 (bedtools convention) or 0

Usage: python tools/derive_900.py
"""
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from guidemaker_tpu import definitions  # noqa: E402
from guidemaker_tpu.annotate import Annotation  # noqa: E402
from guidemaker_tpu.io import parse_fasta  # noqa: E402
from guidemaker_tpu.scan import PamTarget  # noqa: E402
from guidemaker_tpu.targets import TargetProcessor  # noqa: E402

FASTA = os.path.join(REPO, "tests", "test_data", "Carsonella_ruddii.fasta.gz")
GBK = os.path.join(REPO, "tests", "test_data", "Carsonella_ruddii.gbk.gz")


def build_state():
    pam = PamTarget("NGG", "5prime", "hamming")
    targets = pam.find_targets(parse_fasta(FASTA), 20)
    tl = TargetProcessor(targets=targets, lsr=10, editdist=2, knum=10)
    tl.check_restriction_enzymes(["NRAGCA"])
    tl.find_unique_near_pam()
    tl.create_index(configpath=definitions.CONFIG_PATH)
    tl.get_neighbors(configpath=definitions.CONFIG_PATH)
    anno = Annotation(annotation_list=[GBK], annotation_type="genbank",
                      target_bed_df=tl.export_bed())
    anno.get_annotation_features()
    return tl, anno


def candidates(gs, ge, gstrand, fs, fe, bookend):
    """Per-feature (|dist|, signed dist, is_overlap) for one guide."""
    overlap = (fs < ge) & (gs < fe)
    right = fs >= ge
    mag = np.where(overlap, 0,
                   np.where(right, fs - ge + bookend, gs - fe + bookend))
    plus = gstrand == "+"
    is_down = ~overlap & (right == plus)
    signed = np.where(overlap, 0, np.where(is_down, mag, -mag))
    return mag, signed, overlap


def one_pass(gdf, F, admit, tie_pref, bookend, strand_blind=False):
    """One closest pass over all guides. F: dict of sorted feature arrays.

    strand_blind: the reference's export_bed puts strand in BED column 5
    (the *score* slot), so bedtools parses no strand at all and treats
    every guide as '+' for the -D a orientation rules, while the pandas
    filter still sees the real strand string riding in the score column.
    """
    fs, fe, names, strands, chrom = (F["fs"], F["fe"], F["names"],
                                     F["strands"], F["chrom"])
    out = []
    for gs, ge, gname, gstrand in zip(gdf["chromstart"], gdf["chromend"],
                                      gdf["name"], gdf["strand"]):
        sign_strand = "+" if strand_blind else gstrand
        mag, signed, overlap = candidates(gs, ge, sign_strand, fs, fe,
                                          bookend)
        if admit == "down":
            ok = signed > 0
        elif admit == "down0":
            ok = (signed > 0) | overlap
        elif admit == "up":
            ok = signed < 0
        elif admit == "up0":
            ok = (signed < 0) | overlap
        else:  # all
            ok = np.ones(fs.shape[0], dtype=bool)
        if not ok.any():
            out.append((chrom, gs, ge, gname, gstrand,
                        ".", -1, -1, ".", ".", -1))
            continue
        m = mag[ok].min()
        at = np.flatnonzero(ok & (mag == m))
        if tie_pref and len(at) > 1:
            want = signed[at] > 0 if tie_pref == "down" else signed[at] < 0
            if want.any():
                at = at[want]
        j = at[0]  # -t first: earliest in B sorted order
        out.append((chrom, gs, ge, gname, gstrand, chrom,
                    int(fs[j]), int(fe[j]), names[j], strands[j],
                    int(signed[j])))
    cols = ["Accession", "Guide start", "Guide end", "Guide sequence",
            "Guide strand", "Feature Accession", "Feature start",
            "Feature end", "Feature id", "Feature strand",
            "Feature distance"]
    return pd.DataFrame(out, columns=cols)


def reference_filter_format(nearby, tl, t30):
    """Verbatim reference positional filter (core.py:851-886) + format
    drops (core.py:923-947). Returns final row count + row multiset."""
    df = nearby
    before_feat, after_feat = 100, 200  # noqa: F841
    parts = [
        df.query('`Guide strand` == `Feature strand` and '
                 '0 < `Feature distance` < @before_feat'),
        df.query('`Guide strand` == "+" and `Feature strand` == "+" and '
                 '`Feature distance` == 0 and '
                 '`Guide end` - `Feature start` < @after_feat'),
        df.query('`Guide strand` == "-" and `Feature strand` == "-" and '
                 '`Feature distance` == 0 and '
                 '`Feature end` - `Guide start` < @after_feat'),
        df.query('`Guide strand` == "-" and `Feature strand` == "+" and '
                 '0 < `Feature start` - `Guide end` < @before_feat'),
        df.query('`Guide strand` == "+" and `Feature strand` == "-" and '
                 '0 < `Guide start` - `Feature end` < @before_feat'),
        df.query('`Guide strand` == "-" and `Feature strand` == "+" and '
                 '0 < `Guide end` - `Feature start` < @after_feat'),
        df.query('`Guide strand` == "+" and `Feature strand` == "-" and '
                 '0 < `Feature end` - `Guide start` < @after_feat'),
    ]
    filtered = pd.concat(parts, axis=0)
    filtered = filtered[
        filtered["Guide sequence"].isin(set(tl.passing_seqs()))]
    keys = list(zip(filtered["Guide sequence"].astype(str),
                    filtered["Guide start"].astype(int),
                    filtered["Guide end"].astype(int)))
    ok30 = np.array([len(str(t30.get(k, ""))) == 30 for k in keys],
                    dtype=bool)
    final = filtered[ok30]
    rows = sorted(zip(final["Guide sequence"].astype(str),
                      final["Guide start"].astype(int),
                      final["Feature id"].astype(str),
                      final["Feature distance"].astype(int)))
    return len(final), rows


def main():
    tl, anno = build_state()
    fdf = anno.genbank_bed_df.sort_values(
        by=["chrom", "chromStart", "chromEnd"], kind="stable")
    F = dict(fs=fdf["chromStart"].to_numpy(np.int64),
             fe=fdf["chromEnd"].to_numpy(np.int64),
             names=fdf["name"].to_numpy(),
             strands=fdf["strand"].to_numpy(),
             chrom=str(fdf["chrom"].iloc[0]))
    gdf = tl.export_bed().sort_values(
        by=["chrom", "chromstart", "chromend"], kind="stable")
    t30 = tl.targets.drop_duplicates(
        subset=["target", "start", "stop"]).set_index(
        ["target", "start", "stop"])["target_seq30"]

    down_modes = [("down", None), ("down0", None), ("all", "down"),
                  ("all", None)]
    up_modes = [("up", None), ("up0", None), ("all", "up"), ("all", None)]
    results = []
    cache = {}
    for blind in (True, False):
        for bookend in (1, 0):
            for d_admit, d_tie in down_modes:
                dkey = (d_admit, d_tie, bookend, blind)
                if dkey not in cache:
                    d = one_pass(gdf, F, d_admit, d_tie, bookend,
                                 strand_blind=blind)
                    d["direction"] = "downstream"
                    cache[dkey] = d
                for u_admit, u_tie in up_modes:
                    ukey = (u_admit, u_tie, bookend, blind)
                    if ukey not in cache:
                        u = one_pass(gdf, F, u_admit, u_tie, bookend,
                                     strand_blind=blind)
                        u["direction"] = "upstream"
                        cache[ukey] = u
                    nearby = pd.concat([cache[dkey], cache[ukey]], axis=0)
                    n, _ = reference_filter_format(nearby, tl, t30)
                    tag = (f"blind={int(blind)} bk={bookend} "
                           f"fd=({d_admit},{d_tie}) id=({u_admit},{u_tie})")
                    results.append((n, tag))
                    mark = "  <== 900!" if n == 900 else ""
                    print(f"{n:5d}  {tag}{mark}", flush=True)

    hits = [t for n, t in results if n == 900]
    print("\nexact-900 combinations:", hits if hits else "NONE")


if __name__ == "__main__":
    main()
