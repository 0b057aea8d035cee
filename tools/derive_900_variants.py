#!/usr/bin/env python
"""Focused disambiguation around the winning derive_900 combination:
blind=1 fd=strictly-down id=overlap-or-up.  Scans per-side bookend
offsets and the touch-as-overlap alternative to see which boundary
conventions are distinguishable on the C. ruddii data (900 rows).
"""
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.derive_900 import build_state, reference_filter_format  # noqa: E402


def one_pass_v(gdf, F, admit, bk_r, bk_l, touch):
    fs, fe, names, strands, chrom = (F["fs"], F["fe"], F["names"],
                                     F["strands"], F["chrom"])
    out = []
    for gs, ge, gname, gstrand in zip(gdf["chromstart"], gdf["chromend"],
                                      gdf["name"], gdf["strand"]):
        if touch:
            overlap = (fs <= ge) & (gs <= fe)
        else:
            overlap = (fs < ge) & (gs < fe)
        right = ~overlap & (fs >= ge)
        left = ~overlap & (fe <= gs)
        mag = np.where(overlap, 0,
                       np.where(right, fs - ge + bk_r, gs - fe + bk_l))
        # strand-blind -D a: downstream == right, upstream == left
        signed = np.where(overlap, 0, np.where(right, mag, -mag))
        if admit == "down":
            ok = signed > 0
        else:  # up0
            ok = (signed < 0) | overlap
        if not ok.any():
            out.append((chrom, gs, ge, gname, gstrand,
                        ".", -1, -1, ".", ".", -1))
            continue
        m = mag[ok].min()
        j = np.flatnonzero(ok & (mag == m))[0]
        out.append((chrom, gs, ge, gname, gstrand, chrom,
                    int(fs[j]), int(fe[j]), names[j], strands[j],
                    int(signed[j])))
    cols = ["Accession", "Guide start", "Guide end", "Guide sequence",
            "Guide strand", "Feature Accession", "Feature start",
            "Feature end", "Feature id", "Feature strand",
            "Feature distance"]
    return pd.DataFrame(out, columns=cols)


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

    for touch in (False, True):
        for bk_r in (0, 1):
            for bk_l in (0, 1):
                d = one_pass_v(gdf, F, "down", bk_r, bk_l, touch)
                d["direction"] = "downstream"
                u = one_pass_v(gdf, F, "up0", bk_r, bk_l, touch)
                u["direction"] = "upstream"
                nearby = pd.concat([d, u], axis=0)
                n, _ = reference_filter_format(nearby, tl, t30)
                mark = "  <== 900" if n == 900 else ""
                print(f"{n:5d}  touch={int(touch)} bk_r={bk_r} "
                      f"bk_l={bk_l}{mark}", flush=True)


if __name__ == "__main__" and not os.environ.get("COMPARE"):
    main()


def compare_families():
    """Are the two 900-row families (touch=0/bk_r=0 vs touch=1/bk_r=1)
    the same row multiset?"""
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

    rows = {}
    for tag, (touch, bk) in {"A": (False, 0), "B": (True, 1)}.items():
        d = one_pass_v(gdf, F, "down", bk, bk, touch)
        d["direction"] = "downstream"
        u = one_pass_v(gdf, F, "up0", bk, bk, touch)
        u["direction"] = "upstream"
        nearby = pd.concat([d, u], axis=0)
        n, r = reference_filter_format(nearby, tl, t30)
        rows[tag] = r
        print(f"family {tag}: {n} rows")
    same = rows["A"] == rows["B"]
    print("identical row multisets:", same)
    if not same:
        sa, sb = set(rows["A"]), set(rows["B"])
        print("A-only:", sorted(sa - sb)[:10])
        print("B-only:", sorted(sb - sa)[:10])


if __name__ == "__main__" and os.environ.get("COMPARE"):
    compare_families()


def diff_899():
    """Name the single row separating the classic bookended=+1 convention
    (899 rows) from the derived 900-row semantics."""
    tl, anno = build_state()
    fdf = anno.genbank_bed_df.sort_values(
        by=["chrom", "chromStart", "chromEnd"], kind="stable")
    F = dict(fs=fdf["chromStart"].to_numpy(np.int64),
             fe=fdf["chromEnd"].to_numpy(np.int64),
             names=fdf["names" if "names" in fdf else "name"].to_numpy(),
             strands=fdf["strand"].to_numpy(),
             chrom=str(fdf["chrom"].iloc[0]))
    gdf = tl.export_bed().sort_values(
        by=["chrom", "chromstart", "chromend"], kind="stable")
    t30 = tl.targets.drop_duplicates(
        subset=["target", "start", "stop"]).set_index(
        ["target", "start", "stop"])["target_seq30"]
    rows = {}
    for tag, (touch, bk) in {"A": (False, 0), "C": (False, 1)}.items():
        d = one_pass_v(gdf, F, "down", bk, bk, touch)
        d["direction"] = "downstream"
        u = one_pass_v(gdf, F, "up0", bk, bk, touch)
        u["direction"] = "upstream"
        nearby = pd.concat([d, u], axis=0)
        n, r = reference_filter_format(nearby, tl, t30)
        rows[tag] = r
        print(f"family {tag}: {n} rows")
    from collections import Counter
    ca, cc = Counter(rows["A"]), Counter(rows["C"])
    print("A-not-C:", sorted((ca - cc).elements()))
    print("C-not-A:", sorted((cc - ca).elements()))
    # ignore the uniform +-1 distance shift: compare guide identities
    ka = Counter((g, s, f) for g, s, f, _ in rows["A"])
    kc = Counter((g, s, f) for g, s, f, _ in rows["C"])
    print("guides A-not-C:", sorted((ka - kc).elements()))
    print("guides C-not-A:", sorted((kc - ka).elements()))


if __name__ == "__main__" and os.environ.get("DIFF899"):
    diff_899()
