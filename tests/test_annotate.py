"""Annotation subsystem tests: closest-join oracle + pipeline shape goldens.

Shape goldens derive from the reference suite (test_core.py:169-244) and
all match the reference bit-for-bit: nearby (7074, 12), qualifiers
(182, 7), pretty table (900, 23), locus filter (4, 23).  The closest-join
semantics that reproduce (900, 23) were derived empirically (the
reference's bedtools cannot run here) by exhaustive search over
defensible `closest -fd/-id -D a` interpretations — see
annotate/closest.py docstring, tools/derive_900.py, and PARITY.md item 7.
"""
import numpy as np
import pandas as pd
import pytest

from guidemaker_tpu import Annotation, PamTarget, TargetProcessor
from guidemaker_tpu.annotate.closest import closest_join
from guidemaker_tpu.io import parse_fasta


@pytest.fixture(scope="module")
def pipeline(genome_fasta, genome_gbk, configpath):
    pam = PamTarget("NGG", "5prime", "hamming")
    targets = pam.find_targets(parse_fasta(genome_fasta), target_len=20)
    tl = TargetProcessor(targets=targets, lsr=10, editdist=2, knum=10)
    tl.check_restriction_enzymes(["NRAGCA"])
    tl.find_unique_near_pam()
    tl.create_index(configpath=configpath)
    tl.get_neighbors(configpath=configpath)
    tf_df = tl.export_bed()
    anno = Annotation(annotation_list=[genome_gbk], annotation_type="genbank",
                      target_bed_df=tf_df)
    anno.get_annotation_features()
    return tl, anno


def test_get_genbank_features(pipeline):
    _, anno = pipeline
    assert len(anno.feature_dict) == 7       # reference golden
    assert len(anno.genbank_bed_df) == 182   # reference golden


def test_get_qualifiers(pipeline, configpath):
    _, anno = pipeline
    anno._get_qualifiers(configpath=configpath)
    assert anno.qualifiers.shape == (182, 7)  # reference golden


def test_get_nearby_features(pipeline):
    _, anno = pipeline
    anno._get_nearby_features()
    assert anno.nearby.shape == (7074, 12)    # reference golden
    down = anno.nearby[anno.nearby["direction"] == "downstream"]
    up = anno.nearby[anno.nearby["direction"] == "upstream"]
    assert len(down) == len(up) == 3537
    # downstream pass: strictly positive distances (overlaps skipped by -fd)
    assert (down["Feature distance"] != 0).all()
    # upstream pass: overlap (0) or negative
    assert (up["Feature distance"] <= 0).all()


def test_format_guide_table(pipeline, configpath):
    tl, anno = pipeline
    anno._get_nearby_features()
    anno._filter_features()
    anno._get_qualifiers(configpath=configpath)
    anno._format_guide_table(tl)
    assert anno.pretty_df.shape == (900, 23)  # reference golden
    assert anno.pretty_df.columns[:17].tolist() == [
        "Guide name", "Guide sequence", "GC", "dtype", "Accession",
        "Guide start", "Guide end", "Guide strand", "PAM", "Feature id",
        "Feature start", "Feature end", "Feature strand", "Feature distance",
        "Similar guides", "Similar guide distances", "target_seq30"]
    # 1-based coordinates on start columns
    assert (anno.pretty_df["Guide start"] >= 1).all()


def test_filterlocus(pipeline, configpath):
    tl, anno = pipeline
    anno._get_nearby_features()
    anno._filter_features()
    anno._get_qualifiers(configpath=configpath)
    anno._format_guide_table(tl)
    out = anno._filterlocus(attribute="locus_tag", filter_by_locus=["CRP_001"])
    assert out.shape == (4, 23)               # reference golden
    assert set(out["locus_tag"]) == {"CRP_001"}


def test_locuslen(pipeline):
    _, anno = pipeline
    tag, count = anno.locuslen()
    assert count == 182


# ---------------------------------------------------------------------------
# closest_join unit semantics vs a brute-force oracle
# ---------------------------------------------------------------------------

def _brute_closest(guides, features, direction):
    """Brute-force oracle of the resolved bedtools2 semantics (closest.py
    docstring): strand-blind orientation, gap+1 distances (1-based
    base-to-base count), book-ended counts as overlap (distance 0)."""
    rows = []
    feats = list(features.itertuples(index=False))
    for g in guides.itertuples(index=False):
        want_down = direction == "downstream"
        best = None
        ov = None
        for order, f in enumerate(feats):
            if f.chrom != g.chrom:
                continue
            if f.chromStart <= g.chromend and f.chromEnd >= g.chromstart:
                # touching-or-overlapping: distance 0, skipped by -fd
                if ov is None:
                    ov = (order, f, 0)
                continue
            if want_down and f.chromStart > g.chromend:
                d = f.chromStart - g.chromend + 1
            elif not want_down and f.chromEnd < g.chromstart:
                d = g.chromstart - f.chromEnd + 1
            else:
                continue
            if best is None or (d, order) < (best[2], best[0]):
                best = (order, f, d)
        if want_down:
            chosen = best
        else:
            chosen = ov if ov is not None else best
        if chosen is None:
            rows.append((".", -1, -1, ".", ".", -1))
        else:
            order, f, d = chosen
            sd = d if want_down else -d
            rows.append((f.chrom, f.chromStart, f.chromEnd, f.name, f.strand, sd))
    return rows


def test_closest_join_vs_bruteforce():
    rng = np.random.default_rng(21)
    n_f, n_g = 40, 120
    fs = np.sort(rng.integers(0, 5000, n_f))
    features = pd.DataFrame({
        "chrom": "c1", "chromStart": fs,
        "chromEnd": fs + rng.integers(50, 400, n_f),
        "name": [f"f{i}" for i in range(n_f)],
        "strand": rng.choice(["+", "-"], n_f)})
    features = features.sort_values(["chrom", "chromStart", "chromEnd"],
                                    kind="stable")
    gs = np.sort(rng.integers(0, 5200, n_g))
    guides = pd.DataFrame({
        "chrom": "c1", "chromstart": gs, "chromend": gs + 20,
        "name": [f"g{i}" for i in range(n_g)],
        "strand": rng.choice(["+", "-"], n_g)})
    for direction in ("downstream", "upstream"):
        got = closest_join(guides, features, direction)
        want = _brute_closest(guides, features, direction)
        for i, (acc, s, e, fid, fstr, d) in enumerate(want):
            row = got.iloc[i]
            assert (row[5], row[6], row[7], row[8], row[9], row[10]) == \
                (acc, s, e, fid, fstr, d), f"row {i} {direction}"


def test_closest_join_no_features_on_chrom():
    guides = pd.DataFrame({"chrom": ["cX"], "chromstart": [10],
                           "chromend": [30], "name": ["g"], "strand": ["+"]})
    features = pd.DataFrame({"chrom": ["c1"], "chromStart": [0],
                             "chromEnd": [5], "name": ["f"], "strand": ["+"]})
    out = closest_join(guides, features, "downstream")
    assert out.iloc[0][5] == "." and out.iloc[0][10] == -1


def test_closest_join_bookended_is_overlap():
    """Book-ended features (gap 0, no overlap) count as overlap: skipped
    by the -fd pass, reported at distance 0 by the -id pass.  Non-overlap
    distances are gap+1 (bedtools2's 1-based base-to-base count; the
    "book-ended admitted downstream at distance 1" reading is refuted by
    the reference's (900, 23) — PARITY.md item 7)."""
    guides = pd.DataFrame({"chrom": ["c1"], "chromstart": [10],
                           "chromend": [30], "name": ["g"], "strand": ["+"]})
    features = pd.DataFrame({"chrom": ["c1"], "chromStart": [30],
                             "chromEnd": [60], "name": ["f"], "strand": ["+"]})
    out = closest_join(guides, features, "downstream")
    assert out.iloc[0][5] == "." and out.iloc[0][10] == -1
    out = closest_join(guides, features, "upstream")
    assert out.iloc[0][8] == "f" and out.iloc[0][10] == 0
    # book-ended on the left edge: also distance 0 in the -id pass
    features_l = pd.DataFrame({"chrom": ["c1"], "chromStart": [0],
                               "chromEnd": [10], "name": ["fl"],
                               "strand": ["+"]})
    out = closest_join(guides, features_l, "upstream")
    assert out.iloc[0][8] == "fl" and out.iloc[0][10] == 0
    # one base of separation: downstream at gap+1 = 2; real distances
    # are never +-1 (the -1 null sentinel stays unambiguous)
    features2 = features.assign(chromStart=[31])
    out = closest_join(guides, features2, "downstream")
    assert out.iloc[0][10] == 2
    out = closest_join(guides, features_l.assign(chromEnd=[9]), "upstream")
    assert out.iloc[0][10] == -2


def test_closest_join_strand_blind():
    """A '-' guide's "downstream" is still the higher-coordinate side:
    the reference's guide bed carries strand in the BED score column, so
    bedtools applies -D a rules as if every guide were '+'."""
    guides = pd.DataFrame({"chrom": ["c1"], "chromstart": [100],
                           "chromend": [120], "name": ["g"],
                           "strand": ["-"]})
    features = pd.DataFrame({"chrom": ["c1", "c1"],
                             "chromStart": [0, 150],
                             "chromEnd": [50, 200],
                             "name": ["left", "right"],
                             "strand": ["+", "+"]})
    down = closest_join(guides, features, "downstream")
    assert down.iloc[0][8] == "right" and down.iloc[0][10] == 31
    up = closest_join(guides, features, "upstream")
    assert up.iloc[0][8] == "left" and up.iloc[0][10] == -51


def test_filter_boundary_rows_under_base1_distances():
    """Row selection at the --before boundary under the resolved bedtools2
    distance semantics (gap+1 / book-ended-as-overlap; VERDICT r3 #3).

    The reference's first filter clause is ``0 < Feature distance <
    before`` (core.py:864-865), so the distance FORM changes which rows
    pass at the boundary: with ``before=100``, a guide 98 bp before a
    same-strand feature (distance 99) passes while a guide 99 bp before
    it (distance 100) does not — under plain-gap semantics the latter
    would have passed at distance 99.  A book-ended guide is reported by
    the upstream pass at distance 0 and kept by the zero-distance clause.
    """
    from guidemaker_tpu.annotate.annotation import Annotation

    feature = pd.DataFrame({
        "chrom": ["c1"], "chromStart": [500], "chromEnd": [800],
        "name": ["feat"], "strand": ["+"]})
    guides = pd.DataFrame({
        "chrom": "c1",
        "chromstart": [382, 381, 480, 479],
        "chromend":   [402, 401, 500, 499],
        "name": ["gap98", "gap99", "book", "gap1"],
        "strand": "+"})
    anno = Annotation(annotation_list=[], annotation_type="genbank",
                      target_bed_df=guides)
    anno.genbank_bed_df = feature
    anno._get_nearby_features()

    down = anno.nearby[anno.nearby["direction"] == "downstream"]
    dist = dict(zip(down["Guide sequence"], down["Feature distance"]))
    assert dist == {"gap98": 99, "gap99": 100, "book": -1, "gap1": 2}
    up = anno.nearby[anno.nearby["direction"] == "upstream"]
    updist = dict(zip(up["Guide sequence"], up["Feature distance"]))
    assert updist["book"] == 0            # book-ended = overlap

    anno._filter_features(before_feat=100, after_feat=200)
    kept = set(anno.filtered_df["Guide sequence"])
    assert kept == {"gap98", "book", "gap1"}   # gap99 fails 100 < 100
