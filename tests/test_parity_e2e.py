"""End-to-end output parity vs the reference on Carsonella ruddii.

The reference cannot execute in this environment (NMSLib / pybedtools /
onnxruntime are absent), so parity is enforced mechanically, against the
numbers its own test suite pins (``/root/reference/tests/test_core.py``)
and against clean-room oracles implemented here:

1. guide retention: production == a brute-force numpy oracle of the
   reference's threshold rule (core.py:509-522) at recall 1.0;
2. filter + format: production == an independent in-test transcription
   of the reference's pandas logic (core.py:851-948, the 7 positional
   clauses verbatim) applied to the same join output — isolating any
   row-count difference to the interval-join (bedtools) layer;
3. the final table reproduces the reference's asserted (900, 23)
   (test_core.py:202-222) exactly, using the closest-join semantics
   DERIVED by exhaustive search over defensible bedtools
   interpretations (tools/derive_900.py; PARITY.md item 7) — the only
   admission semantics that yields 900 — and retention is proven
   irrelevant to the count (disabling it entirely changes nothing);
4. a vendored golden CSV locks our canonical output byte-for-byte.
"""
import gzip
import io
import os

import numpy as np
import pandas as pd
import pytest

from guidemaker_tpu import definitions, dna
from guidemaker_tpu.annotate import Annotation
from guidemaker_tpu.io import parse_fasta
from guidemaker_tpu.scan import PamTarget
from guidemaker_tpu.targets import TargetProcessor

HERE = os.path.dirname(__file__)
FASTA = os.path.join(HERE, "test_data", "Carsonella_ruddii.fasta.gz")
GBK = os.path.join(HERE, "test_data", "Carsonella_ruddii.gbk.gz")
GOLDEN = os.path.join(HERE, "test_data", "golden_pretty_cruddii.csv.gz")


@pytest.fixture(scope="module")
def pipeline_state():
    """The reference integration-test configuration
    (test_core.py:202-222): NGG/5prime/20-mer, lsr=10, dist=2, knum=10,
    restriction NRAGCA, C. ruddii fasta + gbk."""
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
    anno._get_nearby_features()
    anno._filter_features(before_feat=100, after_feat=200)
    anno._get_qualifiers(configpath=definitions.CONFIG_PATH)
    anno._format_guide_table(tl)
    return tl, anno


def _row_key(frame, start_offset=0):
    """Order-independent row multiset on the identity-bearing columns."""
    return sorted(zip(frame["Guide sequence"].astype(str),
                      frame["Guide start"].astype(int) + start_offset,
                      frame["Feature id"].astype(str),
                      frame["Feature distance"].astype(int)))


def test_retention_matches_bruteforce_oracle(pipeline_state):
    """Production retention == exact numpy oracle of core.py:509-522."""
    tl, _ = pipeline_state
    mask = ((tl.targets["isseedduplicated"] == False)       # noqa: E712
            | (tl.targets["hasrestrictionsite"] == False))  # noqa: E712
    queries = list(dict.fromkeys(tl.targets.loc[mask]["target"].tolist()))
    db = tl.index.seqs
    codes = np.stack([dna.encode(s) for s in db]).astype(np.uint8)
    qc = np.stack([dna.encode(s) for s in queries]).astype(np.uint8)
    dm = (qc[:, None, :] != codes[None, :, :]).sum(2)
    pos = {s: i for i, s in enumerate(db)}
    for qi, s in enumerate(queries):
        dm[qi, pos[s]] = 10 ** 6           # hit 0 is self (dist 0)
    d2 = dm.min(1)                         # 2nd-nearest (after self)
    oracle = {s for s, d in zip(queries, d2) if d >= 2}
    assert oracle == set(tl.passing_seqs())
    # the C. ruddii fixture has exactly 2 guides failing exact retention
    assert len(queries) - len(oracle) == 2


def _reference_filter_format(nearby, tl):
    """Clean-room transcription of the reference's positional filter
    (core.py:851-886, the 7 query clauses verbatim) and the formatting
    drops (core.py:888-948: neighbors-key membership, targets merge,
    30-mer completeness), independent of guidemaker_tpu.annotate.
    Returns the final row multiset."""
    df = nearby.copy()
    for col in ("Guide strand", "Feature strand", "direction",
                "Accession"):
        df[col] = df[col].astype(str)
    before_feat, after_feat = 100, 200     # noqa: F841 (used in query)
    f0 = df.query(
        '`Guide strand` == `Feature strand` and '
        '0 < `Feature distance` < @before_feat')
    p1 = df.query('`Guide strand` == "+" and `Feature strand` == "+" and '
                  '`Feature distance` == 0 and '
                  '`Guide end` - `Feature start` < @after_feat')
    p2 = df.query('`Guide strand` == "-" and `Feature strand` == "-" and '
                  '`Feature distance` == 0 and '
                  '`Feature end` - `Guide start` < @after_feat')
    p3 = df.query('`Guide strand` == "-" and `Feature strand` == "+" and '
                  '0 < `Feature start` - `Guide end` < @before_feat')
    p4 = df.query('`Guide strand` == "+" and `Feature strand` == "-" and '
                  '0 < `Guide start` - `Feature end` < @before_feat')
    p5 = df.query('`Guide strand` == "-" and `Feature strand` == "+" and '
                  '0 < `Guide end` - `Feature start` < @after_feat')
    p6 = df.query('`Guide strand` == "+" and `Feature strand` == "-" and '
                  '0 < `Feature end` - `Guide start` < @after_feat')
    filtered = pd.concat([f0, p1, p2, p3, p4, p5, p6], axis=0)
    # core.py:923-924: keep guides present in the neighbors dict
    filtered = filtered[
        filtered["Guide sequence"].isin(set(tl.passing_seqs()))]
    # core.py:947 via the targets merge: drop rows whose 30-mer context
    # is not exactly 30 nt
    t30 = tl.targets.drop_duplicates(
        subset=["target", "start", "stop"]).set_index(
        ["target", "start", "stop"])["target_seq30"]
    keys = list(zip(filtered["Guide sequence"].astype(str),
                    filtered["Guide start"].astype(int),
                    filtered["Guide end"].astype(int)))
    ok30 = np.array(
        [len(str(t30.get(k, ""))) == 30 for k in keys])
    return _row_key(filtered[ok30])


def test_filter_format_matches_cleanroom_oracle(pipeline_state):
    """Our array-level filter/format pipeline must produce exactly the
    rows the reference's pandas clauses produce from the same join."""
    tl, anno = pipeline_state
    oracle_rows = _reference_filter_format(anno.nearby, tl)
    got = _row_key(anno.pretty_df, start_offset=-1)  # undo 1-based start
    assert got == oracle_rows


def test_golden_output_locked(pipeline_state):
    """The canonical C. ruddii table is byte-stable against the vendored
    golden CSV (regenerate deliberately with
    ``python tools/make_golden.py`` when semantics change on purpose)."""
    _, anno = pipeline_state
    buf = io.StringIO()
    anno.pretty_df.to_csv(buf, index=False)
    if not os.path.exists(GOLDEN):  # pragma: no cover - bootstrap aid
        pytest.skip("golden file missing; run tools/make_golden.py")
    with gzip.open(GOLDEN, "rt") as fh:
        golden = fh.read()
    assert buf.getvalue() == golden


def test_row_accounting_vs_reference_900(pipeline_state):
    """The reference's (900, 23) assertion (test_core.py:221-222) is
    reproduced EXACTLY by the derived closest-join semantics
    (annotate/closest.py docstring; derivation in tools/derive_900.py).

    * the join produces the identical (7074, 12) shape;
    * the final table is exactly (900, 23);
    * retention is irrelevant to the count: formatting with retention
      DISABLED yields the same 900 rows (the 2 exactly-failing guides
      are dropped earlier, by seed-dedup/positional filters), so the
      reference's approximate HNSW recall cannot perturb the assertion.

    Runs last in this module: it mutates the shared neighbor state.
    """
    tl, anno = pipeline_state
    assert anno.nearby.shape == (7074, 12)      # == reference assert
    assert anno.pretty_df.shape == (900, 23)    # == reference assert
    n_exact = len(anno.pretty_df)

    # disable retention: everything the reference could possibly have
    # retained (recall < 1 can only over-retain, never under-retain)
    mask = ((tl.targets["isseedduplicated"] == False)       # noqa: E712
            | (tl.targets["hasrestrictionsite"] == False))  # noqa: E712
    allq = list(dict.fromkeys(tl.targets.loc[mask]["target"].tolist()))
    tl.neighbors = {s: {"target": s, "neighbors": {"seqs": [], "dist": []}}
                    for s in allq}
    anno._format_guide_table(tl)
    assert len(anno.pretty_df) == n_exact, \
        "retention must not contribute to the 900-row count"
