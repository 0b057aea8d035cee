#!/usr/bin/env python
"""Regenerate the vendored golden output for tests/test_parity_e2e.py.

Run deliberately when output semantics change on purpose:
    python tools/make_golden.py
"""
import gzip
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from guidemaker_tpu import definitions  # noqa: E402
from guidemaker_tpu.annotate import Annotation  # noqa: E402
from guidemaker_tpu.io import parse_fasta  # noqa: E402
from guidemaker_tpu.scan import PamTarget  # noqa: E402
from guidemaker_tpu.targets import TargetProcessor  # noqa: E402

TD = os.path.join(REPO, "tests", "test_data")


def main():
    pam = PamTarget("NGG", "5prime", "hamming")
    targets = pam.find_targets(
        parse_fasta(os.path.join(TD, "Carsonella_ruddii.fasta.gz")), 20)
    tl = TargetProcessor(targets=targets, lsr=10, editdist=2, knum=10)
    tl.check_restriction_enzymes(["NRAGCA"])
    tl.find_unique_near_pam()
    tl.create_index(configpath=definitions.CONFIG_PATH)
    tl.get_neighbors(configpath=definitions.CONFIG_PATH)
    anno = Annotation(
        annotation_list=[os.path.join(TD, "Carsonella_ruddii.gbk.gz")],
        annotation_type="genbank", target_bed_df=tl.export_bed())
    anno.get_annotation_features()
    anno._get_nearby_features()
    anno._filter_features(before_feat=100, after_feat=200)
    anno._get_qualifiers(configpath=definitions.CONFIG_PATH)
    anno._format_guide_table(tl)
    buf = io.StringIO()
    anno.pretty_df.to_csv(buf, index=False)
    out = os.path.join(TD, "golden_pretty_cruddii.csv.gz")
    with gzip.open(out, "wt") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {out}: {anno.pretty_df.shape}")


if __name__ == "__main__":
    main()
