"""I/O parser tests: FASTA, GenBank (vs reference-known counts), GFF, gzip."""
import gzip
import os

import pytest

from guidemaker_tpu.io import (get_fastas, is_gzip, parse_fasta, parse_genbank,
                               parse_gff, sniff_gff_type, write_fasta)
from guidemaker_tpu.io.gffio import parse_attributes
from guidemaker_tpu.io.records import SeqRecord


def test_is_gzip(genome_fasta, tmp_path):
    assert is_gzip(genome_fasta)
    p = tmp_path / "plain.txt"
    p.write_text("hello")
    assert not is_gzip(str(p))


def test_parse_fasta_gzip(genome_fasta):
    recs = list(parse_fasta(genome_fasta))
    assert len(recs) == 1
    assert recs[0].id == "AP009180.1"
    assert len(recs[0].seq) == 159662
    assert recs[0].seq[:10] == "ATGAATACTA"


def test_fasta_roundtrip(tmp_path):
    recs = [SeqRecord("a", "ACGTACGTACGT", "a first record"),
            SeqRecord("b", "TTTT")]
    p = tmp_path / "out.fasta"
    with open(p, "w") as f:
        write_fasta(recs, f, width=5)
    back = list(parse_fasta(str(p)))
    assert [r.id for r in back] == ["a", "b"]
    assert [r.seq for r in back] == ["ACGTACGTACGT", "TTTT"]


def test_parse_genbank(genome_gbk):
    recs = list(parse_genbank(genome_gbk))
    assert len(recs) == 1
    rec = recs[0]
    assert rec.id == "AP009180.1"
    assert len(rec.seq) == 159662
    cds = [f for f in rec.features if f.type == "CDS"]
    assert len(cds) == 182  # reference-known count (test_core.py:172)
    # qualifier keys across CDS: 7 distinct (test_core.py:171)
    keys = set()
    for f in cds:
        keys.update(f.qualifiers)
    assert len(keys) == 7
    # first CDS is CRP_001 at 1..1317 -> 0-based [0, 1317), strand +
    first = cds[0]
    assert first.qualifiers["locus_tag"] == ["CRP_001"]
    assert (first.start, first.end, first.strand) == (0, 1317, 1)
    # reverse-strand features parsed
    assert any(f.strand == -1 for f in cds)


def test_genbank_sequence_matches_fasta(genome_gbk, genome_fasta):
    gb = next(parse_genbank(genome_gbk))
    fa = next(parse_fasta(genome_fasta))
    assert gb.seq.upper() == fa.seq.upper()


def test_get_fastas_from_genbank(genome_gbk, tmp_path):
    path = get_fastas([genome_gbk], input_format="genbank", tempdir=str(tmp_path))
    recs = list(parse_fasta(path))
    assert recs[0].id == "AP009180.1"
    assert len(recs[0].seq) == 159662
    assert recs[0].seq == recs[0].seq.upper()


def test_gff_sniff_and_parse(tmp_path):
    gff = tmp_path / "test.gff"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tCDS\t10\t100\t.\t+\t0\tID=gene1;Name=foo\n"
        "chr1\tsrc\texon\t10\t50\t.\t-\t0\tID=exon1\n")
    assert sniff_gff_type(str(gff)) == "gff"
    recs = list(parse_gff(str(gff)))
    assert len(recs) == 2
    assert recs[0].type == "CDS" and recs[0].start == 10 and recs[0].end == 100
    attrs = parse_attributes(recs[0].attributes, "gff")
    assert attrs == {"ID": "gene1", "Name": "foo"}


def test_gtf_sniff_and_attributes(tmp_path):
    gtf = tmp_path / "test.gtf"
    gtf.write_text(
        '#gtf-version 2.2\n'
        'chr1\tsrc\tCDS\t10\t100\t.\t+\t0\tgene_id "g1"; transcript_id "t1";\n')
    assert sniff_gff_type(str(gtf)) == "gtf"
    recs = list(parse_gff(str(gtf)))
    attrs = parse_attributes(recs[0].attributes, "gtf")
    assert attrs == {"gene_id": "g1", "transcript_id": "t1"}


def test_gff_sniff_rejects_unversioned(tmp_path):
    f = tmp_path / "bad.gff"
    f.write_text("chr1\tsrc\tCDS\t1\t10\t.\t+\t0\tID=x\n")
    with pytest.raises(ValueError):
        sniff_gff_type(str(f))


def test_gzipped_gff(tmp_path):
    p = tmp_path / "z.gff.gz"
    with gzip.open(p, "wt") as f:
        f.write("##gff-version 3\nchr1\tsrc\tCDS\t1\t9\t.\t+\t0\tID=x\n")
    assert sniff_gff_type(str(p)) == "gff"
    assert len(list(parse_gff(str(p)))) == 1
