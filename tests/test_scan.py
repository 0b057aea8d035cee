"""PAM scanner tests: reference golden values + brute-force oracle."""
import numpy as np
import pytest

from guidemaker_tpu import PamTarget, dna
from guidemaker_tpu.io import parse_fasta
from guidemaker_tpu.io.records import SeqRecord

SEQ1 = ("AATGATCTGGATGCACATGCACTGCTCCAAGCTGCATGAAAAGTACAAAGCACGTTATTAGATGGTAAC"
        "AATGATCTGGATGCACATGCACTGCTCCAAGCTGCATGAAAAGTACAAAGCACGTTATTAGATGGTGGGAAC")


def test_pam_attrs():
    pamobj = PamTarget("NGG", "5prime", "hamming")
    assert pamobj.pam == "NGG"
    pamobj = PamTarget("GATN", "3prime", "hamming")
    assert pamobj.pam_orientation == "3prime"


def test_pam_validation():
    with pytest.raises(AssertionError):
        PamTarget("NGZ", "5prime", "hamming")
    with pytest.raises(AssertionError):
        PamTarget("NGG", "middle", "hamming")


def test_find_targets_5p():
    # reference golden (test_core.py:41-47)
    pamobj = PamTarget("NGG", "5prime", "hamming")
    target = pamobj.find_targets([SeqRecord("testseq1", SEQ1)], target_len=6)
    assert target["target"][0] == "ATGCAC"
    assert target["target"][1] == "TAACAA"


def test_find_targets_3p():
    # reference golden (test_core.py:52-57)
    pamobj = PamTarget("NGG", "3prime", "hamming")
    target = pamobj.find_targets([SeqRecord("testseq1", SEQ1 + "]")], target_len=6)
    assert target["target"][0] == "ATGATC"
    assert target["target"][1] == "ATTAGA"


def test_find_targets_fullgenome(genome_fasta):
    # reference golden (test_core.py:59-65)
    pamobj = PamTarget("NGG", "5prime", "hamming")
    target = pamobj.find_targets(parse_fasta(genome_fasta), target_len=20)
    assert target["target"][0] == "AAATGGTACGTTATGTGTTA"


def test_columns_and_dtypes(genome_fasta):
    pamobj = PamTarget("NGG", "5prime", "hamming")
    df = pamobj.find_targets(parse_fasta(genome_fasta), target_len=20)
    assert list(df.columns) == [
        "target", "exact_pam", "start", "stop", "strand", "pam_orientation",
        "target_seq30", "seqid", "seedseq", "hasrestrictionsite",
        "isseedduplicated", "dtype"]
    assert str(df["start"].dtype) == "uint32"
    assert str(df["strand"].dtype) == "bool"


def _oracle_scan(seq, pam, orientation, target_len):
    """Brute-force overlapped regex scan replicating the reference generators."""
    import re as _re

    def pam2re(p):
        return "".join("[" + "".join(sorted(dna.IUPAC[c])) + "]" for c in p)

    def finditer_overlapped(pattern, text):
        pos = 0
        rx = _re.compile(pattern)
        while True:
            m = rx.search(text, pos)
            if m is None:
                return
            yield m
            pos = m.start() + 1

    out = []
    for strand_fwd in (True, False):
        pat = pam2re(pam if strand_fwd else dna.reverse_complement(pam))
        for m in finditer_overlapped(pat, seq):
            s, e = m.start(), m.end()
            downstream = ((orientation == "5prime") == strand_fwd)
            a, b = (e, e + target_len) if downstream else (s - target_len, s)
            if a < 0 or b > len(seq):
                continue
            t = seq[a:b]
            if len(t) != target_len or any(c not in "ACGT" for c in t):
                continue
            exact = seq[s:e]
            if not strand_fwd:
                t = dna.reverse_complement(t)
                exact = dna.reverse_complement(exact)
            out.append((t, exact, a, b, strand_fwd))
    return out


@pytest.mark.parametrize("pam,orientation", [
    ("NGG", "5prime"), ("NGG", "3prime"),
    ("NNGRRT", "3prime"), ("TTTV", "5prime"), ("NNNNRYAC", "3prime")])
def test_scan_vs_bruteforce_oracle(pam, orientation):
    rng = np.random.default_rng(42)
    seq = "".join(rng.choice(list("ACGTN"), p=[.24, .24, .24, .24, .04],
                             size=3000))
    pamobj = PamTarget(pam, orientation, "hamming")
    df = pamobj.find_targets([SeqRecord("t", seq)], target_len=17)
    got = set(zip(df["target"], df["exact_pam"], df["start"].astype(int),
                  df["stop"].astype(int), df["strand"]))
    want = set(_oracle_scan(seq, pam, orientation, 17))
    assert got == want


def test_reverse_strand_semantics():
    # A single NGG PAM on the reverse strand: forward text holds CCN at left.
    #        0123456789...
    seq = "TTCCTAAGTCAGGTCAATTTTTTT"
    # revcomp genome: AAAAAAATTGACCTGACTTAGGAA: PAM 'AGG' with target TTGACC...?
    pamobj = PamTarget("NGG", "3prime", "hamming")
    df = pamobj.find_targets([SeqRecord("t", seq)], target_len=6)
    rev = df[df["strand"] == False]  # noqa: E712
    # CCT at positions 2-4: revcomp hit => target = revcomp(seq[5:11])
    assert any(t == dna.reverse_complement(seq[5:11]) for t in rev["target"])
    # coordinates stay forward-text, start < stop
    assert (df["start"] < df["stop"]).all()


def test_target_seq30_context(genome_fasta):
    pamobj = PamTarget("NGG", "3prime", "hamming")
    df = pamobj.find_targets(parse_fasta(genome_fasta), target_len=20)
    ok = df[df["target_seq30"].str.len() == 30]
    # 3prime forward: 30mer = [guide 24:4+20][PAM][+3] window; guide at [4:24]
    row = ok[ok["strand"] == True].iloc[0]  # noqa: E712
    assert row["target_seq30"][4:24] == row["target"]
    assert row["target_seq30"][24 + 1:27] == row["exact_pam"][1:]
    rrow = ok[ok["strand"] == False].iloc[0]  # noqa: E712
    assert rrow["target_seq30"][4:24] == rrow["target"]


def test_context_window_preserves_ambiguity_letters():
    # non-ACGT letters in the 30-mer context are kept verbatim (the guide
    # itself must be clean, but flanks may contain N/R/...)
    seq = "AAAAAA" + "R" + "TTTTTTTTTTTTTTTTTTTT" + "AGG" + "TTTN" + "A" * 20
    pamobj = PamTarget("NGG", "3prime", "hamming")
    df = pamobj.find_targets([SeqRecord("t", seq)], target_len=20)
    row = df[df["strand"] == True].iloc[0]  # noqa: E712
    assert row["target"] == "T" * 20
    assert "N" in row["target_seq30"] or "R" in row["target_seq30"]


def test_short_contig_yields_no_targets_no_crash():
    pamobj = PamTarget("NGG", "3prime", "hamming")
    df = pamobj.find_targets(
        [SeqRecord("tiny", "AGG"), SeqRecord("ok", "T" * 25 + "AGGAA")], 20)
    assert (df["seqid"] == "ok").all()


def test_find_targets_zero_hits_returns_empty_frame():
    """A genome with no PAM matches returns an empty, fully-typed frame
    (the reference survives via unconditional per-strand frames)."""
    pamobj = PamTarget("NGG", "5prime", "hamming")
    df = pamobj.find_targets([SeqRecord("empty", "ATATATATATATATATAT")],
                             target_len=6)
    assert len(df) == 0
    for col in ("target", "exact_pam", "start", "stop", "strand",
                "pam_orientation", "target_seq30", "seqid", "seedseq",
                "hasrestrictionsite", "isseedduplicated", "dtype"):
        assert col in df.columns
    assert df["start"].dtype == np.uint32
