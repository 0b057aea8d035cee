"""Unit tests for the DNA alphabet machinery."""
import numpy as np

from guidemaker_tpu import dna


def test_encode_decode_roundtrip():
    s = "ACGTACGT"
    assert dna.decode(dna.encode(s)) == s


def test_encode_invalid_bases():
    codes = dna.encode("ACGTN")
    assert codes[4] == dna.INVALID


def test_strict_encoding_rejects_lowercase():
    strict = dna.STRICT_BYTE_TO_CODE[np.frombuffer(b"acgtACGT", dtype=np.uint8)]
    assert (strict[:4] == dna.INVALID).all()
    assert (strict[4:] < 4).all()


def test_reverse_complement():
    assert dna.reverse_complement("ACGT") == "ACGT"
    assert dna.reverse_complement("AAGG") == "CCTT"
    assert dna.reverse_complement("NGG") == "CCN"
    assert dna.reverse_complement("NNNNRYAC") == "GTRYNNNN"


def test_revcomp_codes():
    codes = dna.encode("AACG")
    assert dna.decode(dna.revcomp_codes(codes)) == "CGTT"


def test_extend_ambiguous_dna():
    # golden ordering from reference test_core.py:254-257
    assert dna.extend_ambiguous_dna("NGG") == ["GGG", "AGG", "TGG", "CGG"]


def test_pam_bit_masks():
    masks = dna.pam_bit_masks("NGG")
    assert masks[0] == 0b1111
    assert masks[1] == masks[2] == 1 << dna.G


def test_one_hot_inner_product_counts_matches():
    a = dna.encode("ACGT")[None, :]
    b = dna.encode("ACGA")[None, :]
    oh_a = dna.one_hot_matrix(a)
    oh_b = dna.one_hot_matrix(b)
    matches = oh_a @ oh_b.T
    assert matches[0, 0] == 3  # hamming distance 1 == 4 - 3


def test_one_hot_invalid_base_never_matches():
    a = dna.one_hot_matrix(dna.encode("ACGN")[None, :])
    assert a[0, 12:16].sum() == 0


def test_decode_rows():
    codes = np.stack([dna.encode("ACGT"), dna.encode("TTTT")])
    assert dna.decode_rows(codes) == ["ACGT", "TTTT"]
