"""Scoring tests: Doench golden floats (bit-exact vs onnxruntime reference),
CFD golden, Tm oracle, batch/scalar consistency."""
import numpy as np
import pytest

from guidemaker_tpu import dna
from guidemaker_tpu.score import cfd as cfd_mod
from guidemaker_tpu.score import doench as doench_mod
from guidemaker_tpu.score.doench_features import featurize, N_FEATURES
from guidemaker_tpu.score.tm import tm_rna_nn2, RNA_NN2


def test_predict_guides_golden():
    # float32-exact equality with the reference's onnxruntime output
    # (test_core.py:259-263)
    seqs = np.array(["GTACAAAGCACGTTATTAGATGGTGGGAAC",
                     "TCTAATCACGACAGCATCACTATTAGGCCG",
                     "TGAAATGTCTCTTATCTCTGTGTAAGGCTC"])
    exp = np.array([[0.59383124], [0.28157765], [0.5276569]], dtype="float32")
    scores = doench_mod.predict(seqs)
    assert (exp == scores).all()


def test_predict_from_onnx_file_direct():
    # loading the skl2onnx .onnx directly (no onnxruntime) gives the same
    import os
    ref_onnx = "/root/reference/guidemaker/data/V3_model_nopos.onnx"
    if not os.path.exists(ref_onnx):
        pytest.skip("reference onnx not available")
    seqs = np.array(["GTACAAAGCACGTTATTAGATGGTGGGAAC"])
    a = doench_mod.predict(seqs)
    b = doench_mod.predict(seqs, model_file=ref_onnx)
    assert (a == b).all()


def test_predict_validations():
    with pytest.raises(AssertionError):
        doench_mod.predict(["GTACAAAGCACGTTATTAGATGGTGGGAAC"])  # not ndarray
    with pytest.raises(Exception):
        # PAM audit: no GG at [25:27]
        doench_mod.predict(np.array(["A" * 30]))


def test_featurize_shape_and_blocks():
    seq = "GTACAAAGCACGTTATTAGATGGTGGGAAC"
    f = featurize([seq])
    assert f.shape == (1, N_FEATURES)
    # _nuc_pd_Order1: position 0 is 'G' -> ATCG one-hot col 3
    assert f[0, :4].tolist() == [0, 0, 0, 1]
    # _nuc_pi_Order1 counts (cols 120..124) in ATCG order
    a, t, c, g = f[0, 120:124]
    assert a == seq.count("A") and t == seq.count("T")
    assert c == seq.count("C") and g == seq.count("G")
    # gc_count col = 120+4+464+16 = 604..607: above10, below10, count
    gc20 = seq[4:24].count("G") + seq[4:24].count("C")
    assert f[0, 606] == gc20
    assert f[0, 604] == (gc20 > 10) and f[0, 605] == (gc20 < 10)


def test_cfd_golden():
    # reference golden (test_core.py:265-267)
    r = cfd_mod.calc_cfd("GCATGCACAGCTAGCATGCATGCAGCT",
                         "GCATGCACAGCTAGCATGCATGCAGCG")
    assert abs(r - 0.176470588) < 0.0001


def test_cfd_identical_is_one():
    assert cfd_mod.calc_cfd("ACGT" * 5, "ACGT" * 5) == 1.0


def test_cfd_length_mismatch_asserts():
    with pytest.raises(AssertionError):
        cfd_mod.calc_cfd("ACGT", "ACGTA")


def test_cfd_batch_matches_scalar():
    rng = np.random.default_rng(5)
    wt = rng.integers(0, 4, size=(40, 20)).astype(np.uint8)
    off = wt.copy()
    mut = rng.random((40, 20)) < 0.2
    off[mut] = rng.integers(0, 4, size=mut.sum()).astype(np.uint8)
    wts, offs = dna.decode_rows(wt), dna.decode_rows(off)
    scal = np.array([cfd_mod.calc_cfd(a, b) for a, b in zip(wts, offs)])
    np.testing.assert_array_equal(cfd_mod.cfd_batch(wt, off), scal)


def _tm_scalar(seq: str) -> float:
    """Literal scalar transcription of the Biopython Tm_NN algorithm."""
    import math
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    dh, ds = RNA_NN2["init"]
    ends = seq[0] + seq[-1]
    at = ends.count("A") + ends.count("T")
    gcn = ends.count("G") + ends.count("C")
    dh += RNA_NN2["init_A/T"][0] * at + RNA_NN2["init_G/C"][0] * gcn
    ds += RNA_NN2["init_A/T"][1] * at + RNA_NN2["init_G/C"][1] * gcn
    for i in range(len(seq) - 1):
        pair = seq[i:i + 2]
        key = pair + "/" + comp[pair[0]] + comp[pair[1]]
        v = RNA_NN2.get(key) or RNA_NN2[key[::-1]]
        dh += v[0]
        ds += v[1]
    k = (25 - 25 / 2.0) * 1e-9
    corr = 0.368 * (len(seq) - 1) * math.log(50e-3)
    return (1000 * dh) / (ds + corr + 1.987 * math.log(k)) - 273.15


def test_tm_vectorized_matches_scalar():
    rng = np.random.default_rng(9)
    for L in (5, 8, 30):
        seqs = ["".join(rng.choice(list("ACGT"), size=L)) for _ in range(25)]
        codes = np.stack([dna.encode(s) for s in seqs])
        got = tm_rna_nn2(codes)
        want = np.array([_tm_scalar(s) for s in seqs])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_get_doench_efficiency_score_gate():
    import pandas as pd
    df = pd.DataFrame({
        "PAM": ["AGG", "CGG"],
        "target_seq30": ["GTACAAAGCACGTTATTAGATGGTGGGAAC",
                         "TCTAATCACGACAGCATCACTATTAGGCCG"],
        "Guide sequence": ["x", "y"]})
    # PAM set != {AGG,CGG,TGG,GGG} -> Not Available (reference exact-set quirk)
    out = doench_mod.get_doench_efficiency_score(df, "3prime")
    assert (out["Efficiency"] == "Not Available").all()
    assert "target_seq30" not in out.columns


def test_featurize_data_shim_blocks():
    # reference-module API (doench_featurization.py:36-83): dict of blocks
    import pandas as pd
    from guidemaker_tpu.doench_featurization import featurize_data
    d = pd.DataFrame({"30mer": ["GTACAAAGCACGTTATTAGATGGTGGGAAC"]})
    fs = featurize_data(d, {})
    assert [v.shape[1] for v in fs.values()] == [120, 4, 464, 16, 1, 1, 1, 16, 4]
    flat = np.hstack([v.to_numpy() for v in fs.values()])
    np.testing.assert_array_equal(
        flat, featurize(["GTACAAAGCACGTTATTAGATGGTGGGAAC"]))


def test_ensemble_predict_empty_batch():
    ens = doench_mod.load_ensemble()
    out = doench_mod.ensemble_predict(ens, np.zeros((0, N_FEATURES)))
    assert out.shape == (0, 1) and out.dtype == np.float32


def test_ensemble_predict_wide_trees_no_int8_wrap():
    """Trees with >127 nodes must not wrap node ids through int8."""
    from guidemaker_tpu.score.onnx_tree import TreeEnsemble
    # one left-spine tree with 201 nodes: internal node i -> (i+1, i+2),
    # feature 0 threshold descending so x=0 descends the left spine to a
    # deep leaf whose id (>127) would wrap as int8
    n_nodes = 201
    feature = np.zeros((1, n_nodes), dtype=np.int32)
    threshold = np.full((1, n_nodes), -1.0, dtype=np.float32)
    children = np.zeros((1, n_nodes, 2), dtype=np.int32)
    is_leaf = np.zeros((1, n_nodes), dtype=bool)
    value = np.zeros((1, n_nodes), dtype=np.float32)
    for i in range(0, n_nodes - 1, 2):
        children[0, i] = (i + 1, i + 2)  # x > -1 -> right child i+2
        is_leaf[0, i + 1] = True
        value[0, i + 1] = -99.0
    is_leaf[0, n_nodes - 1] = True
    value[0, n_nodes - 1] = 7.5  # node id 200: wraps to -56 as int8
    ens = TreeEnsemble(feature=feature, threshold=threshold,
                       children=children, is_leaf=is_leaf, value=value,
                       base_value=1.0, max_depth=(n_nodes - 1) // 2 + 1)
    out = doench_mod.ensemble_predict(ens, np.zeros((3, 1), np.float32))
    np.testing.assert_allclose(out.ravel(), [8.5, 8.5, 8.5])
