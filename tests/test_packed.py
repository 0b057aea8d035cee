"""Packed-pair kernel tests (pallas_packed.py): tetrahedron encoding math,
exact scale-decode, and count/top-k parity with a brute-force numpy oracle
(interpret mode on CPU; the TPU tier re-runs these on hardware)."""
import numpy as np
import pytest

from guidemaker_tpu.knn import pallas_packed as pp
from guidemaker_tpu.knn.driver import KnnIndex, _use_packed
from guidemaker_tpu import dna

RNG = np.random.default_rng(7)


def _rand_codes(n, length=20):
    return RNG.integers(0, 4, (n, length), dtype=np.uint8)


def _hamming_matrix(q, d):
    return (q[:, None, :] != d[None, :, :]).sum(axis=2)


def test_tetra_dot_counts_matches():
    """sum(tetra(x) . tetra(y)) == 4*matches - L for random pairs."""
    q = _rand_codes(50)
    d = _rand_codes(60)
    tq = np.asarray(pp._tetra_rows(q, length=20)).astype(np.int32)
    td = np.asarray(pp._tetra_rows(d, length=20)).astype(np.int32)
    dots = tq @ td.T
    matches = 20 - _hamming_matrix(q, d)
    np.testing.assert_array_equal(dots, 4 * matches - 20)


@pytest.mark.parametrize("length", [10, 20, 21])
def test_scale_decode_exact_over_full_range(length):
    """floor((v+L+0.5)/s) recovers A exactly for every (A, B) pair in range."""
    s = pp.pack_scale(length)
    a = np.arange(-length, 3 * length + 1, dtype=np.int32)
    b = np.arange(-length, 3 * length + 1, dtype=np.int32)
    v = (s * a[:, None] + b[None, :]).astype(np.int32)
    vl = (v + length).astype(np.float32) + np.float32(0.5)
    dec_a = np.floor(vl * np.float32(1.0 / s)).astype(np.int32)
    dec_b = v - s * dec_a
    np.testing.assert_array_equal(dec_a, np.broadcast_to(a[:, None], v.shape))
    np.testing.assert_array_equal(dec_b, np.broadcast_to(b[None, :], v.shape))


@pytest.mark.parametrize("nd", [257, 512])   # odd nd exercises pad slot
def test_packed_count_matches_oracle(nd):
    length, editdist = 20, 5
    db = _rand_codes(nd, length)
    q = _rand_codes(100, length)
    db_tile = 128
    db_dev = pp.prepare_db_packed(db, db_tile)
    counts = pp.packed_count_device(q, db_dev, nd, editdist, length,
                                    db_tile=db_tile, interpret=True)
    oracle = (_hamming_matrix(q, db) < editdist).sum(axis=1)
    np.testing.assert_array_equal(counts, oracle)


def test_packed_topk_matches_oracle():
    length, k, nd = 20, 5, 300
    db = _rand_codes(nd, length)
    q = _rand_codes(64, length)
    db_tile = 128
    db_dev = pp.prepare_db_packed(db, db_tile)
    dist, idx = pp.packed_topk_device(q, db_dev, nd, k, length,
                                      db_tile=db_tile, interpret=True)
    dm = _hamming_matrix(q, db)
    # oracle: ascending (distance, index)
    order = np.lexsort((np.broadcast_to(np.arange(nd), dm.shape), dm), axis=1)
    want_idx = order[:, :k]
    want_dist = np.take_along_axis(dm, want_idx, axis=1)
    np.testing.assert_array_equal(dist, want_dist)
    np.testing.assert_array_equal(idx, want_idx)


def test_packed_topk_k_exceeds_nd():
    length = 20
    db = _rand_codes(3, length)
    q = _rand_codes(4, length)
    db_dev = pp.prepare_db_packed(db, 128)
    dist, idx = pp.packed_topk_device(q, db_dev, 3, 5, length,
                                      db_tile=128, interpret=True)
    assert (dist[:, 3:] == -1).all() and (idx[:, 3:] == -1).all()
    assert (idx[:, :3] >= 0).all()


def test_driver_routes_packed_and_matches_xla(monkeypatch):
    """KnnIndex on the pallas backend with a streaming-size db routes
    through the packed kernels and agrees with the XLA backend."""
    monkeypatch.setenv("GUIDEMAKER_TPU_PACKED", "1")
    monkeypatch.setattr("guidemaker_tpu.knn.driver.STREAM_THRESHOLD", 64)
    nd = 200
    seqs = dna.decode_rows(_rand_codes(nd))
    seqs = list(dict.fromkeys(seqs))
    qs = seqs[:40]
    idx_p = KnnIndex(seqs, metric="hamming", backend="pallas")
    idx_x = KnnIndex(seqs, metric="hamming", backend="xla")
    assert _use_packed(idx_p.length)
    dp, ip = idx_p.query(qs, k=3)
    dx, ix = idx_x.query(qs, k=3)
    np.testing.assert_array_equal(dp, dx)
    np.testing.assert_array_equal(ip, ix)
    fp = idx_p.pass_distance_filter(qs, 2)
    fx = idx_x.pass_distance_filter(qs, 2)
    np.testing.assert_array_equal(fp, fx)
    cand = _rand_codes(30)
    np.testing.assert_array_equal(idx_p.count_within(cand, 5),
                                  idx_x.count_within(cand, 5))


def test_packed_gate(monkeypatch):
    monkeypatch.setenv("GUIDEMAKER_TPU_PACKED", "1")
    assert not _use_packed(25)   # too long for 2x3L <= 128 lanes
    assert _use_packed(21)
    monkeypatch.delenv("GUIDEMAKER_TPU_PACKED")
    assert not _use_packed(20)   # opt-in only (slower on v5e, see driver)
