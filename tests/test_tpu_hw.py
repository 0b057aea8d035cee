"""Hardware tier: Pallas kernels compiled for a real TPU chip.

The main suite runs on the CPU backend, where Pallas executes under
``interpret=True`` — these tests validate the same kernels compiled for
actual TPU hardware (Mosaic), against a numpy popcount oracle.

Run with::

    GUIDEMAKER_TPU_HW=1 python -m pytest tests/ -m tpu -q

(conftest.py skips everything else in that mode, and skips these tests
otherwise).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

LENGTH = 20


def _require_tpu():
    import jax
    if jax.devices()[0].platform != "tpu":
        pytest.skip("no TPU device present")


def _random_unique_seqs(n, length=LENGTH, seed=0):
    rng = np.random.default_rng(seed)
    seen = {}
    bases = np.array(list("ACGT"))
    while len(seen) < n:
        chunk = rng.integers(0, 4, size=(n, length))
        for row in chunk:
            s = "".join(bases[row])
            seen.setdefault(s, None)
            if len(seen) == n:
                break
    return list(seen.keys())


def _oracle_topk(q_seqs, db_seqs, k):
    """Exact (distance, index) top-k, tie-broken by database index."""
    from guidemaker_tpu import dna
    qc = dna.encode_batch(q_seqs, LENGTH).astype(np.int16)
    dc = dna.encode_batch(db_seqs, LENGTH).astype(np.int16)
    dists = (qc[:, None, :] != dc[None, :, :]).sum(axis=2).astype(np.int64)
    keys = dists * len(db_seqs) + np.arange(len(db_seqs))[None, :]
    part = np.sort(keys, axis=1)[:, :k]
    return (part // len(db_seqs)).astype(np.int32), \
           (part % len(db_seqs)).astype(np.int32)


def test_fused_pallas_topk_matches_oracle_on_hw():
    _require_tpu()
    from guidemaker_tpu.knn import KnnIndex
    seqs = _random_unique_seqs(3000, seed=1)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    d, i = idx.query(seqs[:512], k=4)
    od, oi = _oracle_topk(seqs[:512], seqs, 4)
    np.testing.assert_array_equal(d, od)
    np.testing.assert_array_equal(i, oi)


def test_streaming_pallas_topk_matches_oracle_on_hw():
    _require_tpu()
    from guidemaker_tpu.knn import KnnIndex
    from guidemaker_tpu.knn.driver import STREAM_THRESHOLD
    n = STREAM_THRESHOLD + 4096
    seqs = _random_unique_seqs(n, seed=2)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    q = seqs[1000:1256]
    d, i = idx.query(q, k=3)
    od, oi = _oracle_topk(q, seqs, 3)
    np.testing.assert_array_equal(d, od)
    np.testing.assert_array_equal(i, oi)


def test_streaming_counting_retention_on_hw():
    _require_tpu()
    from guidemaker_tpu.knn import KnnIndex
    from guidemaker_tpu.knn.driver import STREAM_THRESHOLD
    n = STREAM_THRESHOLD + 512
    seqs = _random_unique_seqs(n, seed=3)
    # plant a close pair so at least one query fails the filter
    seqs[10] = seqs[7][:-1] + ("A" if seqs[7][-1] != "A" else "C")
    seqs = list(dict.fromkeys(seqs))
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    queries = seqs[:2048]
    got = idx.pass_distance_filter(queries, editdist=2)
    d, _ = _oracle_topk(queries, seqs, 2)
    want = d[:, 1] >= 2
    np.testing.assert_array_equal(got, want)
    assert not got[7] and not got[10]


def test_streaming_packed_driver_path_on_hw(monkeypatch):
    """The opt-in packed-pair driver routing works end to end on chip."""
    monkeypatch.setenv("GUIDEMAKER_TPU_PACKED", "1")
    _require_tpu()
    from guidemaker_tpu.knn import KnnIndex
    from guidemaker_tpu.knn.driver import STREAM_THRESHOLD
    n = STREAM_THRESHOLD + 512
    seqs = _random_unique_seqs(n, seed=4)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    q = seqs[:256]
    d, i = idx.query(q, k=3)
    od, oi = _oracle_topk(q, seqs, 3)
    np.testing.assert_array_equal(d, od)
    np.testing.assert_array_equal(i, oi)
    got = idx.pass_distance_filter(q, editdist=2)
    np.testing.assert_array_equal(got, od[:, 1] >= 2)


def test_packed_kernels_match_onehot_on_hw():
    """Packed-pair kernels (Mosaic-compiled) == one-hot kernels on chip."""
    _require_tpu()
    import jax.numpy as jnp
    from guidemaker_tpu import dna
    from guidemaker_tpu.knn import pallas_packed as pp
    from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
    from guidemaker_tpu.knn.pallas_stream import (stream_count_device,
                                                  stream_topk_device)
    seqs = _random_unique_seqs(4097, seed=5)   # odd: exercises pad slot
    codes = dna.encode_batch(seqs, LENGTH).astype(np.uint8)
    nd = codes.shape[0]
    db_oh = prepare_db_codes(codes, 1024)
    db_pk = pp.prepare_db_packed(codes, 512)
    q = codes[:256]
    d1, i1 = stream_topk_device(q, db_oh, nd, 4, LENGTH, db_tile=1024)
    d2, i2 = pp.packed_topk_device(q, db_pk, nd, 4, LENGTH, db_tile=512)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)
    c1 = stream_count_device(q, db_oh, nd, 5, LENGTH, db_tile=1024)
    c2 = pp.packed_count_device(q, db_pk, nd, 5, LENGTH, db_tile=512)
    np.testing.assert_array_equal(c1, c2)


def test_leven_kernels_on_hw():
    """Levenshtein cummin-DP top-k + dilated retention filter on chip."""
    _require_tpu()
    from guidemaker_tpu import dna
    from guidemaker_tpu.knn.leven import leven_pass_filter, leven_topk

    def _oracle_leven(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    seqs = _random_unique_seqs(600, seed=6)
    codes = dna.encode_batch(seqs, LENGTH).astype(np.uint8)
    d, i = leven_topk(codes[:40], codes, 3, db_tile=128)
    # both block engines must agree on chip (myers is the default)
    dd, ii = leven_topk(codes[:40], codes, 3, db_tile=128, engine="dp")
    np.testing.assert_array_equal(d, dd)
    np.testing.assert_array_equal(i, ii)
    for qi in range(40):
        dists = np.array([_oracle_leven(seqs[qi], s) for s in seqs])
        keys = dists.astype(np.int64) * len(seqs) + np.arange(len(seqs))
        top = np.sort(keys)[:3]
        np.testing.assert_array_equal(d[qi], top // len(seqs))
        np.testing.assert_array_equal(i[qi], top % len(seqs))
    got = leven_pass_filter(codes, codes, 2)
    for qi in range(0, 600, 37):
        dists = sorted(_oracle_leven(seqs[qi], s) for s in seqs)
        assert got[qi] == (dists[1] >= 2)


def test_fused_sharded_tier_on_1device_mesh_on_hw():
    """The shard_map fused tier compiles and runs on a real 1-chip mesh."""
    _require_tpu()
    import jax
    from guidemaker_tpu import dna
    from guidemaker_tpu.knn.sharded import (fused_sharded_count,
                                            fused_sharded_topk, make_mesh,
                                            prepare_db_sharded)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    seqs = _random_unique_seqs(2048, seed=7)
    codes = dna.encode_batch(seqs, LENGTH).astype(np.uint8)
    sdb = prepare_db_sharded(codes, mesh, db_tile=256)
    d, i = fused_sharded_topk(codes[:128], sdb, 3)
    od, oi = _oracle_topk(seqs[:128], seqs, 3)
    np.testing.assert_array_equal(d, od)
    np.testing.assert_array_equal(i, oi)
    counts = fused_sharded_count(codes[:128], sdb, 3)
    dm, _ = _oracle_topk(seqs[:128], seqs, 2048)
    np.testing.assert_array_equal(counts, (dm < 3).sum(axis=1))
