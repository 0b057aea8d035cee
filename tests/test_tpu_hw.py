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
