"""Fused Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest

from guidemaker_tpu import dna
from guidemaker_tpu.knn.driver import KnnIndex, _default_backend
from guidemaker_tpu.knn.hamming import hamming_topk
from guidemaker_tpu.knn.pallas_hamming import pallas_hamming_topk


def _onehot(rng, n, length):
    return dna.one_hot_matrix(
        rng.integers(0, 4, size=(n, length)).astype(np.uint8))


@pytest.mark.parametrize("nq,nd,k,L", [
    (100, 300, 3, 20), (257, 1025, 10, 27), (64, 64, 2, 12)])
def test_pallas_matches_xla(nq, nd, k, L):
    rng = np.random.default_rng(nq + nd)
    q, db = _onehot(rng, nq, L), _onehot(rng, nd, L)
    d1, i1 = hamming_topk(q, db, k, L)
    d2, i2 = pallas_hamming_topk(q, db, k, L, db_tile=256, q_tile=64,
                                 interpret=True)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_pallas_multi_tile_revisit():
    # multiple q and db tiles: accumulator revisiting across the db grid dim
    rng = np.random.default_rng(7)
    q, db = _onehot(rng, 64, 20), _onehot(rng, 1024, 20)
    d1, i1 = hamming_topk(q, db, 5, 20)
    d2, i2 = pallas_hamming_topk(q, db, 5, 20, db_tile=128, q_tile=16,
                                 interpret=True)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_pallas_k_exceeds_db():
    rng = np.random.default_rng(1)
    q, db = _onehot(rng, 8, 20), _onehot(rng, 3, 20)
    d, i = pallas_hamming_topk(q, db, 6, 20, interpret=True)
    assert (d[:, 3:] == -1).all() and (i[:, 3:] == -1).all()


def test_backend_selection_env(monkeypatch):
    monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", "native")
    assert _default_backend() == "native"
    monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", "xla")
    assert _default_backend() == "xla"
    monkeypatch.delenv("GUIDEMAKER_TPU_KERNEL")
    # 8 virtual devices in tests -> auto-sharded; single-device -> pallas/xla
    assert _default_backend() in ("pallas", "xla", "sharded")


def test_index_backends_agree():
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=20)) for _ in range(300)]
    res = {}
    for backend in ("xla", "native"):
        idx = KnnIndex(seqs, backend=backend)
        res[backend] = idx.query(seqs[:50], 4)
    np.testing.assert_array_equal(res["xla"][0], res["native"][0])
    np.testing.assert_array_equal(res["xla"][1], res["native"][1])


def test_stream_kernel_matches_xla():
    from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
    from guidemaker_tpu.knn.pallas_stream import stream_topk_device
    rng = np.random.default_rng(23)
    codes = rng.integers(0, 4, size=(700, 20)).astype(np.uint8)
    db_dev = prepare_db_codes(codes, 128)
    d_s, i_s = stream_topk_device(codes[:100], db_dev, 700, 4, 20,
                                  db_tile=128, q_tile=32)
    q_oh = dna.one_hot_matrix(codes[:100])
    db_oh = dna.one_hot_matrix(codes)
    d_x, i_x = hamming_topk(q_oh, db_oh, 4, 20)
    np.testing.assert_array_equal(d_s, d_x)
    np.testing.assert_array_equal(i_s, i_x)


def test_stream_kernel_k_exceeds_db():
    from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
    from guidemaker_tpu.knn.pallas_stream import stream_topk_device
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(3, 20)).astype(np.uint8)
    db_dev = prepare_db_codes(codes, 128)
    d, i = stream_topk_device(codes, db_dev, 3, 6, 20, db_tile=128)
    assert (d[:, 3:] == -1).all() and (i[:, 3:] == -1).all()


def test_stream_count_matches_oracle():
    from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
    from guidemaker_tpu.knn.pallas_stream import stream_count_device
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, size=(600, 20)).astype(np.uint8)
    db_dev = prepare_db_codes(codes, 128)
    for editdist in (0, 1, 3, 20):
        counts = stream_count_device(codes[:90], db_dev, 600, editdist, 20,
                                     db_tile=128, q_tile=32)
        # numpy oracle over raw codes
        dist = (codes[:90, None, :] != codes[None, :, :]).sum(axis=2)
        oracle = (dist < editdist).sum(axis=1).astype(np.int32)
        np.testing.assert_array_equal(counts, oracle)


def test_pass_distance_filter_matches_query_threshold():
    # counting path and k=2-query path must agree on retention decisions
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(400, 20)).astype(np.uint8)
    # inject near-duplicates so some guides fail the filter
    codes[10] = codes[11]; codes[12] = codes[13]; codes[12, 0] ^= 1
    seqs = dna.decode_rows(codes)
    idx = KnnIndex(list(dict.fromkeys(seqs)), backend="xla")
    queries = list(dict.fromkeys(seqs))
    dists, _ = idx.query(queries, k=2)
    expect = (dists[:, 1] >= 0) & (dists[:, 1] >= 2)
    got = idx.pass_distance_filter(queries, 2)
    np.testing.assert_array_equal(got, expect)


def test_pass_distance_filter_singleton_db():
    idx = KnnIndex(["ACGTACGTACGTACGTACGT"], backend="xla")
    assert not idx.pass_distance_filter(["ACGTACGTACGTACGTACGT"], 2).any()


def test_pass_distance_filter_nonmember_queries_fall_back():
    """Non-member queries must take the general k=2 path: a non-member
    with exactly one close neighbor in the db would wrongly pass the
    counting shortcut (its 'self-hit' is absent)."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=(300, 20)).astype(np.uint8)
    seqs = list(dict.fromkeys(dna.decode_rows(codes)))
    # non-member query at distance 1 from db entry 0
    qcodes = dna.encode(seqs[0]).copy()
    qcodes[0] ^= 1
    q = dna.decode_rows(qcodes[None, :])[0]
    assert q not in set(seqs)
    for backend in ("xla", "sharded"):
        idx = KnnIndex(seqs, backend=backend)
        got = idx.pass_distance_filter([q, seqs[1]], 2)
        dists, _ = idx.query([q, seqs[1]], k=2)
        expect = (dists[:, 1] >= 0) & (dists[:, 1] >= 2)
        np.testing.assert_array_equal(got, expect)
        # the planted near-duplicate pair: nearest hit is dist 1 -> via the
        # general semantics dists[0]=1 (not self), dists[1] decides
        assert got[0] == expect[0]


def test_pass_distance_filter_duplicated_db_falls_back():
    """A database containing duplicate strings breaks the counting
    invariant (self-hit count 2); driver must detect and fall back."""
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=(200, 20)).astype(np.uint8)
    seqs = list(dict.fromkeys(dna.decode_rows(codes)))
    dup_seqs = seqs + [seqs[0]]  # duplicate entry
    idx = KnnIndex(dup_seqs, backend="sharded")
    got = idx.pass_distance_filter(dup_seqs[:50], 2)
    dists, _ = idx.query(dup_seqs[:50], k=2)
    expect = (dists[:, 1] >= 0) & (dists[:, 1] >= 2)
    np.testing.assert_array_equal(got, expect)
    assert not got[0]  # the duplicated guide has a 0-distance neighbor


def test_pass_mask_chunks_matches_within_and_oracle():
    """The fixed-shape chunked triage (one counting executable for every
    control rung) must agree with pass_mask_within and the numpy oracle,
    including tail rows beyond the rung size."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    codes = rng.integers(0, 4, size=(500, 20)).astype(np.uint8)
    idx = KnnIndex(dna.decode_rows(codes), backend="pallas")
    cand = rng.integers(0, 4, size=(700, 20)).astype(np.uint8)
    cand[5] = codes[3]                      # exact member -> close hit
    cand[40] = codes[8]; cand[40, 0] ^= 1   # distance-1 neighbor
    for editdist in (1, 7):
        dist = (cand[:, None, :] != codes[None, :, :]).sum(axis=2)
        oracle = ((dist < editdist).sum(axis=1) == 0).astype(np.uint8)
        got_within = idx.pass_mask_within(jnp.asarray(cand), editdist)
        np.testing.assert_array_equal(got_within, oracle)
        # equal-shape chunks, including a row count that is NOT a
        # q_tile multiple (the kernel grid floor-divides by q_tile, so
        # unpadded tail rows would read an unwritten output buffer)
        for rows in (384, 350):
            pad = np.concatenate(
                [cand, rng.integers(0, 4, size=(2 * rows - 700, 20),
                                    dtype=np.uint8)])
            chunks = [jnp.asarray(pad[:rows]), jnp.asarray(pad[rows:])]
            got_chunks = idx.pass_mask_chunks(chunks, editdist)
            assert got_chunks.shape == (2 * rows,)
            np.testing.assert_array_equal(got_chunks[:700], oracle)
