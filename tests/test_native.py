"""Native (C++) runtime parity tests vs the numpy/JAX reference paths."""
import numpy as np
import pytest

from guidemaker_tpu import dna, native
from guidemaker_tpu.knn.hamming import hamming_topk
from guidemaker_tpu.knn.leven import leven_block
from guidemaker_tpu.scan import scan_motif

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_encode_parity():
    s = "ACGTNacgtMRWS"
    want = dna.STRICT_BYTE_TO_CODE[np.frombuffer(s.encode(), np.uint8)]
    np.testing.assert_array_equal(native.encode(s), want)


@pytest.mark.parametrize("pam", ["NGG", "TTTV", "NNGRRT"])
def test_scan_parity(pam):
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 5, size=50000).astype(np.uint8)
    masks = dna.pam_bit_masks(pam)
    np.testing.assert_array_equal(native.scan_pam(genome, masks),
                                  scan_motif(genome, masks))


@pytest.mark.parametrize("L,k", [(20, 3), (27, 10), (12, 2)])
def test_hamming_topk_parity(L, k):
    rng = np.random.default_rng(L * k)
    db = rng.integers(0, 4, size=(700, L)).astype(np.uint8)
    q = db[:150]
    dn, idxn = native.hamming_topk(q, db, k)
    dj, idxj = hamming_topk(dna.one_hot_matrix(q), dna.one_hot_matrix(db), k, L)
    np.testing.assert_array_equal(dn, dj)
    np.testing.assert_array_equal(idxn, idxj)


def test_hamming_topk_threads_deterministic():
    rng = np.random.default_rng(9)
    db = rng.integers(0, 4, size=(500, 20)).astype(np.uint8)
    d1, i1 = native.hamming_topk(db, db, 4, n_threads=1)
    d8, i8 = native.hamming_topk(db, db, 4, n_threads=8)
    np.testing.assert_array_equal(d1, d8)
    np.testing.assert_array_equal(i1, i8)


def test_hamming_k_exceeds_db():
    db = np.zeros((2, 10), dtype=np.uint8)
    d, i = native.hamming_topk(db, db, 5)
    assert (d[:, 2:] == -1).all()


def test_levenshtein_parity():
    rng = np.random.default_rng(4)
    for L in (8, 20, 27):
        a = rng.integers(0, 4, size=(1, L)).astype(np.uint8)
        b = rng.integers(0, 4, size=(1, L)).astype(np.uint8)
        want = int(np.asarray(leven_block(a, b, length=L))[0, 0])
        assert native.levenshtein(a[0], b[0]) == want


@pytest.mark.parametrize("L,k", [(20, 3), (27, 10), (32, 4)])
def test_leven_topk_parity(L, k):
    """Native Myers top-k == JAX leven_topk (distances, indices, and
    tie-break ordering) on a mixed near-duplicate/random pool."""
    from guidemaker_tpu.knn.leven import leven_topk
    rng = np.random.default_rng(L + k)
    db = rng.integers(0, 4, size=(600, L)).astype(np.uint8)
    db[200:400] = db[:200]          # exact duplicates -> distance-0 ties
    q = db[:150].copy()
    q[50:100, 0] = (q[50:100, 0] + 1) % 4
    dn, idxn = native.leven_topk(q, db, k)
    dj, idxj = leven_topk(q, db, k)
    np.testing.assert_array_equal(dn, dj)
    np.testing.assert_array_equal(idxn, idxj)


def test_leven_topk_threads_and_k_pad():
    rng = np.random.default_rng(7)
    db = rng.integers(0, 4, size=(300, 20)).astype(np.uint8)
    d1, i1 = native.leven_topk(db, db, 4, n_threads=1)
    d8, i8 = native.leven_topk(db, db, 4, n_threads=8)
    np.testing.assert_array_equal(d1, d8)
    np.testing.assert_array_equal(i1, i8)
    assert (d1[:, 0] == 0).all() and (i1[:, 0] == np.arange(300)).all()
    dp, ip = native.leven_topk(db[:5], db[:2], 6)
    assert dp.shape == (5, 6) and (dp[:, 2:] == -1).all()
    with pytest.raises(ValueError):
        native.leven_topk(np.zeros((1, 33), np.uint8),
                          np.zeros((1, 33), np.uint8), 1)


def test_leven_topk_vs_scalar_dp_oracle():
    """Myers distances (not just ordering) match the full-DP C oracle."""
    rng = np.random.default_rng(23)
    L = 20
    db = rng.integers(0, 4, size=(40, L)).astype(np.uint8)
    q = rng.integers(0, 4, size=(10, L)).astype(np.uint8)
    d, idx = native.leven_topk(q, db, 40)
    for qi in range(10):
        want = np.array([native.levenshtein(q[qi], db[j]) for j in range(40)])
        got = np.empty(40, np.int32)
        got[idx[qi]] = d[qi]
        np.testing.assert_array_equal(got, want)


def test_banded_and_block_vs_native_oracle_10k_pairs():
    """VERDICT r1 item 3 done-criterion: >=1e4 random pairs verified
    against the C++ gm_levenshtein oracle — both the full-DP block kernel
    and the banded verifier (exact below the band, clipped above)."""
    import jax.numpy as jnp
    from guidemaker_tpu.knn.leven import banded_leven_pairs
    rng = np.random.default_rng(101)
    n, L = 10_000, 20
    a = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    b = a.copy()
    # mix: exact copies, near-duplicates (subs + shifts), random
    third = n // 3
    for i in range(third, 2 * third):
        nsub = rng.integers(0, 3)
        for _ in range(nsub):
            p = rng.integers(0, L)
            b[i, p] = (b[i, p] + rng.integers(1, 4)) % 4
        if rng.random() < 0.5:  # one indel pair, length preserved
            p = rng.integers(0, L - 1)
            b[i] = np.concatenate([np.delete(b[i], p),
                                   rng.integers(0, 4, size=1,
                                                dtype=np.uint8)])
    b[2 * third:] = rng.integers(0, 4, size=(n - 2 * third, L))

    want = np.array([native.levenshtein(a[i], b[i]) for i in range(n)],
                    dtype=np.int32)
    for t in (1, 2, 4):
        got = np.asarray(banded_leven_pairs(jnp.asarray(a), jnp.asarray(b),
                                            t=t, length=L))
        np.testing.assert_array_equal(got, np.minimum(want, t + 1))
    # full-DP block kernel on a diagonal slice of the pair set
    m = 512
    blk = np.asarray(leven_block(jnp.asarray(a[:m]), jnp.asarray(b[:m]),
                                 length=L))
    np.testing.assert_array_equal(np.diagonal(blk), want[:m])


def test_ambiguous_codes_fall_back_to_jax_paths():
    """Guides containing N (code 4) must not take the native engines:
    the 2-bit packing would alias N to 'A'. The driver's gate routes
    them to the JAX paths, which must agree with the xla backend."""
    from guidemaker_tpu.knn.driver import KnnIndex
    seqs = ["ACGTACGTACGTACGTACGT",
            "NCGTACGTACGTACGTACGT",     # N aliases to A if packed
            "TTTTACGTACGTACGTACGT"]
    for metric in ("hamming", "leven"):
        idx_n = KnnIndex(seqs, metric=metric, backend="native")
        idx_x = KnnIndex(seqs, metric=metric, backend="xla")
        d_n, i_n = idx_n.query(seqs, k=3)
        d_x, i_x = idx_x.query(seqs, k=3)
        np.testing.assert_array_equal(d_n, d_x)
        np.testing.assert_array_equal(i_n, i_x)
        # the N guide must NOT be at distance 0 from the A guide
        assert d_n[0][i_n[0] == 1][0] > 0
