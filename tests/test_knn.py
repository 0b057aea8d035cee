"""k-NN engine tests: numpy/python oracles, determinism, reference goldens."""
import numpy as np
import pytest

from guidemaker_tpu import dna
from guidemaker_tpu.knn import KnnIndex, knn_search
from guidemaker_tpu.knn.hamming import hamming_topk, pack_keys, unpack_keys
from guidemaker_tpu.knn.leven import leven_block, leven_topk


def _random_seqs(rng, n, length):
    return ["".join(rng.choice(list("ACGT"), size=length)) for _ in range(n)]


def _oracle_hamming(q, db):
    qa = np.stack([dna.encode(s) for s in q])
    da = np.stack([dna.encode(s) for s in db])
    return (qa[:, None, :] != da[None, :, :]).sum(axis=2)


def _oracle_leven(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _topk_oracle(dist_matrix, k):
    """ascending (dist, idx) per row."""
    nq, nd = dist_matrix.shape
    keys = dist_matrix.astype(np.int64) * (1 << 24) + np.arange(nd)[None, :]
    order = np.sort(keys, axis=1)[:, :k]
    return (order >> 24).astype(np.int32), (order & ((1 << 24) - 1)).astype(np.int32)


def test_pack_unpack_keys_roundtrip():
    d = np.array([[0, 3], [40, 1]], dtype=np.int32)
    i = np.array([[7, 123456], [0, 2]], dtype=np.int32)
    import jax.numpy as jnp
    keys = np.asarray(pack_keys(jnp.asarray(d), jnp.asarray(i)))
    dd, ii = unpack_keys(keys)
    assert (dd == d).all() and (ii == i).all()


@pytest.mark.parametrize("nq,nd,k", [(5, 7, 3), (100, 300, 5), (257, 1025, 20)])
def test_hamming_topk_vs_oracle(nq, nd, k):
    rng = np.random.default_rng(nq * nd)
    q = _random_seqs(rng, nq, 20)
    db = _random_seqs(rng, nd, 20)
    dists, idx = knn_search(db, q, k, metric="hamming")
    odists, oidx = _topk_oracle(_oracle_hamming(q, db), k)
    np.testing.assert_array_equal(dists, odists)
    np.testing.assert_array_equal(idx, oidx)


def test_hamming_self_distance_zero():
    rng = np.random.default_rng(0)
    seqs = _random_seqs(rng, 50, 20)
    dists, idx = knn_search(seqs, seqs, 2, metric="hamming")
    assert (dists[:, 0] == 0).all()
    np.testing.assert_array_equal(idx[:, 0], np.arange(50))


def test_hamming_tie_break_by_index():
    db = ["AAAA", "AAAT", "AAAT", "TTTT"]
    dists, idx = knn_search(db, ["AAAA"], 3, metric="hamming")
    np.testing.assert_array_equal(dists[0], [0, 1, 1])
    np.testing.assert_array_equal(idx[0], [0, 1, 2])


def test_k_larger_than_db_pads_with_minus_one():
    dists, idx = knn_search(["ACGT", "TTTT"], ["ACGT"], 5)
    assert (dists[0, 2:] == -1).all() and (idx[0, 2:] == -1).all()


@pytest.mark.parametrize("L", [8, 20, 27])
def test_leven_block_vs_oracle(L):
    rng = np.random.default_rng(L)
    q = _random_seqs(rng, 12, L)
    db = _random_seqs(rng, 17, L)
    qa = np.stack([dna.encode(s) for s in q])
    da = np.stack([dna.encode(s) for s in db])
    got = np.asarray(leven_block(qa, da, length=L))
    want = np.array([[_oracle_leven(a, b) for b in db] for a in q])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("L", [5, 8, 20, 27])
def test_leven_block_myers_vs_oracle(L):
    """Bit-parallel Myers block == DP oracle, including near-identical
    pairs (distances 0/1 exercise the horizontal carry chain)."""
    from guidemaker_tpu.knn.leven import leven_block_myers
    rng = np.random.default_rng(100 + L)
    q = _random_seqs(rng, 12, L)
    db = _random_seqs(rng, 17, L)
    db[0] = q[0]                      # identical pair (dist 0)
    db[1] = q[1][:-1] + ("A" if q[1][-1] != "A" else "C")   # 1 sub
    qa = np.stack([dna.encode(s) for s in q])
    da = np.stack([dna.encode(s) for s in db])
    got = np.asarray(leven_block_myers(qa, da, length=L))
    want = np.array([[_oracle_leven(a, b) for b in db] for a in q])
    np.testing.assert_array_equal(got, want)


def test_leven_topk_engines_agree():
    """leven_topk "myers" (default) and "dp" produce identical
    (dist, idx) top-k including tie-breaks."""
    from guidemaker_tpu.knn.leven import leven_topk
    rng = np.random.default_rng(11)
    q = _random_seqs(rng, 40, 20)
    db = _random_seqs(rng, 300, 20)
    qa = np.stack([dna.encode(s) for s in q])
    da = np.stack([dna.encode(s) for s in db])
    dm, im = leven_topk(qa, da, 4, db_tile=128, engine="myers")
    dd, id_ = leven_topk(qa, da, 4, db_tile=128, engine="dp")
    np.testing.assert_array_equal(dm, dd)
    np.testing.assert_array_equal(im, id_)


def test_leven_topk_vs_oracle():
    rng = np.random.default_rng(7)
    q = _random_seqs(rng, 40, 20)
    db = _random_seqs(rng, 200, 20)
    dists, idx = knn_search(db, q, 4, metric="leven")
    dm = np.array([[_oracle_leven(a, b) for b in db] for a in q])
    odists, oidx = _topk_oracle(dm, 4)
    np.testing.assert_array_equal(dists, odists)
    np.testing.assert_array_equal(idx, oidx)


def test_leven_insertion_semantics():
    # 1 substitution vs 1 insertion: leven sees 1 and 2, hamming sees 1 and 16
    # (the reference's key semantic contract, test_core.py:319-348)
    g1 = "CTAGTCACTAGCTGACAGCA"
    g2 = "CTAGACACTAGCTGACAGCA"
    g3 = "TAGTCACTAGCTGACTAGCA"
    dl, _ = knn_search([g1, g2, g3], [g1], 3, metric="leven")
    dh, _ = knn_search([g1, g2, g3], [g1], 3, metric="hamming")
    assert dl[0].tolist() == [0, 1, 2]
    assert dh[0].tolist() == [0, 1, 16]


def test_index_reuse_and_neighbor_seqs():
    rng = np.random.default_rng(3)
    db = _random_seqs(rng, 64, 20)
    index = KnnIndex(db, metric="hamming")
    d1, i1 = index.query(db[:5], 3)
    d2, i2 = index.query(db[:5], 3)
    np.testing.assert_array_equal(i1, i2)
    assert index.neighbor_seqs(i1[0]) == [db[j] for j in i1[0]]


def test_hamming_large_tiled_path():
    # force multiple db tiles and query tiles
    rng = np.random.default_rng(11)
    q = _random_seqs(rng, 70, 20)
    db = _random_seqs(rng, 600, 20)
    q_oh = dna.one_hot_matrix(np.stack([dna.encode(s) for s in q]))
    db_oh = dna.one_hot_matrix(np.stack([dna.encode(s) for s in db]))
    dists, idx = hamming_topk(q_oh, db_oh, 4, 20, db_tile=256, q_tile=32)
    odists, oidx = _topk_oracle(_oracle_hamming(q, db), 4)
    np.testing.assert_array_equal(dists, odists)
    np.testing.assert_array_equal(idx, oidx)


def test_leven_tiled_path():
    rng = np.random.default_rng(13)
    q = _random_seqs(rng, 30, 15)
    db = _random_seqs(rng, 300, 15)
    qa = np.stack([dna.encode(s) for s in q])
    da = np.stack([dna.encode(s) for s in db])
    dists, idx = leven_topk(qa, da, 3, db_tile=128, q_tile=16)
    dm = np.array([[_oracle_leven(a, b) for b in db] for a in q])
    odists, oidx = _topk_oracle(dm, 3)
    np.testing.assert_array_equal(dists, odists)
    np.testing.assert_array_equal(idx, oidx)


def test_index_save_load(tmp_path):
    rng = np.random.default_rng(17)
    db = _random_seqs(rng, 64, 20)
    idx = KnnIndex(db, metric="hamming")
    path = str(tmp_path / "index.npz")
    idx.save(path)
    idx2 = KnnIndex.load(path)
    assert idx2.seqs == db and idx2.metric == "hamming"
    d1, i1 = idx.query(db[:5], 3)
    d2, i2 = idx2.query(db[:5], 3)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


# ---------------------------------------------------------------------------
# Genome-scale Levenshtein machinery (leven.py banded DP + dilated filter)
# ---------------------------------------------------------------------------

def _mutate(rng, s, n_sub, n_indel):
    """Apply random edits to s, keeping the final length equal (pipeline
    guides share one length): each indel is an insert+delete pair."""
    chars = list(s)
    for _ in range(n_sub):
        i = rng.integers(0, len(chars))
        chars[i] = rng.choice([c for c in "ACGT" if c != chars[i]])
    for _ in range(n_indel):
        i = rng.integers(0, len(chars))
        del chars[i]
        j = rng.integers(0, len(chars) + 1)
        chars.insert(j, rng.choice(list("ACGT")))
    return "".join(chars)


@pytest.mark.parametrize("t", [1, 2, 4])
def test_banded_leven_pairs_vs_oracle(t):
    """Banded DP is exact below the band and clips to t+1 above it."""
    import jax.numpy as jnp
    from guidemaker_tpu.knn.leven import banded_leven_pairs
    rng = np.random.default_rng(7 * t)
    L = 20
    a = _random_seqs(rng, 64, L)
    # half near-duplicates (within band), half random (beyond band)
    b = [_mutate(rng, s, int(rng.integers(0, t + 1)), int(rng.integers(0, 2)))
         for s in a[:32]] + _random_seqs(rng, 32, L)
    ac = np.stack([dna.encode(s) for s in a]).astype(np.uint8)
    bc = np.stack([dna.encode(s) for s in b]).astype(np.uint8)
    got = np.asarray(banded_leven_pairs(jnp.asarray(ac), jnp.asarray(bc),
                                        t=t, length=L))
    want = np.array([min(_oracle_leven(x, y), t + 1) for x, y in zip(a, b)])
    np.testing.assert_array_equal(got, want)


def test_gram_filter_is_sound():
    """Any pair with leven < e must pass the positional 3-gram filter:
    dot(gram(q), dil_gram(db)) >= (L-q+1) - (e-1)*q, i.e. the counting
    kernel's pseudo-distance (L-q+1) - dot is < (e-1)*q + 1."""
    from guidemaker_tpu.knn.leven import GRAM_Q, _filter_feats
    rng = np.random.default_rng(13)
    L = 20
    for e in (2, 3, 5):
        t = e - 1
        base = _random_seqs(rng, 40, L)
        close = [_mutate(rng, s, int(rng.integers(0, t + 1)),
                         int(rng.integers(0, max(1, t))))
                 for s in base]
        keep = [(a, b) for a, b in zip(base, close)
                if _oracle_leven(a, b) < e]
        assert keep, "fixture should produce close pairs"
        qa = np.stack([dna.encode(a) for a, _ in keep]).astype(np.uint8)
        db = np.stack([dna.encode(b) for _, b in keep]).astype(np.uint8)
        qf = _filter_feats(qa, t, "q").astype(np.int32)
        df = _filter_feats(db, t, "db").astype(np.int32)
        dots = (qf * df).sum(axis=1)
        assert (dots >= (L - GRAM_Q + 1) - t * GRAM_Q).all()


def test_gram_feats_device_matches_host_oracle():
    """The jitted gram feature builder equals the independent numpy
    oracle, including INVALID-code (padding) grams zeroing out."""
    import jax.numpy as jnp
    from guidemaker_tpu.knn.leven import (_filter_feats,
                                          _gram_feats_on_device)
    rng = np.random.default_rng(31)
    codes = rng.integers(0, 5, size=(16, 20)).astype(np.uint8)  # incl. 4
    for t in (0, 1, 2, 4):
        want = _filter_feats(codes, t, "q" if t == 0 else "db")
        got = np.asarray(_gram_feats_on_device(jnp.asarray(codes), t=t))
        np.testing.assert_array_equal(got[:, :want.shape[1]], want)
        assert (got[:, want.shape[1]:] == 0).all()  # lane padding


def test_leven_pass_filter_vs_bruteforce():
    """The three-tier retention filter agrees with exact brute force."""
    from guidemaker_tpu.knn.leven import leven_pass_filter
    rng = np.random.default_rng(17)
    L = 20
    base = _random_seqs(rng, 150, L)
    # inject clusters of near-duplicates so some guides fail retention
    clustered = []
    for s in base[:30]:
        clustered.append(_mutate(rng, s, 1, 0))
        clustered.append(_mutate(rng, s, 0, 1))
    seqs = list(dict.fromkeys(base + clustered))
    codes = np.stack([dna.encode(s) for s in seqs]).astype(np.uint8)
    dm = np.array([[_oracle_leven(a, b) for b in seqs] for a in seqs])
    np.fill_diagonal(dm, 10 ** 6)
    # e=2: hamming shortcut; e=3: delset decomposition; e=4: gram tiers
    for e in (2, 3, 4):
        got = leven_pass_filter(codes, codes, e)
        want = dm.min(axis=1) >= e
        np.testing.assert_array_equal(got, want)


def test_delset_partner_mask_vs_bruteforce():
    """Deletion-set intersection (the ins+del half of the e=3 retention
    decomposition) against a brute-force variant-set oracle."""
    from guidemaker_tpu.knn.leven import _delset_partner_mask
    rng = np.random.default_rng(31)
    L = 9
    base = rng.integers(0, 4, (80, L)).astype(np.uint8)
    shifted = [np.concatenate([r[1:], rng.integers(0, 4, 1).astype(np.uint8)])
               for r in base[:15]]          # del+ins partners by construction
    codes = np.unique(np.concatenate([base, np.array(shifted)]), axis=0)
    n = codes.shape[0]
    got = _delset_partner_mask(codes)
    variant_sets = [{tuple(np.delete(codes[i], d)) for d in range(L)}
                    for i in range(n)]
    want = np.array([any(i != j and variant_sets[i] & variant_sets[j]
                         for j in range(n)) for i in range(n)])
    np.testing.assert_array_equal(got, want)
    assert got.any() and not got.all()      # fixture covers both outcomes


def test_leven_pass_filter_overflow_tier():
    """filter_k=2 forces most ambiguous queries onto the exact-fallback
    tier; results must not change."""
    from guidemaker_tpu.knn.leven import leven_pass_filter
    rng = np.random.default_rng(19)
    L = 12
    base = _random_seqs(rng, 30, L)
    near = [_mutate(rng, s, 1, 0) for s in base[:10]]
    seqs = list(dict.fromkeys(base + near))
    codes = np.stack([dna.encode(s) for s in seqs]).astype(np.uint8)
    dm = np.array([[_oracle_leven(a, b) for b in seqs] for a in seqs])
    np.fill_diagonal(dm, 10 ** 6)
    got = leven_pass_filter(codes, codes, 3, filter_k=2)
    np.testing.assert_array_equal(got, dm.min(axis=1) >= 3)


def test_leven_pass_filter_repeat_clusters_all_tiers():
    """Repeat-rich fixture (homopolymer / dinucleotide shifts) drives
    huge one-sided filter counts, exercising the fail-fast banded tier,
    the second-direction counting prune, and the chunked full-DP
    residue; the decision must still equal brute force."""
    from guidemaker_tpu.knn.leven import leven_pass_filter
    rng = np.random.default_rng(29)
    L = 12
    seqs = _random_seqs(rng, 40, L)
    # dense near-duplicate cluster: single-sub mutants of one motif
    motif = seqs[0]
    for pos in range(0, L, 2):
        for b in "ACGT":
            seqs.append(motif[:pos] + b + motif[pos + 1:])
    # shifted repeats: high dilated-match overlap without small leven
    seqs += ["".join("AC"[(i + s) % 2] for i in range(L)) for s in (0, 1)]
    seqs += ["A" * L, "A" * (L - 1) + "C", "C" + "A" * (L - 1)]
    seqs = list(dict.fromkeys(seqs))
    codes = np.stack([dna.encode(s) for s in seqs]).astype(np.uint8)
    dm = np.array([[_oracle_leven(a, b) for b in seqs] for a in seqs])
    np.fill_diagonal(dm, 10 ** 6)
    for e in (2, 3, 4):   # e=4 at L=12 exercises the degenerate full-DP path
        got = leven_pass_filter(codes, codes, e, filter_k=2)
        np.testing.assert_array_equal(got, dm.min(axis=1) >= e)


def test_knn_index_leven_filter_matches_query_path():
    """KnnIndex.pass_distance_filter (leven) equals the k=2 query rule."""
    rng = np.random.default_rng(23)
    seqs = list(dict.fromkeys(
        _random_seqs(rng, 120, 20)
        + [_mutate(rng, s, 1, 0) for s in _random_seqs(rng, 20, 20)]))
    idx = KnnIndex(seqs, "leven")
    got = idx.pass_distance_filter(seqs, editdist=3)
    d, _ = idx.query(seqs, k=2)
    want = (d[:, 1] >= 0) & (d[:, 1] >= 3)
    np.testing.assert_array_equal(got, want)


def test_leven_topk_single_dispatch_multi_tile():
    """The scanned query-tile driver agrees with the oracle across
    several query tiles."""
    rng = np.random.default_rng(29)
    q = _random_seqs(rng, 300, 14)
    db = _random_seqs(rng, 500, 14)
    qa = np.stack([dna.encode(s) for s in q]).astype(np.uint8)
    da = np.stack([dna.encode(s) for s in db]).astype(np.uint8)
    dists, idx = leven_topk(qa, da, 3, db_tile=128, q_tile=128)
    dm = np.array([[_oracle_leven(a, b) for b in db] for a in q])
    dw, iw = _topk_oracle(dm, 3)
    np.testing.assert_array_equal(dists, dw)
    np.testing.assert_array_equal(idx, iw)


def test_delset_partner_device_twin_matches_host():
    """The on-device deletion-set join (lex sort over (hi, lo) int32
    halves + adjacent-owner flagging) must equal the host sort-join for
    every L around the 16-position lo/hi split boundary."""
    from guidemaker_tpu.knn.leven import (_delset_partner_device,
                                          _delset_partner_mask)
    rng = np.random.default_rng(13)
    for L in (9, 16, 17, 20, 24):
        base = rng.integers(0, 4, (120, L)).astype(np.uint8)
        shifted = [np.concatenate([r[1:], rng.integers(0, 4, 1)
                                   .astype(np.uint8)]) for r in base[:25]]
        codes = np.unique(np.concatenate([base, np.array(shifted)]), axis=0)
        import jax.numpy as jnp
        want = _delset_partner_mask(codes)
        got = np.asarray(_delset_partner_device(jnp.asarray(codes),
                                                length=L))
        np.testing.assert_array_equal(got, want)
        assert want.any() and not want.all()
