"""Environment-fallback coverage: the branches that only fire in the
field — cache-signature/opt-out logic in ``__init__``, native-absent
paths, the packed opt-in driver route, and save/load round trips
(round-4 verdict weak #6)."""
import os

import numpy as np
import pytest

import guidemaker_tpu as gm
from guidemaker_tpu import dna
from guidemaker_tpu.knn.driver import KnnIndex, _default_backend, _use_packed


def _seqs(n=300, L=20, seed=11):
    rng = np.random.default_rng(seed)
    return list(dict.fromkeys(
        dna.decode_rows(rng.integers(0, 4, (n, L)).astype(np.uint8))))


# ---------------------------------------------------------------------------
# __init__: persistent-cache gating
# ---------------------------------------------------------------------------

def test_host_cpu_sig_stable_and_shaped():
    sig = gm._host_cpu_sig()
    assert sig == gm._host_cpu_sig()
    machine, digest = sig.rsplit("-", 1)
    assert machine and (len(digest) == 10 or digest == "noflags")


def test_host_cpu_sig_without_cpuinfo(monkeypatch):
    import builtins
    real_open = builtins.open

    def no_cpuinfo(path, *a, **k):
        if str(path) == "/proc/cpuinfo":
            raise OSError("denied")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", no_cpuinfo)
    assert gm._host_cpu_sig().endswith("-noflags")


def test_accelerator_expected_branches(monkeypatch):
    import jax
    old = jax.config.jax_platforms
    try:
        # explicit accelerator platform -> True
        jax.config.update("jax_platforms", "axon")
        assert gm._accelerator_expected() is True
        # explicit cpu pin -> False
        jax.config.update("jax_platforms", "cpu")
        assert gm._accelerator_expected() is False
        # unset -> decided by libtpu presence
        jax.config.update("jax_platforms", None)
        monkeypatch.delenv("JAX_PLATFORMS", raising=False)
        import importlib.util
        want = importlib.util.find_spec("libtpu") is not None
        assert gm._accelerator_expected() is want
        # env fallback path (config platform unset, env names tpu)
        monkeypatch.setenv("JAX_PLATFORMS", "tpu")
        assert gm._accelerator_expected() is True
    finally:
        jax.config.update("jax_platforms", old)


def test_persistent_cache_optouts(monkeypatch):
    monkeypatch.setenv("GUIDEMAKER_TPU_NO_CACHE", "1")
    assert gm._maybe_enable_persistent_cache() is False
    monkeypatch.delenv("GUIDEMAKER_TPU_NO_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/userdir")
    assert gm._maybe_enable_persistent_cache() is False


def test_persistent_cache_enables_on_accelerator(monkeypatch):
    import jax
    monkeypatch.delenv("GUIDEMAKER_TPU_NO_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setattr(gm, "_accelerator_expected", lambda: True)
        assert gm._maybe_enable_persistent_cache() is True
        got = jax.config.jax_compilation_cache_dir
        assert got and gm._host_cpu_sig() in got
        # already-set dir -> no second configuration
        assert gm._maybe_enable_persistent_cache() is False
        # cpu-only expectation -> never enables
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setattr(gm, "_accelerator_expected", lambda: False)
        assert gm._maybe_enable_persistent_cache() is False
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min)


# ---------------------------------------------------------------------------
# driver: backend-selection and native-absent fallbacks
# ---------------------------------------------------------------------------

def test_default_backend_env_override(monkeypatch):
    for b in ("pallas", "xla", "native", "sharded"):
        monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", b)
        assert _default_backend() == b
    monkeypatch.delenv("GUIDEMAKER_TPU_KERNEL", raising=False)
    assert _default_backend() in ("pallas", "xla", "sharded")


def test_native_backend_falls_back_to_jax_when_unavailable(monkeypatch):
    from guidemaker_tpu import native
    seqs = _seqs(120)
    idx = KnnIndex(seqs, metric="hamming", backend="native")
    want_d, want_i = KnnIndex(seqs, metric="hamming", backend="xla").query(
        seqs[:20], k=3)
    monkeypatch.setattr(native, "available", lambda: False)
    d, i = idx.query(seqs[:20], k=3)
    np.testing.assert_array_equal(d, want_d)
    np.testing.assert_array_equal(i, want_i)
    # leven native-absent path
    idx_l = KnnIndex(seqs, metric="leven", backend="native")
    dl, il = idx_l.query(seqs[:10], k=2)
    wl, wi = KnnIndex(seqs, metric="leven", backend="xla").query(
        seqs[:10], k=2)
    np.testing.assert_array_equal(dl, wl)
    np.testing.assert_array_equal(il, wi)


def test_native_backend_count_within_unsupported():
    seqs = _seqs(64)
    idx = KnnIndex(seqs, metric="hamming", backend="native")
    codes = np.stack([dna.encode(s) for s in seqs[:8]])
    assert idx.count_within(codes, 2) is None
    assert idx.pass_mask_within(codes, 2) is None
    assert idx.pass_mask_chunks([codes], 2) is None


def test_xla_count_within_matches_bruteforce():
    seqs = _seqs(150)
    idx = KnnIndex(seqs, metric="hamming", backend="xla")
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, (33, 20)).astype(np.uint8)
    got = idx.count_within(codes, 3)
    db = np.stack([dna.encode(s) for s in seqs])
    dm = (codes[:, None, :] != db[None, :, :]).sum(2)
    np.testing.assert_array_equal(got, (dm < 3).sum(1))
    # mask variant (fallback per-chunk route for non-pallas backends)
    pm = idx.pass_mask_within(codes, 3, chunk=16)
    np.testing.assert_array_equal(pm.astype(bool), (dm < 3).sum(1) == 0)


@pytest.mark.skipif(os.environ.get("GUIDEMAKER_TPU_HW") == "1",
                    reason="CPU-path test")
def test_packed_optin_driver_paths(monkeypatch):
    monkeypatch.setenv("GUIDEMAKER_TPU_PACKED", "1")
    monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", "pallas")
    assert _use_packed(20)
    import guidemaker_tpu.knn.driver as drv
    monkeypatch.setattr(drv, "STREAM_THRESHOLD", 64)
    seqs = _seqs(200)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    ref = KnnIndex(seqs, metric="hamming", backend="xla")
    d, i = idx.query(seqs[:16], k=3)
    wd, wi = ref.query(seqs[:16], k=3)
    np.testing.assert_array_equal(d, wd)
    np.testing.assert_array_equal(i, wi)
    # packed counting path through pass_distance_filter + count_within
    got = idx.pass_distance_filter(seqs, 2)
    want = ref.pass_distance_filter(seqs, 2)
    np.testing.assert_array_equal(got, want)
    codes = np.stack([dna.encode(s) for s in seqs[:8]])
    np.testing.assert_array_equal(idx.count_within(codes, 2),
                                  ref.count_within(codes, 2))


def test_index_save_load_roundtrip(tmp_path):
    seqs = _seqs(80)
    idx = KnnIndex(seqs, metric="leven", backend="xla")
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = KnnIndex.load(p)
    assert idx2.metric == "leven" and idx2.seqs == idx.seqs
    d1, i1 = idx.query(seqs[:5], k=2)
    d2, i2 = idx2.query(seqs[:5], k=2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(i1, i2)


def test_arrow_index_construction_matches_list():
    import pandas as pd
    seqs = _seqs(120)
    col = pd.Series(seqs, dtype="str")
    idx_a = KnnIndex(col, metric="hamming", backend="xla")
    idx_l = KnnIndex(seqs, metric="hamming", backend="xla")
    assert idx_a.seqs == idx_l.seqs       # lazy materialization
    assert len(idx_a.seq_array) == len(seqs)
    d_a, i_a = idx_a.query(col[:16], k=3)
    d_l, i_l = idx_l.query(seqs[:16], k=3)
    np.testing.assert_array_equal(d_a, d_l)
    np.testing.assert_array_equal(i_a, i_l)
    # membership checks through the Arrow path
    assert idx_a._counting_filter_valid(col)
    assert idx_a._counting_filter_valid(pd.Series(seqs[:5], dtype="str"))
    assert not idx_a._counting_filter_valid(
        pd.Series(["A" * 20], dtype="str"))


def test_arrow_index_rejects_ragged_and_duplicates():
    import pandas as pd
    with pytest.raises(ValueError):
        KnnIndex(pd.Series(["ACGT", "ACGTA"], dtype="str"), backend="xla")
    dup = pd.Series(["ACGTACGTAC", "ACGTACGTAC", "TTTTTTTTTT"], dtype="str")
    idx = KnnIndex(dup, backend="xla")
    assert not idx._counting_filter_valid(dup)   # duplicated db


def test_encode_pandas_large_string_and_errors():
    import pandas as pd
    import pyarrow as pa
    seqs = _seqs(40, L=12)
    arr = pa.array(seqs, type=pa.large_string())
    codes, out = dna.encode_pandas(arr)
    np.testing.assert_array_equal(codes,
                                  np.stack([dna.encode(s) for s in seqs]))
    # sliced arrays read from the right buffer offset
    sl = arr.slice(10, 20)
    codes_sl, _ = dna.encode_pandas(sl)
    np.testing.assert_array_equal(codes_sl, codes[10:30])
    with pytest.raises(ValueError):
        dna.encode_pandas(pd.Series(seqs, dtype="str"), length=11)
    empty, _ = dna.encode_pandas(pa.array([], type=pa.string()), length=12)
    assert empty.shape == (0, 12)


def test_hamming_query_codes_on_leven_index_all_backends():
    seqs = _seqs(150)
    codes = np.stack([dna.encode(s) for s in seqs[:12]])
    want_d, want_i = KnnIndex(seqs, metric="hamming",
                              backend="xla").query_codes(codes, 2)
    for backend in ("xla", "native", "sharded"):
        idx = KnnIndex(seqs, metric="leven", backend=backend)
        d, i = idx.hamming_query_codes(codes, 2)
        np.testing.assert_array_equal(d, want_d)
        np.testing.assert_array_equal(i, want_i)


def test_chunked_stream_topk_path(monkeypatch):
    """Query sets above one fixed chunk dispatch chunk-wise with a padded
    tail; results must equal the single-dispatch path."""
    import guidemaker_tpu.knn.driver as drv
    monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", "pallas")
    monkeypatch.setattr(drv, "STREAM_THRESHOLD", 64)
    monkeypatch.setattr(drv, "_STREAM_Q_CHUNK", 128)
    seqs = _seqs(400)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    ref = KnnIndex(seqs, metric="hamming", backend="xla")
    d, i = idx.query(seqs[:300], k=3)     # 3 chunks, padded tail
    wd, wi = ref.query(seqs[:300], k=3)
    np.testing.assert_array_equal(d, wd)
    np.testing.assert_array_equal(i, wi)


def test_pallas_stream_filter_and_counts(monkeypatch):
    """The streaming counting branches of pass_distance_filter /
    count_within / pass_mask_within on the pallas backend (interpret
    mode on CPU)."""
    import guidemaker_tpu.knn.driver as drv
    monkeypatch.setenv("GUIDEMAKER_TPU_KERNEL", "pallas")
    monkeypatch.setattr(drv, "STREAM_THRESHOLD", 64)
    # the all-vs-all reuse path requires db_pad >= its q_tile (true at
    # the real 64k threshold); >=1024 unique rows keeps that invariant
    seqs = _seqs(1200)
    idx = KnnIndex(seqs, metric="hamming", backend="pallas")
    ref = KnnIndex(seqs, metric="hamming", backend="xla")
    # all-vs-all shortcut (list input) and subset path
    np.testing.assert_array_equal(idx.pass_distance_filter(seqs, 2),
                                  ref.pass_distance_filter(seqs, 2))
    np.testing.assert_array_equal(idx.pass_distance_filter(seqs[:40], 2),
                                  ref.pass_distance_filter(seqs[:40], 2))
    # arrow-typed all-vs-all (the pipeline's route)
    import pandas as pd
    col = pd.Series(seqs, dtype="str")
    idx2 = KnnIndex(col, metric="hamming", backend="pallas")
    np.testing.assert_array_equal(idx2.pass_distance_filter(col, 2),
                                  ref.pass_distance_filter(seqs, 2))
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (17, 20)).astype(np.uint8)
    np.testing.assert_array_equal(idx.count_within(codes, 3),
                                  ref.count_within(codes, 3))
    np.testing.assert_array_equal(
        idx.pass_mask_within(codes, 3).astype(bool),
        np.asarray(ref.count_within(codes, 3)) == 0)


def test_sharded_backend_leven_query_codes():
    seqs = _seqs(90)
    codes = np.stack([dna.encode(s) for s in seqs[:7]])
    idx = KnnIndex(seqs, metric="leven", backend="sharded")
    ref = KnnIndex(seqs, metric="leven", backend="xla")
    d, i = idx.query_codes(codes, 2)
    wd, wi = ref.query_codes(codes, 2)
    np.testing.assert_array_equal(d, wd)
    np.testing.assert_array_equal(i, wi)


def test_load_backend_override(tmp_path):
    seqs = _seqs(30)
    idx = KnnIndex(seqs, metric="hamming", backend="xla")
    p = str(tmp_path / "i.npz")
    idx.save(p)
    idx2 = KnnIndex.load(p, backend="native")
    assert idx2.backend == "native" and len(idx2) == len(seqs)
