#!/usr/bin/env python
"""Benchmark: exact genome-wide off-target k-NN vs the reference's HNSW.

Workload (identical to the reference's own tuning benchmark,
``/root/reference/tests/GridOptimization.ipynb``): all NGG/5prime 20-mer
targets of the Carsonella ruddii genome, k=3 nearest neighbors of every
target against every target.

Reference baseline (BASELINE.md): tuned HNSW (M=16 efC=16 ef=13) takes
0.090-0.110 s at recall ~0.99 on 4 CPU threads; shipped defaults took
0.386 s at recall 1.0.  This benchmark measures our *exact* (recall 1.0 by
construction) search, steady-state, including host->device transfer of the
query/database tensors.

Prints ONE JSON line to stdout; extra detail (big-genome scaling run) goes
to stderr.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

BASELINE_HNSW_TUNED_S = 0.090  # GridOptimization.ipynb cells 28-33


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_targets(path, pam="NGG", orientation="5prime", length=20):
    from guidemaker_tpu import PamTarget, dna
    from guidemaker_tpu.io import parse_genbank, parse_fasta
    t0 = time.time()
    if path.endswith(("gbk.gz", "gbk", "gb")):
        recs = list(parse_genbank(path))
    else:
        recs = list(parse_fasta(path))
    recs = [r.upper() for r in recs]
    genome_bp = sum(len(r.seq) for r in recs)
    targets = PamTarget(pam, orientation, "hamming").find_targets(recs, length)
    uniq = list(dict.fromkeys(targets["target"].tolist()))
    codes = np.stack([dna.encode(s) for s in uniq]).astype(np.uint8)
    onehot = dna.one_hot_matrix(codes)
    log(f"  {os.path.basename(path)}: {genome_bp:,} bp, "
        f"{len(targets)} targets, {len(uniq)} unique ({time.time()-t0:.2f}s host)")
    return onehot, len(uniq), genome_bp


def bench_knn(onehot, k, length, *, db_tile=4096, q_tile=2048, repeats=5):
    from guidemaker_tpu.knn.hamming import hamming_topk
    # warm-up (compile)
    t0 = time.time()
    d, i = hamming_topk(onehot, onehot, k, length,
                        db_tile=db_tile, q_tile=q_tile)
    compile_s = time.time() - t0
    assert (d[:, 0] == 0).all(), "self-distance must be 0"
    times = []
    for _ in range(repeats):
        t0 = time.time()
        hamming_topk(onehot, onehot, k, length,
                     db_tile=db_tile, q_tile=q_tile)
        times.append(time.time() - t0)
    return float(np.median(times)), compile_s


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    # --- headline: C. ruddii k=3 (direct baseline exists) ---
    cr = os.path.join(REPO, "tests", "test_data", "Carsonella_ruddii.gbk.gz")
    onehot, n, _ = load_targets(cr)
    t_med, t_compile = bench_knn(onehot, 3, 20)
    pairs = n * n
    log(f"  C. ruddii exact k=3: {t_med*1e3:.2f} ms steady "
        f"({t_compile:.1f}s first-call compile), "
        f"{pairs / t_med / 1e9:.2f} G guide-pairs/s")

    # --- scaling: Pseudomonas aeruginosa (6.3 Mb, 'typical bacterial') ---
    # opt-in: tunnel-TPU first-call compiles can take minutes (BENCH_BIG=1)
    try:
        pa = os.path.join(REPO, "guidemaker_tpu", "data",
                          "Pseudomonas_aeruginosa.gbk.gz")
        if os.path.exists(pa) and os.environ.get("BENCH_BIG") == "1":
            oh2, n2, bp2 = load_targets(pa)
            t2, c2 = bench_knn(oh2, 3, 20, repeats=1)
            log(f"  P. aeruginosa exact k=3: {t2:.2f} s steady "
                f"({c2:.1f}s first call), {n2*n2/t2/1e12:.2f} T pairs/s, "
                f"{n2*n2*80*2/t2/1e12:.1f} TFLOP/s effective")
    except Exception as e:  # scaling run is informative, not the metric
        log(f"  big-genome run skipped: {e!r}")

    speedup = BASELINE_HNSW_TUNED_S / t_med
    print(json.dumps({
        "metric": "exact_knn_cruddii_k3_seconds",
        "value": round(t_med, 6),
        "unit": "s",
        "vs_baseline": round(speedup, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
