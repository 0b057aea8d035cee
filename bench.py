#!/usr/bin/env python
"""Benchmark: exact genome-wide guide design vs the reference's HNSW.

Headline (printed as the ONE JSON line): the genome-scale retention
pass — every guide of the 6.3 Mb Pseudomonas aeruginosa genome against
every other (1.34e12 guide pairs) through the int8 streaming counting
kernel, exactly the kernel the pipeline's `exact k-NN` stage runs.

Baseline: the reference's only published k-NN numbers are HNSW on the
C. ruddii target set (BASELINE.md): tuned M=16/efC=16/ef=13 takes
0.090 s at recall ~0.99 for 3,814 queries x 3,814 targets x k=3 =
1.456e7 query-pairs -> 1.62e8 pairs/s on 4 CPU threads.  vs_baseline is
the per-pair rate ratio on our genome-scale workload (recall 1.0 by
construction vs their 0.99).

Also logged to stderr: the C. ruddii k=3 steady-state latency (direct
baseline comparison) and the post-annotation top-k pass.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_HNSW_TUNED_S = 0.090           # GridOptimization.ipynb cells 28-33
BASELINE_HNSW_PAIRS = 3814 * 3814       # same-workload pair count
BASELINE_PAIRS_PER_S = BASELINE_HNSW_PAIRS / BASELINE_HNSW_TUNED_S


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
    log(f"  {os.path.basename(path)}: {genome_bp:,} bp, "
        f"{len(targets)} targets, {len(uniq)} unique ({time.time()-t0:.2f}s host)")
    return codes, len(uniq), genome_bp


REPS_LO, REPS_HI = 8, 64


def bench_cruddii(codes, k, length, *, db_tile=1024, q_tile=512, repeats=3):
    """C. ruddii k=3 steady-state: dependency-chained reps inside one jit,
    slope-timed to cancel the tunnel RTT (the baseline's 0.090 s measured
    in-memory local compute)."""
    import functools
    import jax.numpy as jnp
    from guidemaker_tpu import dna
    from guidemaker_tpu.knn import pallas_hamming as ph
    from guidemaker_tpu.knn.hamming import INF_KEY, unpack_keys

    nd = codes.shape[0]
    q_tile, db_tile = ph.clamp_tiles(q_tile, db_tile)
    db_dev = ph.prepare_db_codes(codes, db_tile)
    q_dev = ph._onehot_on_device(jnp.asarray(
        ph._pad_code_rows(codes, ph.bucket_rows(nd, q_tile))))

    t0 = time.time()
    keys = ph._pallas_topk(q_dev, db_dev, k=k, length=length,
                           q_tile=q_tile, db_tile=db_tile).block_until_ready()
    compile_s = time.time() - t0
    dist, idx = unpack_keys(np.asarray(keys)[:nd, :k])
    assert (dist[:, 0] == 0).all(), "self-distance must be 0"
    assert (idx[:, 0] == np.arange(nd)).all(), "self-index mismatch"

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(q, db, *, reps):
        def body(_, carry):
            dep = jnp.where(carry[0, 0] == INF_KEY + 1, 1.0, 0.0)
            return ph._pallas_topk(q + dep.astype(q.dtype), db, k=k,
                                   length=length, q_tile=q_tile,
                                   db_tile=db_tile)
        init = jnp.full((q.shape[0], ph.LANES), INF_KEY, dtype=jnp.int32)
        return jax.lax.fori_loop(0, reps, body, init)

    def timed(reps):
        np.asarray(chained(q_dev, db_dev, reps=reps)[0, :k])  # warm
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            np.asarray(chained(q_dev, db_dev, reps=reps)[0, :k])
            ts.append(time.time() - t0)
        return min(ts)

    t_lo, t_hi = timed(REPS_LO), timed(REPS_HI)
    per_run = max((t_hi - t_lo) / (REPS_HI - REPS_LO), 1e-9)
    return float(per_run), compile_s


def run_e2e(stages: dict):
    """Full-pipeline wall time on P. aeruginosa (the reference's headline
    workload: README.md:15 '1-2 minutes on a laptop' for a typical
    bacterial genome), with the per-stage breakdown captured from the
    pipeline's stage timers.

    Runs with the d2h relay channel already open (the tunnel's one-time
    ~400 s per-process cold-open is transport setup, not pipeline work —
    a local TPU has no relay; see util.warm_d2h_channel).
    """
    import logging
    import tempfile

    from guidemaker_tpu.pipeline import PipelineConfig, run_pipeline

    class StageGrab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "[stage]" in msg:
                parts = msg.split("[stage]")[1].split()
                stages[" ".join(parts[:-5])] = float(parts[-5])

    grab = StageGrab()
    timing_logger = logging.getLogger("guidemaker_tpu.timing")
    timing_logger.addHandler(grab)
    timing_logger.setLevel(logging.INFO)
    out = tempfile.mkdtemp(prefix="gm_bench_e2e_")
    cfg = PipelineConfig(
        genbank=[os.path.join(REPO, "guidemaker_tpu", "data",
                              "Pseudomonas_aeruginosa.gbk.gz")],
        pamseq="NGG", pam_orientation="3prime", guidelength=20, lsr=10,
        dtype="hamming", dist=2, before=100, into=200, knum=3,
        controls=1000, threads=2, doench_efficiency_score=True,
        cfd_score=True, outdir=out, seed=42)
    t0 = time.time()
    res = run_pipeline(cfg)
    e2e = time.time() - t0
    timing_logger.removeHandler(grab)
    log(f"  P. aeruginosa end-to-end: {e2e:.2f} s, "
        f"{len(res.targets)} guides, {cfg.controls} controls")
    for name, secs in stages.items():
        log(f"    {name:<16} {secs:8.3f} s")
    return e2e, len(res.targets)


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    from guidemaker_tpu.util import warm_d2h_channel
    warm_d2h_channel()  # overlap the tunnel's one-time d2h stall with setup

    # --- headline: P. aeruginosa genome-wide retention (6.3 Mb) ---
    from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
    from guidemaker_tpu.knn.pallas_stream import (stream_count_device,
                                                  stream_topk_device)
    pa = os.path.join(REPO, "guidemaker_tpu", "data",
                      "Pseudomonas_aeruginosa.gbk.gz")
    pa_codes, n2, bp2 = load_targets(pa)
    warm_d2h_channel(wait=True)   # executable/result downloads need it open
    db_tile = 8192
    dbb = prepare_db_codes(pa_codes, db_tile)
    args = dict(db_tile=db_tile, q_tile=1024, q_dev=dbb, nq=int(dbb.shape[0]))
    t0 = time.time()
    counts = stream_count_device(None, dbb, n2, 2, 20, **args)  # + compile
    compile_s = time.time() - t0
    retained = int((counts[:n2] <= 1).sum())
    times = []
    for _ in range(3):
        t0 = time.time()
        stream_count_device(None, dbb, n2, 2, 20, **args)
        times.append(time.time() - t0)
    tc = min(times)
    pairs = n2 * n2
    rate = pairs / tc
    log(f"  P. aeruginosa retention (all-vs-all, {pairs:.3g} pairs): "
        f"{tc:.2f} s steady ({compile_s:.1f}s first call), "
        f"{rate/1e12:.2f} T pairs/s, {retained} guides retained")

    # post-annotation top-k pass (the other genome-scale kernel)
    nsub = 131072
    stream_topk_device(pa_codes[:nsub], dbb, n2, 3, 20,
                       db_tile=db_tile, q_tile=256)  # compile+run
    t0 = time.time()
    stream_topk_device(pa_codes[:nsub], dbb, n2, 3, 20,
                       db_tile=db_tile, q_tile=256)
    tk = time.time() - t0
    log(f"  P. aeruginosa top-3 for {nsub} retained guides: "
        f"{tk:.2f} s e2e, {nsub*n2/tk/1e12:.2f} T pairs/s")

    # --- Levenshtein at genome scale: retention + survivor top-k ---
    leven_retention_rate = leven_topk_rate = leven_e3_rate = None
    try:
        from guidemaker_tpu.knn.leven import leven_pass_filter, leven_topk
        t0 = time.time()
        passed = leven_pass_filter(pa_codes, pa_codes, 2)
        compile_s = time.time() - t0
        t0 = time.time()
        leven_pass_filter(pa_codes, pa_codes, 2)
        tl_ = time.time() - t0
        leven_retention_rate = pairs / tl_
        log(f"  P. aeruginosa LEVEN retention e=2 (all-vs-all, {pairs:.3g} "
            f"pairs): {tl_:.2f} s steady ({compile_s:.1f}s first call), "
            f"{leven_retention_rate/1e12:.2f} T pairs/s, "
            f"{int(passed.sum())} guides retained "
            f"(exact leven<2 == hamming<2 shortcut)")
        # e=3: the tiered positional 3-gram filter path
        t0 = time.time()
        p3 = leven_pass_filter(pa_codes, pa_codes, 3)
        compile_s = time.time() - t0
        t0 = time.time()
        leven_pass_filter(pa_codes, pa_codes, 3)
        tl3 = time.time() - t0
        leven_e3_rate = pairs / tl3
        log(f"  P. aeruginosa LEVEN retention e=3 (gram-filter tiers): "
            f"{tl3:.2f} s steady ({compile_s:.1f}s first call), "
            f"{leven_e3_rate/1e12:.2f} T pairs/s, "
            f"{int(p3.sum())} guides retained")
        # survivor neighbor lists (phase 2): cummin-DP top-k rate on a
        # 4096-query slice vs the full database
        nsub_l = 4096
        leven_topk(pa_codes[:nsub_l], pa_codes, 3)          # compile
        t0 = time.time()
        leven_topk(pa_codes[:nsub_l], pa_codes, 3)
        tk_l = time.time() - t0
        leven_topk_rate = nsub_l * n2 / tk_l
        log(f"  P. aeruginosa LEVEN top-3 for {nsub_l} guides: "
            f"{tk_l:.2f} s, {leven_topk_rate/1e9:.2f} G pairs/s "
            f"(full-DP exact lists)")
    except Exception as e:
        log(f"  leven benchmark failed: {e!r}")

    # --- C. ruddii k=3 steady (direct HNSW-baseline comparison) ---
    try:
        cr = os.path.join(REPO, "tests", "test_data",
                          "Carsonella_ruddii.gbk.gz")
        cr_codes, n, _ = load_targets(cr)
        t_med, t_compile = bench_cruddii(cr_codes, 3, 20)
        log(f"  C. ruddii exact k=3: {t_med*1e3:.3f} ms steady "
            f"({t_compile:.1f}s first-call compile), "
            f"{n*n/t_med/1e9:.2f} G pairs/s "
            f"(HNSW tuned baseline: 90 ms at recall 0.99)")
    except Exception as e:   # C. ruddii detail is informative, not the metric
        log(f"  C. ruddii run skipped: {e!r}")

    # --- full pipeline end-to-end (the reference's 1-2 min workload) ---
    stages: dict = {}
    e2e_seconds = e2e_guides = None
    try:
        e2e_seconds, e2e_guides = run_e2e(stages)
    except Exception as e:  # e2e detail must not sink the headline metric
        log(f"  e2e pipeline run failed: {e!r}")

    if not on_tpu:
        log("  WARNING: not on TPU; rates are not comparable")
    record = {
        "metric": "pa_genomewide_retention_pairs_per_s",
        "value": round(rate, 0),
        "unit": "pairs/s",
        "vs_baseline": round(rate / BASELINE_PAIRS_PER_S, 2),
    }
    if leven_retention_rate is not None:
        record["leven_retention_pairs_per_s"] = round(leven_retention_rate)
    if leven_e3_rate is not None:
        record["leven_e3_retention_pairs_per_s"] = round(leven_e3_rate)
    if leven_topk_rate is not None:
        record["leven_topk_pairs_per_s"] = round(leven_topk_rate)
    if e2e_seconds is not None:
        record["e2e_seconds"] = round(e2e_seconds, 2)
        record["e2e_guides"] = e2e_guides
        record["e2e_stages"] = {k: round(v, 2) for k, v in stages.items()}
        # reference anchor: ~1-2 min on a laptop (README.md:15)
        record["e2e_vs_baseline"] = round(90.0 / e2e_seconds, 2)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
