#!/usr/bin/env python
"""Benchmark: exact genome-wide guide design vs the reference's HNSW.

Headline (the JSON line's ``metric``): the genome-scale retention pass —
every guide of the 6.3 Mb Pseudomonas aeruginosa genome against every
other (1.34e12 guide pairs) through the int8 streaming counting kernel,
exactly the kernel the pipeline's `exact k-NN` stage runs.

Baseline: the reference's only published k-NN numbers are HNSW on the
C. ruddii target set (BASELINE.md): tuned M=16/efC=16/ef=13 takes
0.090 s at recall ~0.99 for 3,814 queries x 3,814 targets x k=3 =
1.456e7 query-pairs -> 1.62e8 pairs/s on 4 CPU threads.  vs_baseline is
the per-pair rate ratio on our genome-scale workload (recall 1.0 by
construction vs their 0.99).

Robustness contract (round 3 lost ALL structured output to a driver
timeout, BENCH_r03.json rc=124/parsed=null):

* the cumulative JSON record is printed to stdout AFTER EVERY section —
  the last complete line wins, so a timeout mid-section loses only the
  sections not yet run;
* a hard SIGALRM at ``GUIDEMAKER_BENCH_BUDGET_S`` (default 900 s, a
  soft ceiling — see its comment) and a
  SIGTERM handler both emit the current record and exit, so even an
  external `timeout` kill leaves the record on stdout;
* every section has a remaining-time gate; sections that do not fit are
  recorded as skipped (with the reason) instead of silently missing;
* the riskiest section (cold-start e2e: a fresh subprocess that may hit
  the tunnel's 1-330 s channel-open lottery) runs LAST under its own
  subprocess timeout.

Sections, in order: transport probe, retention headline, 131k top-k,
full-pipeline e2e (warm, with stage table), leven e=2 retention, leven
e=3 retention (hamming counting + deletion-set join), leven survivor
list phase (bit-parallel Myers), C. ruddii k=3 (direct HNSW-baseline
comparison), hardware test tier (`pytest -m tpu` in-process),
cold-start e2e (fresh subprocess, empty JAX cache).
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402  (module import only; backend init is lazy)

BASELINE_HNSW_TUNED_S = 0.090           # GridOptimization.ipynb cells 28-33
BASELINE_HNSW_PAIRS = 3814 * 3814       # same-workload pair count
BASELINE_PAIRS_PER_S = BASELINE_HNSW_PAIRS / BASELINE_HNSW_TUNED_S
BASELINE_E2E_S = 90.0                   # reference README.md:15: ~1-2 min

#: soft ceiling only: the record is re-emitted after every section and
#: the SIGTERM handler emits on an external kill, so a driver window
#: shorter than this loses nothing already measured.  900 s leaves the
#: cold-start child its full 420 s allowance even after a bad (~300 s)
#: channel-open lottery in the parent.
BUDGET_S = float(os.environ.get("GUIDEMAKER_BENCH_BUDGET_S", "900"))
T0 = time.time()

record: dict = {}
_skipped: dict = {}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.time() - T0)


def emit():
    """Print the cumulative record as one JSON line (last line wins)."""
    try:
        from guidemaker_tpu.util import channel_open_seconds
        opened = channel_open_seconds()
        if opened is not None:
            record["transport_first_d2h_s"] = round(opened, 2)
    except Exception:
        pass
    out = dict(record)
    if "metric" not in out:
        # headline not yet measured: still emit something parseable
        out.update(metric="bench_incomplete", value=round(time.time() - T0, 1),
                   unit="s", vs_baseline=0.0)
    if _skipped:
        out["skipped_sections"] = dict(_skipped)
    out["bench_elapsed_s"] = round(time.time() - T0, 1)
    print(json.dumps(out), flush=True)


_alarm_extensions = 0


def _die(signum, frame):
    global _alarm_extensions
    if (signum == signal.SIGALRM and "metric" not in record
            and _alarm_extensions < 8):
        # the self-budget expired before the headline landed — almost
        # always the tunnel's d2h channel open running long (observed
        # > 560 s in a degraded phase).  Exiting now would record
        # nothing; the driver's own timeout delivers SIGTERM whenever
        # IT runs out, and that handler still emits.  So keep waiting
        # in 120 s slices while there is nothing to lose.
        _alarm_extensions += 1
        log(f"  [bench] budget expired at t={time.time()-T0:.0f}s with no "
            f"headline yet; extending {_alarm_extensions}/8")
        emit()
        signal.alarm(120)
        return
    log(f"  [bench] signal {signum} at t={time.time()-T0:.0f}s; "
        "emitting record and exiting")
    emit()
    sys.stdout.flush()
    os._exit(0)


def section(name, budget_s):
    """Decorator-ish gate: returns False (and records the skip) when the
    remaining time cannot cover ``budget_s``."""
    rem = remaining()
    if rem < budget_s:
        _skipped[name] = f"needs ~{budget_s:.0f}s, {rem:.0f}s left"
        log(f"  [bench] SKIP {name}: needs ~{budget_s:.0f}s, "
            f"{rem:.0f}s left")
        return False
    log(f"  [bench] section {name} (t={time.time()-T0:.0f}s, "
        f"budget {budget_s:.0f}s)")
    return True


# ---------------------------------------------------------------------------
# workload helpers
# ---------------------------------------------------------------------------

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


def bench_cruddii(codes, k, length, *, db_tile=1024, q_tile=512, repeats=5):
    """C. ruddii k=3 steady-state: dependency-chained reps inside one jit,
    slope-timed to cancel the tunnel RTT (the baseline's 0.090 s measured
    in-memory local compute)."""
    import functools
    import jax.numpy as jnp
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
            # data dependency between reps so XLA cannot elide them:
            # carry[0,0] is a real top-k key, never INF_KEY+1, so dep is
            # always exactly 0.0 and q + 0.0 == q BIT-EXACTLY in bf16
            # (adding a true zero is exact in any IEEE mode — this does
            # not rely on rounding behavior, only on the predicate
            # staying false, which unpack-tested results guarantee)
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


def run_e2e(stages: dict, *, controls=1000, seed=42, dtype="hamming"):
    """Full-pipeline wall time on P. aeruginosa (the reference's headline
    workload: README.md:15 '1-2 minutes on a laptop' for a typical
    bacterial genome), with the per-stage breakdown captured from the
    pipeline's stage timers.  ``dtype`` selects the guide metric — the
    reference treats hamming and leven as co-equal modes (core.py:459-467),
    so both get a measured end-to-end here."""
    import logging

    from guidemaker_tpu.pipeline import PipelineConfig, run_pipeline

    class StageGrab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "[stage]" in msg:
                name, secs = _parse_stage_line(msg)
                stages[name] = secs

    grab = StageGrab()
    timing_logger = logging.getLogger("guidemaker_tpu.timing")
    timing_logger.addHandler(grab)
    timing_logger.setLevel(logging.INFO)
    out = tempfile.mkdtemp(prefix="gm_bench_e2e_")
    cfg = PipelineConfig(
        genbank=[os.path.join(REPO, "guidemaker_tpu", "data",
                              "Pseudomonas_aeruginosa.gbk.gz")],
        pamseq="NGG", pam_orientation="3prime", guidelength=20, lsr=10,
        dtype=dtype, dist=2, before=100, into=200, knum=3,
        controls=controls, threads=2, doench_efficiency_score=True,
        cfd_score=True, outdir=out, seed=seed)
    from guidemaker_tpu.util import channel_wait_seconds
    wait0 = channel_wait_seconds()
    t0 = time.time()
    res = run_pipeline(cfg)
    e2e = time.time() - t0
    # transport tax: wall time the pipeline spent blocked on the
    # tunnel's per-process d2h channel open (measured 1-330 s for
    # identical runs; a local TPU pays microseconds) — charged to
    # whichever stage fetches first, so it is reported separately
    transport = channel_wait_seconds() - wait0
    timing_logger.removeHandler(grab)
    log(f"  P. aeruginosa end-to-end: {e2e:.2f} s "
        f"({transport:.2f} s of that blocked on the d2h channel open), "
        f"{len(res.targets)} guides, {cfg.controls} controls")
    for name, secs in stages.items():
        log(f"    {name:<16} {secs:8.3f} s")
    return e2e, len(res.targets), transport


def cold_e2e_child():
    """Child-process mode: honest cold start — fresh process, empty JAX
    compilation cache (the parent points JAX_COMPILATION_CACHE_DIR at a
    fresh tempdir), cold device channel.  The analog of a user's first
    `guidemaker` invocation vs the reference's ~1-2 min (README.md:15).

    Prints JSON lines as milestones land (first d2h, each stage) so the
    parent can salvage partial cold data when the child's own channel
    lottery (1-330 s) pushes it past its budget; the final full record
    is the last line and the parent merges later lines over earlier."""
    import logging
    import threading

    print(json.dumps({"cold_child_started": True}), flush=True)
    # measure the one-time d2h channel open WITHOUT blocking on it: the
    # round-5 preflight lost its whole 420 s budget sitting in this
    # probe during a lottery phase while the pipeline's host work
    # (parse/scan/compiles) could have been overlapping it — which is
    # exactly what the pipeline's own warm_d2h_channel does.
    first_d2h = [None]

    def _probe():
        import numpy as _np
        import jax.numpy as _jnp
        t0 = time.time()
        _np.asarray(_jnp.zeros(8, _jnp.int32))
        first_d2h[0] = round(time.time() - t0, 2)
        print(json.dumps({"cold_first_d2h_s": first_d2h[0]}), flush=True)

    threading.Thread(target=_probe, daemon=True).start()

    class StageStream(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "[stage]" in msg:
                name, secs = _parse_stage_line(msg)
                print(json.dumps(
                    {"cold_stage_" + name.replace(" ", "_"): secs}),
                    flush=True)

    logging.getLogger("guidemaker_tpu.timing").addHandler(StageStream())
    # the child's own host-throttle probe: the parent's probe does not
    # cover the child's phase (observed: child stages inflated 5-6x
    # while the parent ran healthy)
    t0 = time.time()
    np.sort(np.random.default_rng(0).integers(0, 1 << 40, 8_000_000))
    probe = round(time.time() - t0, 2)
    print(json.dumps({"cold_host_sort8m_s": probe}), flush=True)
    stages: dict = {}
    e2e, guides, transport = run_e2e(stages)
    out = {"cold_e2e_seconds": round(e2e, 2),
           "cold_first_d2h_s": first_d2h[0],
           "cold_host_sort8m_s": probe,
           "cold_transport_wait_s": round(transport, 2),
           "cold_e2e_compute_s": round(e2e - transport, 2),
           "cold_stages": {k: round(v, 2) for k, v in stages.items()},
           "cold_guides": guides}
    print(json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    signal.signal(signal.SIGTERM, _die)
    signal.signal(signal.SIGALRM, _die)
    signal.alarm(max(int(BUDGET_S), 30))
    try:
        _main_body()
    finally:
        # ANY exit path — including an unhandled exception in a section
        # that predates the first successful emit — leaves a parseable
        # record on stdout (the round-3 failure mode)
        emit()


def _main_body():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '')} "
        f"budget {BUDGET_S:.0f}s")
    record["device"] = f"{dev.platform} {getattr(dev, 'device_kind', '')}"
    # host-throttle probe: the dev VM's CPU has multi-minute throttling
    # phases (measured np.sort of 8M int64 at 0.6-10 s for identical
    # inputs) that inflate every host-bound stage 3-6x; recording the
    # probe makes run-to-run variance interpretable (healthy ~0.7 s)
    t0 = time.time()
    np.sort(np.random.default_rng(0).integers(0, 1 << 40, 8_000_000))
    record["host_sort8m_s"] = round(time.time() - t0, 2)
    log(f"  host probe: np.sort 8M int64 {record['host_sort8m_s']} s")
    try:
        import guidemaker_tpu
        record["version"] = guidemaker_tpu.__version__
    except Exception:
        pass

    # --- transport probe: start the d2h channel open in the background
    # and MEASURE it without blocking (observed 1.3-330 s across
    # identical runs; a local TPU pays microseconds). Sections overlap
    # their host work (genome parse, compiles) with the open; the first
    # kernel fetch blocks on whatever remains, and the measured open
    # duration lands in the record at the next emit. ---
    from guidemaker_tpu.util import warm_d2h_channel
    warm_d2h_channel()

    # --- headline: P. aeruginosa genome-wide retention (6.3 Mb) ---
    pa_codes = None
    if section("retention", 60):
        try:
            from guidemaker_tpu.knn.pallas_hamming import prepare_db_codes
            from guidemaker_tpu.knn.pallas_stream import (stream_count_device,
                                                          stream_topk_device)
            pa = os.path.join(REPO, "guidemaker_tpu", "data",
                              "Pseudomonas_aeruginosa.gbk.gz")
            pa_codes, n2, bp2 = load_targets(pa)
            db_tile = 8192
            dbb = prepare_db_codes(pa_codes, db_tile)
            args = dict(db_tile=db_tile, q_tile=1024, q_dev=dbb,
                        nq=int(dbb.shape[0]))
            t0 = time.time()
            counts = stream_count_device(None, dbb, n2, 2, 20, **args)
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
            record.update(
                metric="pa_genomewide_retention_pairs_per_s",
                value=round(rate, 0), unit="pairs/s",
                vs_baseline=round(rate / BASELINE_PAIRS_PER_S, 2),
                retention_seconds=round(tc, 3),
                retention_compile_s=round(compile_s, 1),
                retention_guides=retained)
            log(f"  P. aeruginosa retention (all-vs-all, {pairs:.3g} pairs): "
                f"{tc:.2f} s steady ({compile_s:.1f}s first call), "
                f"{rate/1e12:.2f} T pairs/s, {retained} guides retained")
        except Exception as e:  # headline failure must still leave a record
            log(f"  retention failed: {e!r}")
            record["retention_error"] = repr(e)[:200]
            pa_codes = None
        emit()

    # post-annotation top-k pass (the other genome-scale kernel)
    if pa_codes is None:
        _skipped.setdefault("topk131k", "retention prerequisites missing")
    elif section("topk131k", 30):
        try:
            nsub = 131072
            stream_topk_device(pa_codes[:nsub], dbb, n2, 3, 20,
                               db_tile=db_tile, q_tile=256)  # compile+run
            t0 = time.time()
            stream_topk_device(pa_codes[:nsub], dbb, n2, 3, 20,
                               db_tile=db_tile, q_tile=256)
            tk = time.time() - t0
            record["topk_131k_seconds"] = round(tk, 2)
            record["topk_pairs_per_s"] = round(nsub * n2 / tk)
            log(f"  P. aeruginosa top-3 for {nsub} retained guides: "
                f"{tk:.2f} s e2e, {nsub*n2/tk/1e12:.2f} T pairs/s")
        except Exception as e:
            log(f"  topk131k failed: {e!r}")
        emit()

    # --- full pipeline end-to-end (the reference's 1-2 min workload).
    # min-of-2 when the budget allows: the dev VM's host-throttle phases
    # inflate a single run's host stages 3-6x (the recorded
    # host_sort8m_s probe gives the context); the min run's stage table
    # is the representative one, both wall times are recorded. ---
    if section("e2e", 120):
        runs = []
        try:
            for rep in range(2):
                stages: dict = {}
                e2e_seconds, e2e_guides, transport = run_e2e(stages)
                runs.append((e2e_seconds, stages, transport, e2e_guides))
                record["e2e_seconds_runs"] = [round(r[0], 2) for r in runs]
                best = min(runs, key=lambda r: r[0])
                record["e2e_seconds"] = round(best[0], 2)
                record["e2e_transport_wait_s"] = round(best[2], 2)
                record["e2e_compute_s"] = round(best[0] - best[2], 2)
                record["e2e_guides"] = best[3]
                record["e2e_stages"] = {k: round(v, 2)
                                        for k, v in best[1].items()}
                record["e2e_vs_baseline"] = round(BASELINE_E2E_S / best[0], 2)
                emit()
                if rep == 0 and remaining() < 200:
                    _skipped["e2e_rep2"] = "budget"
                    break
        except Exception as e:  # e2e detail must not sink the headline
            log(f"  e2e pipeline run failed: {e!r}")
            if not runs:
                record["e2e_error"] = repr(e)[:200]
        emit()

    # --- Levenshtein e=2 retention (rides the Hamming counting kernel) ---
    if pa_codes is None:
        _skipped.setdefault("leven_e2", "retention prerequisites missing")
    elif section("leven_e2", 40):
        try:
            from guidemaker_tpu.knn.leven import leven_pass_filter
            t0 = time.time()
            passed = leven_pass_filter(pa_codes, pa_codes, 2)
            compile_s = time.time() - t0
            times = []
            for _ in range(2):   # min-of-2: tunnel hiccups skew singles
                t0 = time.time()
                leven_pass_filter(pa_codes, pa_codes, 2)
                times.append(time.time() - t0)
            tl_ = min(times)
            pairs = pa_codes.shape[0] ** 2
            record["leven_retention_pairs_per_s"] = round(pairs / tl_)
            log(f"  P. aeruginosa LEVEN retention e=2: {tl_:.2f} s steady "
                f"({compile_s:.1f}s first call), {pairs/tl_/1e12:.2f} T "
                f"pairs/s, {int(passed.sum())} retained")
        except Exception as e:
            log(f"  leven e2 failed: {e!r}")
        emit()

    # --- leven e=3 retention: hamming counting + deletion-set join
    # (exact decomposition; round 3's gram-tier cascade never completed
    # at genome scale) ---
    if pa_codes is None:
        _skipped.setdefault("leven_e3", "retention prerequisites missing")
    elif section("leven_e3", 60):
        try:
            from guidemaker_tpu.knn.leven import leven_pass_filter
            pairs = pa_codes.shape[0] ** 2
            t0 = time.time()
            p3 = leven_pass_filter(pa_codes, pa_codes, 3)
            compile_s = time.time() - t0
            times = []
            for _ in range(2):   # min-of-2: tunnel hiccups skew singles
                t0 = time.time()
                leven_pass_filter(pa_codes, pa_codes, 3)
                times.append(time.time() - t0)
            tl3 = min(times)
            record["leven_e3_retention_pairs_per_s"] = round(pairs / tl3)
            record["leven_e3_seconds"] = round(tl3, 2)
            log(f"  P. aeruginosa LEVEN retention e=3: {tl3:.2f} s steady "
                f"({compile_s:.1f}s first call), {pairs/tl3/1e12:.2f} T "
                f"pairs/s, {int(p3.sum())} retained")
        except Exception as e:
            log(f"  leven e3 failed: {e!r}")
        emit()

    # --- Levenshtein survivor list phase (the post-annotation neighbor
    # lists for --dtype leven).  Round 5: the banded-first builder the
    # round-4 verdict proposed was REFUTED by measurement — the +-t
    # banded DP costs MORE VPU ops/pair than bit-parallel Myers at L=20
    # (w=2t+1 lanes x L rows vs one int32 column), and the positional
    # 3-gram candidate filter drowns at genome scale (measured: >64
    # pseudo-dist<10 candidates for 131,032 of 131,072 queries — shift
    # siblings).  The winning move was op-golfing Myers itself
    # (5.7 -> 13.3 G pairs/s raw; see knn/leven.py docstring +
    # docs/SCALING.md). ---
    if pa_codes is None:
        _skipped.setdefault("leven_lists", "retention prerequisites missing")
    elif section("leven_lists", 75):
        try:
            from guidemaker_tpu.knn import leven as lv
            nsub = 131072
            nd = pa_codes.shape[0]
            fn = lv.leven_topk
            fn(pa_codes[:1024], pa_codes, 3)          # compile on small slice
            t0 = time.time()
            fn(pa_codes[:nsub], pa_codes, 3)
            tk_l = time.time() - t0
            record["leven_list_131k_seconds"] = round(tk_l, 2)
            record["leven_list_pairs_per_s"] = round(nsub * nd / tk_l)
            record["leven_list_kernel"] = "leven_topk[myers-golfed-r5]"
            log(f"  P. aeruginosa LEVEN top-3 lists for {nsub} survivors: "
                f"{tk_l:.2f} s ({fn.__name__}), "
                f"{nsub*nd/tk_l/1e12:.3f} T pairs/s")
        except Exception as e:
            log(f"  leven list phase failed: {e!r}")
        emit()

    # --- full --dtype leven pipeline end-to-end (the reference treats
    # leven as a co-equal mode, core.py:459-467; round-5 first) ---
    if section("leven_e2e", 120):
        lstages: dict = {}
        try:
            lev_e2e, lev_guides, ltransport = run_e2e(lstages, dtype="leven")
            record["leven_e2e_seconds"] = round(lev_e2e, 2)
            record["leven_e2e_guides"] = lev_guides
            record["leven_e2e_transport_wait_s"] = round(ltransport, 2)
            record["leven_e2e_stages"] = {k: round(v, 2)
                                          for k, v in lstages.items()}
        except Exception as e:
            log(f"  leven e2e failed: {e!r}")
            record["leven_e2e_error"] = repr(e)[:200]
        emit()

    # --- C. ruddii k=3 steady (direct HNSW-baseline comparison) ---
    if section("cruddii", 35):
        try:
            cr = os.path.join(REPO, "tests", "test_data",
                              "Carsonella_ruddii.gbk.gz")
            cr_codes, n, _ = load_targets(cr)
            t_med, t_compile = bench_cruddii(cr_codes, 3, 20)
            record["cruddii_k3_seconds"] = round(t_med, 6)
            record["cruddii_vs_hnsw_tuned"] = round(
                BASELINE_HNSW_TUNED_S / t_med, 1)
            log(f"  C. ruddii exact k=3: {t_med*1e3:.3f} ms steady "
                f"({t_compile:.1f}s first-call compile), "
                f"{n*n/t_med/1e9:.2f} G pairs/s "
                f"(HNSW tuned baseline: 90 ms at recall 0.99)")
        except Exception as e:
            log(f"  C. ruddii run skipped: {e!r}")
        emit()

    # --- hardware test tier: pytest -m tpu on the live backend ---
    if on_tpu and section("hw_tests", 140):
        try:
            import pytest as _pytest

            class _Count:
                passed = failed = skipped = 0

                def pytest_runtest_logreport(self, report):
                    if report.when == "call":
                        if report.passed:
                            _Count.passed += 1
                        elif report.failed:
                            _Count.failed += 1
                    elif report.failed:
                        _Count.failed += 1
                    if report.when == "setup" and report.skipped:
                        _Count.skipped += 1

            os.environ["GUIDEMAKER_TPU_HW"] = "1"
            # --capture=sys: pytest's default fd-level capture dup2's
            # fd 1 — the same fd carrying this bench's JSON record
            # stream; an abrupt in-process teardown once truncated the
            # final record line mid-write.  sys-level capture never
            # touches the fd.
            rc = _pytest.main(
                ["-q", "-m", "tpu", "-p", "no:cacheprovider", "--no-header",
                 "--capture=sys",
                 os.path.join(REPO, "tests", "test_tpu_hw.py")],
                plugins=[_Count()])
            record["hw_tests"] = {"passed": _Count.passed,
                                  "failed": _Count.failed,
                                  "rc": int(rc)}
            log(f"  hw tier: {_Count.passed} passed, {_Count.failed} failed "
                f"(rc={rc})")
        except Exception as e:
            log(f"  hw tier failed to run: {e!r}")
            record["hw_tests"] = {"error": repr(e)[:200]}
        emit()

    # --- cold-start e2e: fresh process, empty JAX compilation cache ---
    if section("cold_e2e", 130):
        cache = tempfile.mkdtemp(prefix="gm_cold_jax_cache_")
        env = dict(os.environ)
        env["JAX_COMPILATION_CACHE_DIR"] = cache
        env.pop("GUIDEMAKER_TPU_HW", None)
        child_budget = min(remaining() - 15, 420)
        try:
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cold-e2e"],
                env=env, capture_output=True, text=True,
                timeout=child_budget)
            wall = time.time() - t0
            cold = _merge_cold_lines(proc.stdout)
            if cold and "cold_e2e_seconds" in cold:
                record["e2e_cold_seconds"] = cold["cold_e2e_seconds"]
                record["e2e_cold_first_d2h_s"] = cold.get("cold_first_d2h_s")
                record["e2e_cold_transport_wait_s"] = cold.get(
                    "cold_transport_wait_s")
                record["e2e_cold_compute_s"] = cold.get("cold_e2e_compute_s")
                record["e2e_cold_stages"] = cold["cold_stages"]
                record["e2e_cold_host_sort8m_s"] = cold.get(
                    "cold_host_sort8m_s")
                record["e2e_cold_process_wall_s"] = round(wall, 2)
                log(f"  cold e2e: {cold['cold_e2e_seconds']} s pipeline "
                    f"({wall:.1f} s process wall, first d2h "
                    f"{cold.get('cold_first_d2h_s')} s)")
            else:
                if cold:
                    record["e2e_cold_partial"] = cold
                record["e2e_cold_error"] = (proc.stderr or "no output")[-300:]
                log(f"  cold e2e child produced no record (rc={proc.returncode})")
                log((proc.stderr or "")[-800:])
        except subprocess.TimeoutExpired as te:
            # salvage the child's streamed milestones (first d2h, stage
            # times) — the lottery can push the child past any budget,
            # but the partial record still shows how far it got and how
            # big the channel-open tax was
            partial = _merge_cold_lines(te.stdout or "")
            if partial:
                record["e2e_cold_partial"] = partial
            record["e2e_cold_error"] = f"timeout after {child_budget:.0f}s"
            log(f"  cold e2e child timed out after {child_budget:.0f}s "
                f"(partial: {partial})")
        emit()

    if not on_tpu:
        log("  WARNING: not on TPU; rates are not comparable")
        record["not_tpu"] = True
    emit()


def _merge_cold_lines(stdout) -> dict:
    """Merge every JSON line the cold child printed (later keys win)."""
    if isinstance(stdout, bytes):
        stdout = stdout.decode(errors="replace")
    merged: dict = {}
    for line in (stdout or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                merged.update(json.loads(line))
            except ValueError:
                pass
    return merged


def _parse_stage_line(msg):
    """Parse util.stage_timer's '[stage] <name> <secs> s (cpu ...)' log
    line into (name, seconds) — the ONE parser for both the warm-run
    stage grabber and the cold child's milestone streamer."""
    parts = msg.split("[stage]")[1].split()
    return " ".join(parts[:-5]), float(parts[-5])


if __name__ == "__main__":
    if "--cold-e2e" in sys.argv:
        cold_e2e_child()
    else:
        main()
