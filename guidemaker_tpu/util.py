"""Small runtime utilities: stage timing and profiling hooks.

The reference has no tracing/profiling at all (SURVEY.md §5); here every
pipeline stage logs its wall time, and a run can be wrapped in a JAX
profiler trace (``--profile DIR`` on the CLI) for TensorBoard inspection
of device execution.
"""
from __future__ import annotations

import contextlib
import logging
import threading
import time

logger = logging.getLogger("guidemaker_tpu.timing")

_warm_lock = threading.Lock()
_warm_thread = None


def warm_d2h_channel(wait: bool = False) -> None:
    """Warm the device→host transfer channel in a background thread.

    On tunneled/remote TPU backends the *first* device→host literal
    transfer in a process can stall for ~60 s per chunk while the relay
    establishes its return stream; once one transfer completes, sustained
    d2h runs at tens of MB/s (measured on the v5e tunnel: cold 14 MB
    result = 458 s, warm = 0.7 s).  Firing a tiny transfer from a daemon
    thread as soon as the pipeline starts overlaps that one-time cost
    with host-side work (genome parsing, PAM scan, kernel compiles), so
    the real k-NN result transfer finds the channel already open.

    Idempotent; a no-op on local backends (the tiny transfer costs <1 ms).
    """
    global _warm_thread
    with _warm_lock:
        if _warm_thread is None:
            def _warm():
                global _channel_open_duration
                t0 = time.time()
                try:
                    import jax.numpy as jnp
                    import numpy as np
                    np.asarray(jnp.zeros(8, jnp.int32))
                    _channel_open_duration = time.time() - t0
                except Exception:  # no device / init failure: nothing to warm
                    pass
            _warm_thread = threading.Thread(
                target=_warm, name="gm-d2h-warmup", daemon=True)
            _warm_thread.start()
        th = _warm_thread
    if wait:
        th.join()
        _start_d2h_keepalive()


_channel_open_duration = None


def channel_open_seconds():
    """Duration of the one-time d2h channel open measured by the warmup
    thread (None until it completes) — the transport-tax figure reported
    by bench.py without blocking the caller on the open itself."""
    return _channel_open_duration


_keepalive_started = False


def _start_d2h_keepalive(period_s: float = 20.0) -> None:
    """Keep the device→host return stream warm with a tiny periodic
    transfer.

    Observed on the tunneled backend: the relay's return stream idles
    out after minutes of inactivity and the next d2h pays a multi-minute
    re-open (measured 104-223 s mid-pipeline while host-only stages ran).
    A 32-byte ping every ``period_s`` keeps it open; on local backends
    the cost is nanoseconds.  Opt out with GUIDEMAKER_TPU_NO_KEEPALIVE=1.
    """
    global _keepalive_started
    import os
    if _keepalive_started or os.environ.get("GUIDEMAKER_TPU_NO_KEEPALIVE"):
        return
    with _warm_lock:
        if _keepalive_started:
            return
        _keepalive_started = True
        import atexit
        stop = threading.Event()
        # atexit handlers run LIFO before interpreter finalization:
        # registering here (after jax's own handlers) stops the ping
        # loop BEFORE jax clears its backends — a ping dispatched into
        # a torn-down backend re-initializes it mid-shutdown and can
        # segfault the process at exit (observed rc=139 after a fully
        # green pytest run)
        atexit.register(stop.set)

        def _ping():
            import numpy as np
            try:
                import jax.numpy as jnp
            except Exception:
                return
            while not stop.wait(period_s):
                try:
                    np.asarray(jnp.zeros(8, jnp.int32))
                except Exception:
                    return  # backend torn down; stop quietly

        threading.Thread(target=_ping, name="gm-d2h-keepalive",
                         daemon=True).start()


_channel_wait_total = 0.0


def channel_wait_seconds() -> float:
    """Total wall time :func:`fetch` callers spent BLOCKED on the relay
    channel open so far in this process.

    On the tunneled backend the per-process device→host channel open is
    wildly variable (measured 1–330 s for identical runs); a local TPU
    pays microseconds.  This counter separates that transport tax from
    pipeline compute: ``e2e_wall - channel_wait`` is the
    environment-independent pipeline time.
    """
    return _channel_wait_total


def fetch(device_array):
    """Device→host transfer that never runs on a cold relay channel.

    JAX dispatch is async, so callers should dispatch their device work
    first, then ``fetch`` the result: the kernel executes while this
    blocks on the channel warmup, and the actual transfer runs at full
    (warm) bandwidth.
    """
    global _channel_wait_total
    import numpy as np
    t0 = time.time()
    warm_d2h_channel(wait=True)
    dt = time.time() - t0
    with _warm_lock:   # fetch() runs from the control-search thread too
        _channel_wait_total += dt
    return np.asarray(device_array)


def fetch_list(device_arrays):
    """:func:`fetch` for a list of device arrays in one round.

    ``jax.device_get`` moves the whole batch over the (pre-warmed)
    channel without paying one host round trip per array — used where a
    result is naturally sharded across equal-shape device chunks (the
    control ladder's per-chunk passer gathers)."""
    global _channel_wait_total
    import jax
    t0 = time.time()
    warm_d2h_channel(wait=True)
    dt = time.time() - t0
    with _warm_lock:
        _channel_wait_total += dt
    return jax.device_get(list(device_arrays))


@contextlib.contextmanager
def stage_timer(name: str):
    """Log the wall-clock (and process CPU) duration of a pipeline stage."""
    t0 = time.time()
    c0 = time.process_time()
    try:
        yield
    finally:
        logger.info("[stage] %-28s %8.3f s  (cpu %.3f s)",
                    name, time.time() - t0, time.process_time() - c0)


@contextlib.contextmanager
def substage_timer(name: str):
    """Like :func:`stage_timer` but tagged ``[sub]`` — fine-grained timings
    inside a stage, for profiling; bench.py's stage grabber matches the
    ``[stage]`` tag only, so sub-stages never pollute the artifact's
    stage table."""
    t0 = time.time()
    try:
        yield
    finally:
        logger.info("[sub] %-32s %8.3f s", name, time.time() - t0)


@contextlib.contextmanager
def maybe_profile(trace_dir: str = None):
    """Wrap a block in a JAX profiler trace when a directory is given."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
    logger.info("JAX profiler trace written to %s", trace_dir)
