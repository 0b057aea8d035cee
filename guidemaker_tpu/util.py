"""Small runtime utilities: stage timing and profiling hooks.

The reference has no tracing/profiling at all (SURVEY.md §5); here every
pipeline stage logs its wall time, and a run can be wrapped in a JAX
profiler trace (``--profile DIR`` on the CLI) for TensorBoard inspection
of device execution.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("guidemaker_tpu.timing")


@contextlib.contextmanager
def stage_timer(name: str):
    """Log the wall-clock duration of a pipeline stage."""
    t0 = time.time()
    try:
        yield
    finally:
        logger.info("[stage] %-28s %8.3f s", name, time.time() - t0)


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
