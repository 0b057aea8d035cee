"""GuideMaker-TPU: TPU-native CRISPR guide-RNA pool design.

A from-scratch, TPU-first framework with the capabilities of GuideMaker
(USDA-ARS-GBRU): genome-wide gRNA design for non-model genomes and custom
CRISPR-Cas systems.  The computational core — genome-wide off-target k-NN —
runs as exact (not approximate) nearest-neighbor search on TPU MXUs via
JAX/XLA and Pallas kernels, sharded over device meshes for large genomes.

Public API mirrors the reference package (``/root/reference/guidemaker/``)
so users can switch with minimal changes:

* :class:`PamTarget` — PAM/target enumeration (vectorized motif scan)
* :class:`TargetProcessor` — guide filtering + exact off-target k-NN
* :class:`Annotation` — feature ingestion + nearest-feature join
* :func:`get_fastas`, :func:`extend_ambiguous_dna`
* :func:`cfd_score`, :func:`get_doench_efficiency_score`
* :mod:`guidemaker_tpu.cli` — command line with the reference's flags
"""

import os as _os

# Persistent XLA compilation cache: kernel compiles (~15 s of one-hot +
# streaming-topk programs per genome-scale run) are shape-stable across
# runs, so cache them on disk.  Opt out with GUIDEMAKER_TPU_NO_CACHE=1 or
# by setting JAX_COMPILATION_CACHE_DIR yourself.


def _host_cpu_sig() -> str:
    """Short fingerprint of the host CPU's feature flags.

    XLA's CPU backend AOT-compiles for the *compiling* host's machine
    features; a persistent-cache hit written on a different machine can
    SIGILL (observed: ``cpu_aot_loader.cc:210`` machine-feature-mismatch
    warnings when one shared cache dir served several driver hosts).
    Keying the cache directory by the feature set makes a cross-machine
    hit impossible while still sharing within identical hosts.
    """
    import hashlib
    import platform as _platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    sig = hashlib.md5(flags.encode()).hexdigest()[:10] if flags else "noflags"
    return f"{_platform.machine()}-{sig}"


def _accelerator_expected() -> bool:
    """True when this process will plausibly run a non-CPU backend.

    XLA:CPU AOT-caches record pseudo target features (e.g.
    ``prefer-no-scatter``) that the loader's host-feature check does not
    derive from CPUID, so *every* reload of a CPU cache entry logs a
    ``cpu_aot_loader.cc`` machine-mismatch error and risks a refused
    load.  CPU compiles are fast and local — the persistent cache only
    pays for itself on remote/tunneled accelerator backends — so the
    cache is enabled only when an accelerator platform is requested
    (config/env names one) or present (libtpu importable), covering
    CPU-pinned tests/dryruns AND default-CPU laptop installs without
    initializing any backend at import time.
    """
    try:
        import jax as _jax2
        plat = (_jax2.config.jax_platforms
                or _os.environ.get("JAX_PLATFORMS", "") or "")
    except Exception:
        plat = _os.environ.get("JAX_PLATFORMS", "") or ""
    plat = plat.strip().lower()
    if plat and plat != "cpu":
        return True      # tpu/axon/cuda/rocm/proxy... explicitly requested
    if plat == "cpu":
        return False     # explicitly pinned to CPU
    import importlib.util
    return importlib.util.find_spec("libtpu") is not None


def _maybe_enable_persistent_cache() -> bool:
    """Configure the machine-keyed persistent compilation cache.

    Returns True iff the cache directory was set by this call — factored
    out of the import-time block so the opt-out/environment branches are
    unit-testable without re-importing the package.
    """
    if _os.environ.get("GUIDEMAKER_TPU_NO_CACHE") or \
            _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return False
    try:
        import jax as _jax
        if _jax.config.jax_compilation_cache_dir is None \
                and _accelerator_expected():
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser(
                    f"~/.cache/guidemaker_tpu/jax-{_host_cpu_sig()}"))
            # cache everything: with remote-compile backends even a fast
            # compile is a network round trip a cache hit avoids entirely
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
            return True
    except Exception:  # jax missing/misconfigured: library still imports
        pass
    return False


_maybe_enable_persistent_cache()

from .definitions import ROOT_DIR, CONFIG_PATH, WEB_APP, APP_PARAMETER_IMG, APP_EXPERIMENT_FILE
from .dna import extend_ambiguous_dna, reverse_complement
from .io import get_fastas, is_gzip
from .scan import PamTarget
from .targets import TargetProcessor
from .annotate import Annotation
from .score import cfd_score, get_doench_efficiency_score
from .plot import GuideMakerPlot
from . import doench_predict
from . import cfd_score_calculator
from . import doench_featurization

# single source of truth for the package version: pyproject.toml reads
# this attribute dynamically ([tool.setuptools.dynamic])
__version__ = "0.5.0"

__all__ = [
    "PamTarget", "TargetProcessor", "Annotation",
    "get_fastas", "is_gzip", "extend_ambiguous_dna", "reverse_complement",
    "cfd_score", "get_doench_efficiency_score", "GuideMakerPlot",
    "doench_predict", "cfd_score_calculator", "doench_featurization",
    "ROOT_DIR", "CONFIG_PATH", "WEB_APP",
]

# `guidemaker_tpu.core` namespace mirrors `guidemaker.core` for drop-in use.
from . import core  # noqa: E402
