"""Test configuration: force the JAX CPU backend with a virtual 8-device mesh.

Tests must run without TPU hardware; multi-device sharding tests use
``--xla_force_host_platform_device_count`` (SURVEY.md §4).  This must happen
before the first ``jax`` backend initialization.

Hardware tier: ``GUIDEMAKER_TPU_HW=1 pytest -m tpu`` keeps the real backend
and runs only the ``@pytest.mark.tpu`` tests (Pallas kernels compiled for
the actual chip instead of ``interpret=True``).
"""
import os

TPU_HW = os.environ.get("GUIDEMAKER_TPU_HW") == "1"

if not TPU_HW:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not TPU_HW:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# first-party coverage (no third-party tools in this environment):
# GUIDEMAKER_COV=1 pytest tests/ -q  -> per-file table + coverage_guidemaker.json
if os.environ.get("GUIDEMAKER_COV") == "1":
    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import cov as _cov

    _cov.start()

    def pytest_sessionfinish(session, exitstatus):
        _cov.report()


def pytest_collection_modifyitems(config, items):
    if TPU_HW:
        # hardware runs execute ONLY the tpu tier (everything else was
        # already validated on the CPU mesh; mixing backends in one
        # process is not supported)
        skip_cpu = pytest.mark.skip(reason="GUIDEMAKER_TPU_HW=1: tpu tier only")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_cpu)
    else:
        skip_tpu = pytest.mark.skip(
            reason="needs real TPU (set GUIDEMAKER_TPU_HW=1)")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip_tpu)

TEST_DIR = os.path.dirname(os.path.abspath(__file__))
TEST_DATA = os.path.join(TEST_DIR, "test_data")


@pytest.fixture(scope="session")
def genome_fasta():
    return os.path.join(TEST_DATA, "Carsonella_ruddii.fasta.gz")


@pytest.fixture(scope="session")
def genome_gbk():
    return os.path.join(TEST_DATA, "Carsonella_ruddii.gbk.gz")


@pytest.fixture(scope="session")
def configpath():
    from guidemaker_tpu.definitions import CONFIG_PATH
    return CONFIG_PATH
