"""Test configuration: force the JAX CPU backend with a virtual 8-device mesh.

Tests must run without TPU hardware; multi-device sharding tests use
``--xla_force_host_platform_device_count`` (SURVEY.md §4).  This must happen
before the first ``jax`` backend initialization.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

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
