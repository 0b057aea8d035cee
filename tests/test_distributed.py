"""Distributed helpers tests (virtual 8-device CPU mesh)."""
import jax
import numpy as np
import pytest

from guidemaker_tpu import dna
from guidemaker_tpu.distributed import auto_mesh, device_summary, init_distributed
from guidemaker_tpu.knn.hamming import hamming_topk
from guidemaker_tpu.knn.sharded import sharded_hamming_topk


def test_init_distributed_single_process_noop():
    init_distributed()  # must not raise in single-process mode
    init_distributed()  # idempotent


def test_device_summary():
    s = device_summary()
    assert "device(s)" in s and "process(es)" in s


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_auto_mesh_and_sharded_query():
    mesh = auto_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("q", "d")
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(600, 20)).astype(np.uint8)
    oh = dna.one_hot_matrix(codes)
    d_sh, i_sh = sharded_hamming_topk(oh[:64], oh, 3, 20, mesh=mesh,
                                      db_tile=64)
    d_1, i_1 = hamming_topk(oh[:64], oh, 3, 20)
    np.testing.assert_array_equal(d_sh, d_1)
    np.testing.assert_array_equal(i_sh, i_1)
