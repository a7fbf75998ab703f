"""Memory-plan accounting vs the engine's actual factor allocations."""

import numpy as np
import pytest

import jax

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions, PerTracerOptions)
from nk_ocn_tracer_jacobian_precond_tpu.solver.memplan import plan_memory
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
    MultifrontalFactorization)
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file


@pytest.fixture(scope="module")
def problem(tmp_path_factory):
    d = tmp_path_factory.mktemp("memplan")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=24, jmt=20, km=6, seed=2)
    mat = str(d / "matrix.nc")
    opts = AssemblyOptions(
        circ_fname=circ, hmix_type="isop_file", vmix_type="file",
        per_tracer=[PerTracerOptions(sink_type="const", sink_rate=1e-4)])
    run_gen_a(mat, opts=opts)
    return read_matrix_file(mat), load_ind_maps(mat)


def test_factor_bytes_match_engine_allocations(problem):
    matrix, maps = problem
    mf = MultifrontalFactorization(matrix, impl="jax", maps=maps)
    eng = mf.engine
    itemsize = np.dtype(eng.prec).itemsize
    mp = plan_memory(eng.plans, n_devices=1, bytes_per_elem=itemsize)
    actual = 0
    for K, U12, L21, perm, KD in eng.factors:
        actual += (K.size + U12.size + L21.size) * itemsize + perm.size * 4
        if KD is not None:
            actual += KD.size * itemsize
    assert actual == mp.factor_bytes_total
    assert mp.factor_bytes_per_device == mp.factor_bytes_total
    assert mp.peak_per_device >= mp.factor_bytes_total


def test_sharding_reduces_per_device_bytes(problem):
    matrix, maps = problem
    mf = MultifrontalFactorization(matrix, impl="jax", maps=maps)
    eng = mf.engine
    mp1 = plan_memory(eng.plans, n_devices=1)
    mp8 = plan_memory(eng.plans, n_devices=8)
    assert mp8.factor_bytes_per_device < mp1.factor_bytes_per_device
    assert mp8.factor_bytes_total == mp1.factor_bytes_total
    # every round whose batch divides the mesh is counted sharded
    for r1, r8 in zip(mp1.rounds, mp8.rounds):
        if r8["B"] % 8 == 0:
            assert r8["factor_dev"] == r1["factor_dev"] // 8
        else:
            assert r8["factor_dev"] == r1["factor_dev"]
