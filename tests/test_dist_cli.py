"""Distributed CLI end-to-end: run_solve on the simulated 8-device mesh.

The reference's distributed tests drive the solver EXECUTABLE
(test/test_solve_ABdist.csh:31 runs `solve_ABdist -n12,12 -v ...` on 144
ranks); the rebuild's equivalent is drivers/solve.py::run_solve with
n_devices — exercised here through RHS streaming, solve, refinement,
residual checks, and in-place writeback, matched against the
single-device CLI result, plus --factors save/load under a mesh.
"""

import shutil

import numpy as np
import pytest

import jax

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.drivers.solve import run_solve
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions,
    PerTracerOptions,
)
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)

VARS = ("IAGE_CUR", "PO4_CUR", "DIC_CUR")


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("dcli")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=20, jmt=16, km=5, seed=21)
    tracer = str(d / "tracer.nc")
    make_tracer_file(tracer, 20, 16, 5, tracer_names=VARS, seed=21)
    mat = str(d / "matrix.nc")
    opts = AssemblyOptions(
        circ_fname=circ, hmix_type="isop_file", vmix_type="file",
        per_tracer=[PerTracerOptions(sink_type="const", sink_rate=1.2e-4)])
    run_gen_a(mat, opts=opts)
    return d, mat, tracer


def _read_states(path, matrix, maps):
    """Independent read (scipy's netcdf codec) -> flat states + land."""
    from scipy.io import netcdf_file
    out = {}
    with netcdf_file(path, "r", mmap=False) as f:
        for v in VARS:
            out[v] = np.array(f.variables[v][:], dtype=np.float64)
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_run_solve_distributed_end_to_end(files):
    """The user-facing distributed path (reference
    test/test_solve_ABdist.csh:31): streamed RHS staging (rhs_chunk=1
    forces multiple read-solve-write cycles), distributed factor+solve,
    refinement to the 1e-10 contract, in-place writeback, land preserved,
    and the same answers as the single-device CLI."""
    d, mat, tracer = files
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    A = matrix.to_scipy()

    t1 = str(d / "t_single.nc")
    shutil.copy(tracer, t1)
    res1 = run_solve(mat, t1, ",".join(VARS), backend="multifrontal")

    t8 = str(d / "t_dist.nc")
    shutil.copy(tracer, t8)
    res8 = run_solve(mat, t8, ",".join(VARS), backend="multifrontal",
                     n_devices=8, rhs_chunk=1)
    for group, rel in res8["residuals"].items():
        assert rel <= 1e-10, (group, rel)

    before = _read_states(tracer, matrix, maps)
    s1 = _read_states(t1, matrix, maps)
    s8 = _read_states(t8, matrix, maps)
    i3 = maps.int3_to_ind
    wet = i3 >= 0
    for v in VARS:
        # land cells bit-identical to the pre-solve file (put_B_global
        # parity: land preserved, solve_ABglobal.c:212-267)
        np.testing.assert_array_equal(s8[v][~wet], before[v][~wet])
        # distributed == single-device to refinement accuracy
        np.testing.assert_allclose(s8[v][wet], s1[v][wet],
                                   rtol=1e-9, atol=1e-12)
        # independent residual check through our own reader
        x = np.zeros(matrix.flat_len)
        b = np.zeros(matrix.flat_len)
        x[i3[wet]] = s8[v][wet]
        b[i3[wet]] = before[v][wet]
        rel = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
        assert rel <= 1e-10, (v, rel)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_factors_checkpoint_under_mesh(files):
    """--factors save/load with n_devices: the first distributed run
    writes the numeric factor file, the second loads it (reapplying mesh
    shardings, checkpoint.load_factors) and produces identical output."""
    d, mat, tracer = files
    fck = str(d / "factors_mesh.npz")

    ta = str(d / "t_fact_a.nc")
    shutil.copy(tracer, ta)
    run_solve(mat, ta, "IAGE_CUR,PO4_CUR", backend="multifrontal",
              n_devices=8, factors_fname=fck)
    import os
    assert os.path.exists(fck)

    tb = str(d / "t_fact_b.nc")
    shutil.copy(tracer, tb)
    run_solve(mat, tb, "IAGE_CUR,PO4_CUR", backend="multifrontal",
              n_devices=8, factors_fname=fck)

    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    sa = _read_states(ta, matrix, maps)
    sb = _read_states(tb, matrix, maps)
    for v in ("IAGE_CUR", "PO4_CUR"):
        np.testing.assert_allclose(sb[v], sa[v], rtol=1e-9, atol=1e-12)
