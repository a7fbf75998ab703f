"""Observability + failure-detection tests."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.utils.profiling import PhaseStats


def test_phase_stats():
    st = PhaseStats()
    with st.phase("a"):
        pass
    with st.phase("a"):
        pass
    with st.phase("b"):
        pass
    assert st.calls["a"] == 2 and st.calls["b"] == 1
    assert "a" in st.report()
    assert "a" in st.to_json()


def test_factor_validation(tmp_path):
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import (
        SparseMatrix, read_matrix_file)
    from nk_ocn_tracer_jacobian_precond_tpu.ops import (
        AssemblyOptions, PerTracerOptions)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
        MultifrontalFactorization)
    from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file

    circ = str(tmp_path / "c.nc")
    make_circ_file(circ, imt=12, jmt=10, km=4, seed=70)
    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)

    mf = MultifrontalFactorization(matrix, impl="jax", maps=maps)
    rep = mf.validate()
    assert rep["nonfinite_factor_entries"] == 0

    # a singular matrix must be detected
    sing = SparseMatrix(nzval=np.zeros_like(matrix.nzval),
                        colind=matrix.colind, rowptr=matrix.rowptr,
                        coupled_tracer_cnt=matrix.coupled_tracer_cnt)
    mf2 = MultifrontalFactorization(sing, impl="jax", maps=maps,
                                    sym=mf.sym, equilibrate_matrix=False)
    with pytest.raises(FloatingPointError):
        mf2.validate()
