"""End-to-end toolchain tests: gen_a -> matrix file -> solve -> in-place
tracer update, mirroring the reference workflow (README:9-23)."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import main as gen_a_main
from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.drivers.solve import main as solve_main
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io import fields, netcdf3
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)

IMT, JMT, KM = 16, 12, 5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    circ = str(d / "circ.nc")
    tracer = str(d / "tracer.nc")
    optf = str(d / "opts.txt")
    make_circ_file(circ, imt=IMT, jmt=JMT, km=KM, seed=11)
    make_tracer_file(tracer, IMT, JMT, KM,
                     tracer_names=("IAGE_CUR", "PO4_CUR", "DOP_CUR"), seed=11)
    with open(optf, "w") as f:
        f.write(f"circ_fname {circ}\n")
        f.write("adv_type cent\n")          # 4-char prefix quirk
        f.write("hmix_type const\n")
        f.write("vmix_type file\n")
        f.write("sink_type const 1.21e-4\n")
    return d, circ, tracer, optf


def test_gen_a_cli_and_matrix_file(setup):
    d, circ, tracer, optf = setup
    mat = str(d / "matrix.nc")
    assert gen_a_main(["-D", "0", "-o", optf, mat]) == 0

    m = read_matrix_file(mat)
    assert m.coupled_tracer_cnt == 1
    assert m.flat_len == load_ind_maps(mat).tracer_state_len
    # rowptr sane
    assert m.rowptr[0] == 0 and m.rowptr[-1] == m.nnz
    assert (np.diff(m.rowptr) >= 1).all()
    # diagonal present and nonzero on every row (check_matrix_diag analog)
    A = m.to_scipy()
    assert (A.diagonal() != 0).all()

    # header/layout compatibility: independent reader sees the documented
    # dims and vars, in order
    with netcdf_file(mat, "r", mmap=False) as f:
        assert list(f.dimensions.keys()) == [
            "nlon", "nlat", "z_t", "tracer_state_len", "nnz", "flat_len_p1"]
        names = list(f.variables.keys())
        assert names == ["z_t", "TLONG", "TLAT", "KMT",
                         "int3_to_tracer_state_ind", "tracer_state_ind_to_i",
                         "tracer_state_ind_to_j", "tracer_state_ind_to_k",
                         "coupled_tracer_cnt", "nzval_row_wise", "colind",
                         "rowptr"]
        assert f.variables["int3_to_tracer_state_ind"]._FillValue == -1
        assert f.variables["z_t"].units == b"centimeters"


def test_solve_cli_scipy_backend(setup):
    d, circ, tracer, optf = setup
    mat = str(d / "matrix2.nc")
    run_gen_a(mat, optf)
    maps = load_ind_maps(mat)
    m = read_matrix_file(mat)

    before = {v: fields.get_var_double(tracer, v, 3)
              for v in ("IAGE_CUR", "PO4_CUR")}
    assert solve_main(["-v", "IAGE_CUR,PO4_CUR", "--backend", "scipy",
                       mat, tracer]) == 0

    A = m.to_scipy()
    wet = maps.int3_to_ind >= 0
    for var in ("IAGE_CUR", "PO4_CUR"):
        after = fields.get_var_double(tracer, var, 3)
        # land values preserved (put_B reads field first, solve_ABglobal.c:236)
        np.testing.assert_array_equal(after[~wet], before[var][~wet])
        # solution satisfies A x = b to solver accuracy
        x = maps.flatten_field(after)
        b = maps.flatten_field(before[var])
        res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
        assert res < 1e-10, f"{var}: residual {res:.3e}"


def test_solve_var_group_mismatch(setup):
    d, circ, tracer, optf = setup
    mat = str(d / "matrix2.nc")
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.solve import parse_var_groups
    with pytest.raises(ValueError):
        parse_var_groups("a,b,c", 2)
    assert parse_var_groups("a,b,c,d", 2) == [["a", "b"], ["c", "d"]]
