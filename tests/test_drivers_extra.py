"""Driver extras: ncdiff utility, option echo, multifrontal-backend solve CLI,
option-file parsing quirks."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.drivers.config import (
    OptionError,
    parse_opt_file,
)
from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.drivers.ncdiff import diff_files
from nk_ocn_tracer_jacobian_precond_tpu.drivers.solve import run_solve
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io import fields
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import AssemblyOptions, PerTracerOptions
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)


def test_opt_file_parsing(tmp_path):
    f = tmp_path / "opts.txt"
    f.write_text(
        "day_cnt 730\n"
        "circ_fname /x/circ.nc\n"
        "adv_type cent\n"             # 4-char prefix quirk
        "l_adv_enforce_divfree 0\n"
        "hmix_type hor_file\n"
        "vmix_type matrix_file\n"
        "tracer_fname /x/t.nc\n"
        "sink_type const_shallow 2.5e-4 1500\n"
        "pv my_pv\n"
        "sf my_sf\n")
    o = parse_opt_file(str(f))
    assert o.day_cnt == 730 and o.adv_type == "centered"
    assert not o.l_adv_enforce_divfree
    assert o.hmix_type == "hor_file" and o.vmix_type == "matrix_file"
    pt = o.per_tracer[0]
    assert pt.sink_type == "const_shallow"
    assert pt.sink_rate == 2.5e-4 and pt.sink_depth == 1500
    assert pt.pv_field_name == "my_pv"
    assert pt.d_SF_d_TRACER_field_name == "my_sf"


def test_opt_file_generic_tracer_and_coupled(tmp_path):
    f = tmp_path / "opts.txt"
    f.write_text(
        "circ_fname /x/c.nc\n"
        "coupled_tracer_cnt 2\n"
        "coupled_tracer_type OCMIP_BGC_PO4_DOP\n"
        "tracer_ind 0\n"
        "sink_type generic_tracer PO4 5\n"
        "tracer_ind 1\n"
        "sink_type const 1e-4\n")
    o = parse_opt_file(str(f))
    assert o.coupled_tracer_cnt == 2
    assert o.per_tracer[0].sink_generic_tracer_name == "PO4"
    assert o.per_tracer[0].sink_generic_tracer_depends_layer_cnt == 5
    assert o.per_tracer[1].sink_type == "const"


@pytest.mark.parametrize("text,err", [
    ("adv_type bogus\n", "unknown adv_type"),
    ("coupled_tracer_cnt 3\n", "not supported"),
    ("sink_type const\n", "unspecified sink_rate"),
    ("mystery_opt 1\n", "unknown option"),
    ("circ_fname /x\nadv_type upwind3\nhmix_type hor_file\n", "hor_file"),
])
def test_opt_file_errors(tmp_path, text, err):
    f = tmp_path / "bad.txt"
    f.write_text("circ_fname /x/c.nc\n" + text)
    with pytest.raises((OptionError, ValueError), match=err):
        parse_opt_file(str(f))


def test_ncdiff_and_mf_backend_solve(tmp_path):
    circ = str(tmp_path / "circ.nc")
    tracer = str(tmp_path / "tracer.nc")
    tracer2 = str(tmp_path / "tracer2.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=60)
    make_tracer_file(tracer, 14, 12, 4, tracer_names=("IAGE_CUR",), seed=60)
    make_tracer_file(tracer2, 14, 12, 4, tracer_names=("IAGE_CUR",), seed=60)
    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1.21e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts, dbg_lvl=1)   # exercises write_opts echo

    # identical files diff clean
    assert diff_files(tracer, tracer2, quiet=True) == 0

    res = run_solve(mat, tracer, "IAGE_CUR", backend="multifrontal")
    # this synthetic system's conditioning caps ANY backward-stable direct
    # solver near 3e-10 (scipy SuperLU + refinement also stalls there)
    assert res["residuals"]["IAGE_CUR"] < 1e-9

    # solved file now differs from the untouched copy
    assert diff_files(tracer, tracer2, ["IAGE_CUR"], quiet=True) == 1

    # and the solution satisfies the system
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    x = maps.flatten_field(fields.get_var_double(tracer, "IAGE_CUR", 3))
    b = maps.flatten_field(fields.get_var_double(tracer2, "IAGE_CUR", 3))
    A = matrix.to_scipy()
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-9


def test_solve_memplan_flag(tmp_path, capsys=None):
    """--memplan prints sizing and exits 0 without factorizing."""
    import subprocess, sys, os
    from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file
    from nk_ocn_tracer_jacobian_precond_tpu.ops import (
        AssemblyOptions, PerTracerOptions)
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
    circ = str(tmp_path / "circ.nc")
    make_circ_file(circ, imt=16, jmt=12, km=4, seed=4)
    mat = str(tmp_path / "matrix.nc")
    opts = AssemblyOptions(
        circ_fname=circ,
        per_tracer=[PerTracerOptions(sink_type="const", sink_rate=1e-4)])
    run_gen_a(mat, opts=opts)
    from nk_ocn_tracer_jacobian_precond_tpu.drivers import solve as sdrv
    rc = sdrv.main(["--memplan", "-n", "2,2", mat])
    assert rc == 0
    # missing -v / inout without --memplan is an argument error
    rc = sdrv.main([mat])
    assert rc == 2


def test_check_matrix_diag_warns():
    """check_matrix_diag (reference matrix.c:3692-3727): warn-only counts
    of missing and zero diagonal entries."""
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import SparseMatrix
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import (
        check_matrix_diag)
    # row 0: diag present; row 1: zero diag; row 2: no diag at all
    m = SparseMatrix(nzval=np.array([2.0, 1.0, 0.0, 3.0]),
                     colind=np.array([0, 1, 1, 0], dtype=np.int64),
                     rowptr=np.array([0, 1, 3, 4], dtype=np.int64),
                     coupled_tracer_cnt=1)
    missing, zeros = check_matrix_diag(m)
    assert missing == 1 and zeros == 1
    ok = SparseMatrix(nzval=np.array([2.0, 1.0]),
                      colind=np.array([0, 1], dtype=np.int64),
                      rowptr=np.array([0, 1, 2], dtype=np.int64),
                      coupled_tracer_cnt=1)
    assert check_matrix_diag(ok) == (0, 0)


def test_build_plan_rejects_noncanonical_csr():
    """The assembly scatter promises unique in-bounds indices, which is
    only valid for canonical CSR — duplicates must be refused, not
    silently mis-assembled (round-1 advisor finding)."""
    import pytest as _pytest
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import SparseMatrix
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import build_plan
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import gen_ind_maps
    kmt = np.zeros((4, 4), dtype=np.int64)
    kmt[1:-1, :] = 2
    maps = gen_ind_maps(kmt, 2)
    n = maps.tracer_state_len
    # diagonal matrix, but with row 0's diagonal split into two duplicate
    # (0, 0) entries
    colind = np.concatenate([[0, 0], np.arange(1, n)]).astype(np.int64)
    rowptr = np.concatenate([[0, 2], np.arange(3, n + 2)]).astype(np.int64)
    nzval = np.ones(n + 1)
    dup = SparseMatrix(nzval=nzval, colind=colind, rowptr=rowptr,
                       coupled_tracer_cnt=1)
    sym = symbolic_from_matrix(maps, dup, leaf_size=4)
    with _pytest.raises(ValueError, match="canonical"):
        build_plan(sym, dup)
