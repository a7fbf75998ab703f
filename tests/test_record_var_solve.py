"""Solve against a tracer file whose variables carry a time record dim
(as real POP function-evaluation files do): the in-place update must
preserve the record axis and land values."""

import numpy as np

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.drivers.solve import run_solve
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io import fields, netcdf3
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import AssemblyOptions, PerTracerOptions
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)


def test_record_var_roundtrip(tmp_path):
    circ = str(tmp_path / "circ.nc")
    tracer = str(tmp_path / "tracer.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=77)
    make_tracer_file(tracer, 14, 12, 4, tracer_names=("IAGE_CUR", "DIC_CUR"),
                     seed=77, with_time_dim=True)
    hdr = netcdf3.read_header(tracer)
    assert hdr.vars["IAGE_CUR"].is_record

    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1.21e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)

    before = fields.get_var_double(tracer, "IAGE_CUR", 3)
    other_before = fields.get_var_double(tracer, "DIC_CUR", 3)
    res = run_solve(mat, tracer, "IAGE_CUR", backend="scipy")
    assert res["residuals"]["IAGE_CUR"] < 1e-9

    hdr2 = netcdf3.read_header(tracer)
    assert hdr2.vars["IAGE_CUR"].is_record      # record axis preserved
    after = fields.get_var_double(tracer, "IAGE_CUR", 3)
    maps = load_ind_maps(mat)
    wet = maps.int3_to_ind >= 0
    np.testing.assert_array_equal(after[~wet], before[~wet])
    assert not np.allclose(after[wet], before[wet])
    # sibling variable untouched
    np.testing.assert_array_equal(
        fields.get_var_double(tracer, "DIC_CUR", 3), other_before)
    # solution satisfies the system
    matrix = read_matrix_file(mat)
    x = maps.flatten_field(after)
    b = maps.flatten_field(before)
    A = matrix.to_scipy()
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-9
