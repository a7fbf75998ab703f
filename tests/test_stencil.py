"""Stencil-operator tests: the matrix-free SpMV must agree with the
canonical CSR matrix, on one device and sharded over the simulated mesh."""

import numpy as np
import pytest

import jax

from nk_ocn_tracer_jacobian_precond_tpu.grid import gen_ind_maps, load_grid
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import SparseMatrix
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions,
    PerTracerOptions,
    assemble_jacobian,
)
from nk_ocn_tracer_jacobian_precond_tpu.ops.assemble import to_csr
from nk_ocn_tracer_jacobian_precond_tpu.ops.fieldsource import FileFieldSource
from nk_ocn_tracer_jacobian_precond_tpu.parallel import StencilOperator, make_mesh
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)

IMT, JMT, KM = 16, 12, 5


def build(tmp_path, **kw):
    circ = str(tmp_path / "circ.nc")
    tracer = str(tmp_path / "tracer.nc")
    make_circ_file(circ, imt=IMT, jmt=JMT, km=KM, seed=42)
    make_tracer_file(tracer, IMT, JMT, KM, generic_tracer_names=("PO4",),
                     coupled_names=(("OCMIP_BGC_PO4", "OCMIP_BGC_DOP"),
                                    ("OCMIP_BGC_DOP", "OCMIP_BGC_PO4")),
                     seed=42)
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer, **kw)
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    tsrc = FileFieldSource(tracer)
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    asm = assemble_jacobian(grid, opts, csrc, tsrc, maps)
    nzval, colind, rowptr = to_csr(asm)
    matrix = SparseMatrix(nzval=nzval, colind=colind, rowptr=rowptr,
                          coupled_tracer_cnt=opts.coupled_tracer_cnt)
    return asm, matrix, maps


CASES = [
    dict(adv_type="centered", hmix_type="const", vmix_type="file"),
    dict(adv_type="upwind3", hmix_type="isop_file", vmix_type="const"),
    dict(adv_type="donor", hmix_type="isop_file", vmix_type="matrix_file"),
    dict(adv_type="centered", hmix_type="const", vmix_type="file",
         coupled_tracer_cnt=2,
         per_tracer=[PerTracerOptions(sink_type="generic_tracer",
                                      sink_generic_tracer_name="PO4"),
                     PerTracerOptions()],
         coupled_tracer_type="OCMIP_BGC_PO4_DOP"),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_matvec_matches_csr(tmp_path, case):
    asm, matrix, maps = build(tmp_path, **CASES[case])
    op = StencilOperator.from_assembly(asm)
    matvec = op.matvec_factory(maps)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(matrix.flat_len)
    y_stencil = np.asarray(matvec(x))
    y_csr = matrix.to_scipy() @ x
    scale = np.abs(y_csr).max()
    np.testing.assert_allclose(y_stencil, y_csr, rtol=1e-12,
                               atol=1e-13 * scale)


@pytest.mark.parametrize("nband", [2, 4, 8])
def test_sharded_apply_matches_local(tmp_path, nband):
    asm, matrix, maps = build(tmp_path, adv_type="upwind3",
                              hmix_type="isop_file", vmix_type="file")
    op = StencilOperator.from_assembly(asm)
    mesh = make_mesh(nband, ("band",))
    apply_fn, sharding, pad_field, unpad_field = op.sharded_apply_factory(mesh)
    rng = np.random.default_rng(8)
    nt, (km, jmt, imt) = op.nt, op.shape
    wet = np.asarray(asm.grid.KMT)[None, :, :] > np.arange(km)[:, None, None] - 1
    wet = np.arange(km)[:, None, None] < np.asarray(asm.grid.KMT)[None]
    x = np.where(wet, rng.standard_normal((km, jmt, imt)), 0.0)[None]
    x = np.repeat(x, nt, axis=0)
    y_local = np.asarray(op._device_copy().apply(x))
    xp = pad_field(x)
    xs = jax.device_put(xp, sharding)
    y_sharded = unpad_field(apply_fn(xs))
    scale = np.abs(y_local).max()
    np.testing.assert_allclose(y_sharded[:, wet], y_local[:, wet],
                               rtol=1e-12, atol=1e-13 * scale)
