"""Device-side Newton value-update plan (ops/device_update.py): the
frozen gather+fold must reproduce the canonical CSR bit-for-bit from the
stacked fields, for every field kind (stencil offsets, vmix dense,
generic-tracer sink dense, cross-tracer), and track value changes on the
frozen pattern exactly."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.grid import gen_ind_maps, load_grid
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import SparseMatrix
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions,
    PerTracerOptions,
    assemble_jacobian,
)
from nk_ocn_tracer_jacobian_precond_tpu.ops.assemble import to_csr
from nk_ocn_tracer_jacobian_precond_tpu.ops.device_update import (
    build_update_plan,
)
from nk_ocn_tracer_jacobian_precond_tpu.ops.fieldsource import FileFieldSource
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)

IMT, JMT, KM = 14, 10, 5


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("devupd")
    circ = str(d / "circ.nc")
    tracer = str(d / "tracer.nc")
    make_circ_file(circ, imt=IMT, jmt=JMT, km=KM, seed=9)
    make_tracer_file(
        tracer, IMT, JMT, KM,
        tracer_names=("IAGE_CUR",),
        generic_tracer_names=("PO4", "DIC"),
        coupled_names=(("OCMIP_BGC_PO4", "OCMIP_BGC_DOP"),
                       ("OCMIP_BGC_DOP", "OCMIP_BGC_PO4")),
        seed=9)
    return circ, tracer


def _build(circ, tracer, opts):
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    tsrc = FileFieldSource(tracer) if tracer else None
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    asm = assemble_jacobian(grid, opts, csrc, tsrc, maps)
    nzval, colind, rowptr = to_csr(asm)
    matrix = SparseMatrix(nzval=nzval, colind=colind, rowptr=rowptr,
                          coupled_tracer_cnt=opts.coupled_tracer_cnt)
    return asm, matrix


CASES = [
    # exercises: stencil offsets incl. upwind3 + isop, vmix dense block
    dict(adv_type="upwind3", hmix_type="isop_file", vmix_type="matrix_file"),
    # generic-tracer sink dense block
    dict(adv_type="centered", hmix_type="const", vmix_type="file",
         per_tracer=[PerTracerOptions(
             sink_type="generic_tracer", sink_generic_tracer_name="DIC",
             sink_generic_tracer_depends_layer_cnt=3)]),
]


@pytest.mark.parametrize("kw", CASES)
def test_plan_validates_and_tracks_values(files, kw):
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer, **kw)
    asm, matrix = _build(circ, tracer, opts)
    # build_update_plan(matrix=...) self-validates pattern + bit-exact
    # values; rerun the value identity here explicitly too
    plan = build_update_plan(asm, matrix)
    stacked = plan.stack_fields(asm)
    assert np.array_equal(plan.update(stacked), np.asarray(matrix.nzval))

    # frozen-pattern value change: scale every field by a per-row-cell
    # POWER OF TWO. Every duplicate group shares its row cell, and
    # power-of-two multiplication is exact and distributes exactly over
    # the fold, so update(stacked') must equal rowscale * nzval
    # bit-for-bit — this checks the gather map entry-by-entry.
    rng = np.random.default_rng(3)
    grid = asm.grid
    c3 = 2.0 ** rng.integers(-2, 3, size=(grid.km, grid.jmt, grid.imt))
    for k in list(asm.shared):
        asm.shared[k] = asm.shared[k] * c3
    asm.self_full = [f * c3 for f in asm.self_full]
    if asm.vmix_dense is not None:
        # dense block entry (k2, k, j, i) lives in ROW cell (k, j, i)
        asm.vmix_dense = asm.vmix_dense * c3[None]
    asm.sink_dense = [None if s is None else s * c3[None]
                      for s in asm.sink_dense]
    asm.cross = {k: v * c3 for k, v in asm.cross.items()}
    stacked2 = plan.stack_fields(asm)
    got = plan.update(stacked2)
    # expected: per-entry scale by the row cell's factor
    rowptr = np.asarray(matrix.rowptr)
    row_of_entry = np.repeat(np.arange(len(rowptr) - 1),
                             np.diff(rowptr))
    # map flat row -> (k,j,i) scale: invert int3_to_ind per tracer block
    int3 = np.asarray(asm.maps.int3_to_ind)
    wetmask = int3 >= 0
    scale_of_state = np.empty(asm.maps.tracer_state_len)
    scale_of_state[int3[wetmask]] = c3[wetmask]
    scale = scale_of_state[row_of_entry % asm.maps.tracer_state_len]
    assert np.array_equal(got, np.asarray(matrix.nzval) * scale), \
        "row-scaled update mismatch"


def test_coupled_tracers_cross_fields(files):
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer,
                           hmix_type="isop_file", vmix_type="file",
                           coupled_tracer_cnt=2,
                           per_tracer=[PerTracerOptions(),
                                       PerTracerOptions()],
                           coupled_tracer_type="OCMIP_BGC_PO4_DOP")
    asm, matrix = _build(circ, tracer, opts)
    plan = build_update_plan(asm, matrix)
    assert any(k[0] == "cross" for k in plan.layout)
    assert np.array_equal(plan.update(plan.stack_fields(asm)),
                          np.asarray(matrix.nzval))


def test_update_jit_on_device(files):
    """The fold runs under jit with a jnp stacked vector (the NK-loop
    fast path) and matches the host result bitwise."""
    import jax
    import jax.numpy as jnp
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, adv_type="centered",
                           hmix_type="isop_file", vmix_type="file")
    asm, matrix = _build(circ, tracer, opts)
    plan = build_update_plan(asm, matrix)
    stacked = plan.stack_fields(asm)
    fn = jax.jit(plan.update)
    got = np.asarray(fn(jnp.asarray(stacked)))
    assert np.array_equal(got, np.asarray(matrix.nzval))
