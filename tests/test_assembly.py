"""Assembly validation: the vectorized stencil assembly must produce the
exact canonical CSR (pattern identical, values near-bit-exact) as the
independent loop-based oracle transcribed from the reference algorithm."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.grid import gen_ind_maps, load_grid
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions,
    PerTracerOptions,
    assemble_jacobian,
)
from nk_ocn_tracer_jacobian_precond_tpu.ops.assemble import structural_nnz, to_csr
from nk_ocn_tracer_jacobian_precond_tpu.ops.fieldsource import FileFieldSource
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_tracer_file,
)
from reference_impl import RefAssembler

IMT, JMT, KM = 14, 10, 5


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("assembly")
    circ = str(d / "circ.nc")
    tracer = str(d / "tracer.nc")
    make_circ_file(circ, imt=IMT, jmt=JMT, km=KM, seed=4)
    make_tracer_file(
        tracer, IMT, JMT, KM,
        tracer_names=("IAGE_CUR",),
        sink_field_names=("my_sink_rate",),
        generic_tracer_names=("PO4", "DIC"),
        coupled_names=(("OCMIP_BGC_PO4", "OCMIP_BGC_DOP"),
                       ("OCMIP_BGC_DOP", "OCMIP_BGC_PO4"),
                       ("DIC_SHADOW", "ALK_SHADOW"),
                       ("ALK_SHADOW", "DIC_SHADOW")),
        pv_names=("pv_a", "pv_b"),
        sf_names=(("DIC_SHADOW", "ALK_SHADOW"), ("ALK_SHADOW", "DIC_SHADOW"),
                  ("a", "b")),
        seed=4)
    return circ, tracer


def compare(circ, tracer, opts, rtol=1e-14):
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    tsrc = FileFieldSource(tracer) if tracer else None
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    asm = assemble_jacobian(grid, opts, csrc, tsrc, maps)
    nzval, colind, rowptr = to_csr(asm)
    ref = RefAssembler(grid, opts, csrc, tsrc)
    r_nzval, r_colind, r_rowptr = ref.build()
    np.testing.assert_array_equal(rowptr, r_rowptr,
                                  err_msg="rowptr (pattern) mismatch")
    np.testing.assert_array_equal(colind, r_colind,
                                  err_msg="colind (pattern) mismatch")
    np.testing.assert_allclose(nzval, r_nzval, rtol=rtol, atol=0,
                               err_msg="value mismatch")
    # bit-exactness bookkeeping: how many entries differ at all
    exact = (nzval == r_nzval).mean()
    assert exact > 0.99, f"only {exact:.4%} of values bit-identical"
    return nzval, colind, rowptr, asm


CASES = [
    # (adv, divfree, hmix, vmix)
    ("centered", True, "const", "const"),
    ("centered", False, "none", "none"),
    ("donor", True, "const", "file"),
    ("centered", True, "hor_file", "file"),
    ("centered", True, "isop_file", "file"),
    ("upwind3", True, "isop_file", "file"),
    ("upwind3", False, "const", "const"),
    ("none", False, "isop_file", "matrix_file"),
    ("centered", True, "isop_file", "matrix_file"),
    ("donor", True, "none", "const"),
]


@pytest.mark.parametrize("adv,divfree,hmix,vmix", CASES)
def test_single_tracer_combinations(files, adv, divfree, hmix, vmix):
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, adv_type=adv,
                           l_adv_enforce_divfree=divfree,
                           hmix_type=hmix, vmix_type=vmix)
    compare(circ, tracer, opts)


def test_structural_nnz_matches_oracle(files):
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, adv_type="upwind3",
                           hmix_type="isop_file", vmix_type="matrix_file")
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    asm = assemble_jacobian(grid, opts, csrc, None, maps)
    ref = RefAssembler(grid, opts, csrc, None)
    assert structural_nnz(asm) == sum(len(r) for r in ref.rows)


@pytest.mark.parametrize("sink", [
    ("const",), ("const_shallow",), ("file",), ("generic_full",),
    ("generic_limited",)])
def test_sink_options(files, sink):
    circ, tracer = files
    pt = PerTracerOptions()
    if sink[0] == "const":
        pt.sink_type = "const"
        pt.sink_rate = 3.3e-4
    elif sink[0] == "const_shallow":
        pt.sink_type = "const_shallow"
        pt.sink_rate = 2.0e-4
        pt.sink_depth = 2500.0
    elif sink[0] == "file":
        pt.sink_type = "file"
        pt.sink_field_name = "my_sink_rate"
    elif sink[0] == "generic_full":
        pt.sink_type = "generic_tracer"
        pt.sink_generic_tracer_name = "PO4"
    elif sink[0] == "generic_limited":
        pt.sink_type = "generic_tracer"
        pt.sink_generic_tracer_name = "DIC"
        pt.sink_generic_tracer_depends_layer_cnt = 3
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer,
                           hmix_type="const", vmix_type="file",
                           per_tracer=[pt])
    compare(circ, tracer, opts)


def test_pv_and_sf(files):
    circ, tracer = files
    pt = PerTracerOptions(pv_field_name="pv_a",
                          d_SF_d_TRACER_field_name="d_SF_a_d_b")
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer,
                           hmix_type="const", vmix_type="const",
                           per_tracer=[pt])
    compare(circ, tracer, opts)


@pytest.mark.parametrize("ctype", ["OCMIP_BGC_PO4_DOP", "DIC_SHADOW_ALK_SHADOW"])
def test_coupled_tracers(files, ctype):
    circ, tracer = files
    pts = [PerTracerOptions(), PerTracerOptions()]
    if ctype == "DIC_SHADOW_ALK_SHADOW":
        pts[0].pv_field_name = "pv_a"
        pts[1].pv_field_name = "pv_b"
    opts = AssemblyOptions(circ_fname=circ, tracer_fname=tracer,
                           hmix_type="isop_file", vmix_type="file",
                           coupled_tracer_cnt=2, per_tracer=pts,
                           coupled_tracer_type=ctype)
    nzval, colind, rowptr, asm = compare(circ, tracer, opts)
    # cross-tracer blocks must be present
    tsl = asm.maps.tracer_state_len
    assert (colind >= tsl).any() and rowptr[tsl] < len(nzval)


def test_day_cnt_scaling(files):
    """delta_t enters linearly in transport terms (matrix.c:3778)."""
    circ, tracer = files
    o1 = AssemblyOptions(circ_fname=circ, hmix_type="const", vmix_type="const",
                         l_adv_enforce_divfree=False, day_cnt=365.0)
    o2 = AssemblyOptions(circ_fname=circ, hmix_type="const", vmix_type="const",
                         l_adv_enforce_divfree=False, day_cnt=730.0)
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    n1, c1, r1 = to_csr(assemble_jacobian(grid, o1, csrc, None, maps))
    n2, c2, r2 = to_csr(assemble_jacobian(grid, o2, csrc, None, maps))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(n2, 2.0 * n1, rtol=1e-14)


def test_divfree_row_sums(files):
    """After adv_enforce_divfree with pure advection, every row sums to 0
    (matrix.c:2195-2196)."""
    circ, tracer = files
    opts = AssemblyOptions(circ_fname=circ, adv_type="centered",
                           l_adv_enforce_divfree=True,
                           hmix_type="none", vmix_type="none")
    grid = load_grid(circ)
    csrc = FileFieldSource(circ)
    maps = gen_ind_maps(np.asarray(grid.KMT), grid.km)
    nzval, colind, rowptr = to_csr(assemble_jacobian(grid, opts, csrc, None, maps))
    sums = np.add.reduceat(nzval, rowptr[:-1][rowptr[:-1] < len(nzval)])
    rows_nonempty = np.diff(rowptr) > 0
    # resumming the column-sorted CSR reorders divfree's fold, so only
    # roundoff-level residuals are expected
    assert np.abs(sums[: rows_nonempty.sum()]).max() <= 1e-12 * np.abs(nzval).max()


def test_vertical_upwind3_weights_golden():
    """Golden pin of the nonuniform vertical QUICK weights (the POP dzc/
    talfzp..tdelzm formulas, reference src/matrix.c:1878-1901). The loop
    oracle imports the production weights, so this pin is the independent
    cross-check: values below were hand-derived from the reference's
    formulas for dz = [50, 60, 80, 110, 160, 250]."""
    from nk_ocn_tracer_jacobian_precond_tpu.ops.adv import (
        vertical_upwind3_weights)

    dz = np.array([50.0, 60.0, 80.0, 110.0, 160.0, 250.0])
    golden = {
        "talfzp": [3.2467532467532467e-01, 2.9142857142857143e-01,
                   2.8070175438596490e-01, 2.6570048309178745e-01,
                   2.4677187948350074e-01, 0.0],
        "tbetzp": [6.7532467532467533e-01, 8.8311688311688308e-01,
                   9.0977443609022557e-01, 9.3567251461988299e-01,
                   9.7109304426377596e-01, 0.0],
        "tgamzp": [0.0, -1.7454545454545453e-01, -1.9047619047619047e-01,
                   -2.0137299771167050e-01, -2.1786492374727670e-01, 0.0],
        "talfzm": [6.4935064935064934e-01, 6.0902255639097747e-01,
                   5.9259259259259256e-01, 5.6639566395663954e-01,
                   5.8536585365853655e-01, 0.0],
        "tbetzm": [4.3636363636363640e-01, 4.6753246753246752e-01,
                   4.7826086956521741e-01, 4.9673202614379086e-01,
                   5.0254623425355127e-01, 0.0],
        "tdelzm": [-8.5714285714285715e-02, -7.6555023923444973e-02,
                   -7.0853462157809993e-02, -6.3127690100430414e-02,
                   -8.7912087912087919e-02, 0.0],
    }
    got = dict(zip(["talfzp", "tbetzp", "tgamzp",
                    "talfzm", "tbetzm", "tdelzm"],
                   vertical_upwind3_weights(dz)))
    for name, vals in golden.items():
        np.testing.assert_allclose(got[name], vals, rtol=1e-15,
                                   err_msg=name)
