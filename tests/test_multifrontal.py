"""Multifrontal solver tests: ordering, symbolic invariants, and numeric
factor/solve accuracy against scipy's SuperLU on assembled Jacobians."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import AssemblyOptions, PerTracerOptions
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import MultifrontalFactorization
from nk_ocn_tracer_jacobian_precond_tpu.solver.ordering import (
    build_column_graph,
    nested_dissection,
)
from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import symbolic_from_matrix
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file

IMT, JMT, KM = 20, 16, 6


@pytest.fixture(scope="module")
def problem(tmp_path_factory):
    d = tmp_path_factory.mktemp("mf")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=IMT, jmt=JMT, km=KM, seed=21)
    mat = str(d / "matrix.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1.21e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="isop_file",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    return read_matrix_file(mat), load_ind_maps(mat)


def test_column_graph(problem):
    matrix, maps = problem
    g = build_column_graph(maps, matrix)
    assert g.depth.sum() == maps.tracer_state_len
    assert (g.depth > 0).all()
    # adjacency is symmetric and excludes self
    for c in range(0, g.ncols, 7):
        for nb in g.neighbors(c):
            assert nb != c
            assert c in g.neighbors(nb)


def test_nested_dissection_partitions(problem):
    matrix, maps = problem
    g = build_column_graph(maps, matrix)
    tree = nested_dissection(g, leaf_size=8)
    owned_all = np.concatenate([n.owned for n in tree.nodes])
    assert len(owned_all) == g.ncols
    assert len(np.unique(owned_all)) == g.ncols
    # children are eliminated before parents
    for nid, node in enumerate(tree.nodes):
        for ch in node.children:
            assert tree.col_elim_pos[tree.nodes[ch].owned].max() < \
                tree.col_elim_pos[node.owned].min()


def test_symbolic_invariants(problem):
    matrix, maps = problem
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    # perm is a permutation of all cells
    assert len(np.unique(sym.perm)) == sym.flat_len
    for f in sym.fronts.values():
        # border columns are eliminated after all owned columns
        assert f.n >= f.p > 0
        if f.parent >= 0:
            pf = sym.fronts[f.parent]
            assert set(f.cells[f.p:]) <= set(pf.cells.tolist())
    # every original nonzero is inside some front's assembled region
    # (spot-check rows)
    A = matrix.to_scipy().tocsr()


@pytest.mark.parametrize("leaf_size", [4, 16])
def test_numpy_multifrontal_solves(problem, leaf_size):
    matrix, maps = problem
    mf = MultifrontalFactorization(matrix, impl="numpy", maps=maps,
                                   leaf_size=leaf_size)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((matrix.flat_len, 3))
    X = mf.solve(B)
    A = matrix.to_scipy()
    res = np.linalg.norm(A @ X - B, axis=0) / np.linalg.norm(B, axis=0)
    assert res.max() < 1e-11, res


def test_numpy_multifrontal_unrefined_accuracy(problem):
    """The raw factorization (no refinement) must already be near direct-
    solver quality — refinement should be polish, not rescue."""
    matrix, maps = problem
    mf = MultifrontalFactorization(matrix, impl="numpy", maps=maps)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(matrix.flat_len)
    x = mf.solve(b, refine=False)
    A = matrix.to_scipy()
    res = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert res < 1e-8, res
