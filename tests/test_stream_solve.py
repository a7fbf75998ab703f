"""Out-of-core streamed solve over per-round factor checkpoints.

The production configuration for factor sets larger than RAM/HBM
(gx1 float64: ~88 GB trimmed): factor-only pass writes v3 trimmed
round checkpoints, and solver/stream_solve.py walks them forward and
backward, one round in memory at a time.
"""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import (AssemblyOptions,
                                                    PerTracerOptions)
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
    MultifrontalFactorization)
from nk_ocn_tracer_jacobian_precond_tpu.solver.stream_solve import (
    stream_solve)
from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
    symbolic_from_matrix)
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file


@pytest.fixture(scope="module")
def problem(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=16, jmt=14, km=6, seed=71)
    mat = str(d / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="isop_file",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    return matrix, maps, sym


def test_stream_solve_from_factor_only_checkpoints(problem, tmp_path,
                                                   monkeypatch):
    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")
    monkeypatch.setenv("NK_FACTOR_ONLY", "1")
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    factor_checkpoint_dir=ck)
    pack_bs = fac.engine._pack_bs
    monkeypatch.delenv("NK_FACTOR_ONLY")

    rng = np.random.default_rng(9)
    B = rng.standard_normal((matrix.flat_len, 2))
    X, rel = stream_solve(matrix, maps, sym, ck, B, pack_bs=pack_bs,
                          refine_tol=1e-11)
    assert rel.max() <= 1e-10
    # cross-check against a fully in-memory engine solve
    fac2 = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                     refine_tol=1e-11)
    X2 = fac2.solve(B)
    scale = np.abs(X2).max()
    assert np.allclose(X, X2, atol=1e-8 * scale)


def test_stream_solve_rejects_incomplete_checkpoints(problem, tmp_path,
                                                     monkeypatch):
    import os
    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")
    monkeypatch.setenv("NK_FACTOR_ONLY", "1")
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    factor_checkpoint_dir=ck)
    pack_bs = fac.engine._pack_bs
    monkeypatch.delenv("NK_FACTOR_ONLY")
    files = sorted(f for f in os.listdir(ck)
                   if f.endswith(".npz") and "_S" not in f)
    os.remove(os.path.join(ck, files[-1]))
    with pytest.raises(RuntimeError, match="cannot stream-solve"):
        stream_solve(matrix, maps, sym, ck,
                     np.ones(matrix.flat_len), pack_bs=pack_bs)
