"""Symbolic checkpoint round-trip: a reloaded plan must factor and solve
identically."""

import numpy as np

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import AssemblyOptions, PerTracerOptions
from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
    load_symbolic,
    save_symbolic,
)
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import MultifrontalFactorization
from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import symbolic_from_matrix
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file


def test_symbolic_checkpoint_roundtrip(tmp_path):
    circ = str(tmp_path / "circ.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=50)
    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)

    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    ckpt = str(tmp_path / "sym.npz")
    save_symbolic(ckpt, sym)
    sym2 = load_symbolic(ckpt)

    np.testing.assert_array_equal(sym.perm, sym2.perm)
    assert sym2.flat_len == sym.flat_len
    assert len(sym2.fronts) == len(sym.fronts)
    for nid, f in sym.fronts.items():
        f2 = sym2.fronts[nid]
        np.testing.assert_array_equal(f.cells, f2.cells)
        assert (f.p, f.n, f.parent, f.round) == (f2.p, f2.n, f2.parent, f2.round)

    rng = np.random.default_rng(0)
    b = rng.standard_normal(matrix.flat_len)
    x1 = MultifrontalFactorization(matrix, impl="numpy", maps=maps,
                                   sym=sym).solve(b)
    x2 = MultifrontalFactorization(matrix, impl="numpy", maps=maps,
                                   sym=sym2).solve(b)
    np.testing.assert_array_equal(x1, x2)


def test_factor_checkpoint_roundtrip(tmp_path):
    """Numeric factor save/load: a restarted process skips factorization
    and solves identically (improvement over the reference, which
    re-factors every run — SURVEY.md §5 checkpoint/resume)."""
    import numpy as np
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
    from nk_ocn_tracer_jacobian_precond_tpu.ops import (
        AssemblyOptions, PerTracerOptions)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        load_factors, save_factors)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
        MultifrontalFactorization)
    from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file

    d = tmp_path
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=16, jmt=12, km=5, seed=2)
    mat = str(d / "matrix.nc")
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file",
                           per_tracer=[PerTracerOptions(sink_type="const",
                                                        sink_rate=1e-4)])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)

    fac1 = MultifrontalFactorization(matrix, impl="jax", maps=maps)
    ckpt = str(d / "factors.npz")
    save_factors(ckpt, fac1)

    rng = np.random.default_rng(1)
    B = rng.standard_normal((matrix.flat_len, 2))
    X1 = fac1.solve(B)

    # fresh factorization object, factors replaced from the checkpoint
    fac2 = MultifrontalFactorization(matrix, impl="jax", maps=maps,
                                     sym=fac1.sym)
    load_factors(ckpt, fac2)
    X2 = fac2.solve(B)
    np.testing.assert_allclose(X2, X1, rtol=1e-12, atol=1e-14)

    # shape validation fails loudly on a different pattern
    import pytest
    circ2 = str(d / "circ2.nc")
    make_circ_file(circ2, imt=20, jmt=16, km=6, seed=3)
    mat2 = str(d / "matrix2.nc")
    run_gen_a(mat2, opts=AssemblyOptions(
        circ_fname=circ2, hmix_type="const", vmix_type="file",
        per_tracer=[PerTracerOptions(sink_type="const", sink_rate=1e-4)]))
    matrix2 = read_matrix_file(mat2)
    fac3 = MultifrontalFactorization(matrix2, impl="jax",
                                     maps=load_ind_maps(mat2))
    with pytest.raises(ValueError):
        load_factors(ckpt, fac3)


def test_round_checkpoint_resume(tmp_path):
    """Per-round factor checkpointing: a partially checkpointed
    factorization resumes (loading completed rounds, recomputing the
    rest) and produces an identical factorization; stale checkpoints
    from different matrix values are ignored."""
    import os
    import shutil
    circ = str(tmp_path / "circ.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=51)
    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    ck = str(tmp_path / "fckpt")

    fac1 = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                     factor_checkpoint_dir=ck)
    n_rounds = len(fac1.engine.plans)
    files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
    assert len(files) == n_rounds
    # v3 TRIMMED round format: unpadded per-front blocks (the difference
    # between gx1's float64 factors fitting on disk and not); the padded
    # reconstruction must be EXACT — factor kernels pad fronts with a
    # unit diagonal, so identity-padding on reload reproduces the native
    # padded stacks bit-for-bit
    z0 = np.load(os.path.join(ck, files[-1]))
    assert "blocks" in z0.files and "FP" not in z0.files
    rng = np.random.default_rng(0)
    b = rng.standard_normal(matrix.flat_len)
    x1 = fac1.solve(b, refine=False)
    fac_nock = MultifrontalFactorization(matrix, impl="jax", maps=maps,
                                         sym=sym)
    x_nock = fac_nock.solve(b, refine=False)
    np.testing.assert_allclose(x1, x_nock, rtol=0, atol=0)

    # simulate a crash that lost the tail rounds: delete the last two
    # checkpoints (and any Schur files), then "restart"
    for f in sorted(os.listdir(ck))[-4:]:
        os.remove(os.path.join(ck, f))
    fac2 = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                     factor_checkpoint_dir=ck)
    x2 = fac2.solve(b, refine=False)
    np.testing.assert_allclose(x1, x2, rtol=0, atol=0)

    # different matrix values must NOT resume from these checkpoints
    m2 = read_matrix_file(mat)
    m2 = type(m2)(nzval=np.asarray(m2.nzval) * 1.5, colind=m2.colind,
                  rowptr=m2.rowptr, coupled_tracer_cnt=m2.coupled_tracer_cnt)
    fac3 = MultifrontalFactorization(m2, impl="jax", maps=maps, sym=sym,
                                     factor_checkpoint_dir=ck)
    x3 = fac3.solve(b)
    rel = np.linalg.norm(m2.to_scipy() @ x3 - b) / np.linalg.norm(b)
    assert rel < 1e-9
    shutil.rmtree(ck)


def test_numeric_checkpoint_facade(tmp_path):
    """The numeric_checkpoint facade/CLI path (solve --factors): first
    run factors and writes the file, a restart loads it (skipping the
    numeric phase), and stale matrix VALUES are rejected by the hash."""
    circ = str(tmp_path / "circ.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=52)
    mat = str(tmp_path / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    ckpt = str(tmp_path / "factors.npz")

    fac1 = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                     numeric_checkpoint=ckpt)
    import os
    assert os.path.exists(ckpt)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(matrix.flat_len)
    x1 = fac1.solve(b, refine=False)

    # restart: the loaded factors solve bit-identically and the engine
    # never ran its numeric phase (its round checkpointer is unset and
    # factors came from the file)
    fac2 = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                     numeric_checkpoint=ckpt)
    x2 = fac2.solve(b, refine=False)
    np.testing.assert_allclose(x1, x2, rtol=0, atol=0)

    # same pattern, different values: the hash rejects the stale file and
    # the facade refactors (solve still reaches the contract)
    m2 = type(matrix)(nzval=np.asarray(matrix.nzval) * 1.5,
                      colind=matrix.colind, rowptr=matrix.rowptr,
                      coupled_tracer_cnt=matrix.coupled_tracer_cnt)
    fac3 = MultifrontalFactorization(m2, impl="jax", maps=maps, sym=sym,
                                     numeric_checkpoint=ckpt)
    x3 = fac3.solve(b)
    rel = np.linalg.norm(m2.to_scipy() @ x3 - b) / np.linalg.norm(b)
    assert rel < 1e-10
