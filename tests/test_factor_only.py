"""Factor-only mode + out-of-core factor offload round trips.

The production split these test: a small-HBM accelerator runs the numeric
factorization with NK_FACTOR_ONLY=1 + per-round checkpointing (factors
only ever exist on the host disk), and a separate engine — possibly on a
different backend or a multi-device mesh — resumes from the same
checkpoint directory to solve. This is the rebuild's replacement for
SuperLU's in-memory ``Fact=FACTORED`` state (reference
src/solve_ABdist.c:539) surviving process death AND device-memory limits.
"""

import os

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import (
    AssemblyOptions,
    PerTracerOptions,
)
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
    MultifrontalFactorization,
)
from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
    symbolic_from_matrix,
)
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file


@pytest.fixture(scope="module")
def problem(tmp_path_factory):
    d = tmp_path_factory.mktemp("fonly")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=14, jmt=12, km=4, seed=53)
    mat = str(d / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    # amalgamation off: these tests need a multi-round tree with live
    # cross-round Schur stacks, which amalgamation correctly collapses
    # away on a problem this tiny
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8,
                               amalg_relax=0, amalg_min_cells=0)
    return matrix, maps, sym


def test_factor_only_then_solve_elsewhere(problem, tmp_path, monkeypatch):
    """A factor-only engine writes complete round checkpoints and holds no
    factors; a fresh normal engine resumes every round from disk (zero
    recompute) and solves to the workflow contract."""
    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")
    monkeypatch.setenv("NK_FACTOR_ONLY", "1")
    monkeypatch.setenv("NK_FACTOR_OFFLOAD", "1")
    fac_a = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                      factor_checkpoint_dir=ck)
    eng_a = fac_a.engine
    assert eng_a._factor_only and eng_a._offload
    assert eng_a.factors is None
    with pytest.raises(RuntimeError, match="no numeric factors"):
        eng_a.solve(np.zeros(matrix.flat_len))
    n_rounds = len(eng_a.plans)
    files = sorted(f for f in os.listdir(ck)
                   if f.endswith(".npz") and "_S" not in f)
    assert len(files) == n_rounds

    monkeypatch.delenv("NK_FACTOR_ONLY")
    fac_b = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                      factor_checkpoint_dir=ck)
    eng_b = fac_b.engine
    # every round resumed from the factor-only pass's checkpoints
    assert eng_b._scan_done(eng_b._ckpt) == set(range(n_rounds))
    rng = np.random.default_rng(4)
    B = rng.standard_normal((matrix.flat_len, 2))
    X = fac_b.solve(B)
    rel = np.linalg.norm(matrix.to_scipy() @ X - B, axis=0) \
        / np.linalg.norm(B, axis=0)
    assert rel.max() <= 1e-10


def test_factor_only_continuation_skips_done_rounds(problem, tmp_path,
                                                    monkeypatch):
    """A factor-only RESUME of an INTERRUPTED run (checkpoints + live
    Schur stacks for the completed prefix, nothing for the tail) uploads
    no plan constants for the checkpointed rounds and recomputes only the
    tail — the cross-device continuation pattern (leaf rounds on one
    backend, tree-top rounds on another)."""
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        FactorRoundCheckpointer)

    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")
    monkeypatch.setenv("NK_FACTOR_ONLY", "1")

    # interrupt the factorization mid-run: the checkpointer raises after
    # persisting n_keep rounds, leaving exactly the on-disk state a
    # session-budget kill leaves (round files 0..n_keep-1 plus the S
    # files of every round whose consumer never ran)
    class _Stop(RuntimeError):
        pass

    n_keep = None
    orig_save = FactorRoundCheckpointer.save_round

    def capped_save(self, rnd, plan, K, U12, L21, perm, S=None, **kw):
        orig_save(self, rnd, plan, K, U12, L21, perm, S, **kw)
        if rnd + 1 >= n_keep:
            raise _Stop

    # first, learn the round count from an untouched run in another dir
    fac_probe = MultifrontalFactorization(
        matrix, impl="jax", maps=maps, sym=sym,
        factor_checkpoint_dir=str(tmp_path / "probe"))
    n_rounds = len(fac_probe.engine.plans)
    assert n_rounds >= 3
    n_keep = n_rounds - 2

    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", capped_save)
    with pytest.raises(_Stop):
        MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                  factor_checkpoint_dir=ck)
    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", orig_save)

    fac_c = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                      factor_checkpoint_dir=ck)
    eng_c = fac_c.engine
    skipped = eng_c._skip_consts
    assert skipped == set(range(n_keep))
    for rnd in skipped:
        assert eng_c._consts[rnd] is None
    files = sorted(f for f in os.listdir(ck)
                   if f.endswith(".npz") and "_S" not in f)
    assert len(files) == n_rounds   # the tail was recomputed and saved

    monkeypatch.delenv("NK_FACTOR_ONLY")
    fac_b = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                      factor_checkpoint_dir=ck)
    rng = np.random.default_rng(5)
    b = rng.standard_normal(matrix.flat_len)
    x = fac_b.solve(b)
    rel = np.linalg.norm(matrix.to_scipy() @ x - b) / np.linalg.norm(b)
    assert rel <= 1e-10


def test_death_before_save_leaves_resumable_prefix(problem, tmp_path,
                                                   monkeypatch):
    """Regression (gx1 round-144 incident): a process death AFTER a
    round's extend-add consumed its sources' Schur stacks but BEFORE its
    own checkpoint was saved must leave a fully resumable prefix on disk
    — the sources' S files are deleted only once the consumer's
    checkpoint is durable."""
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        FactorRoundCheckpointer)

    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")

    class _Died(RuntimeError):
        pass

    orig_save = FactorRoundCheckpointer.save_round
    n_keep = {}

    def dying_save(self, rnd, plan, K, U12, L21, perm, S=None, **kw):
        if rnd >= n_keep["n"]:
            raise _Died    # dies BEFORE persisting this round
        orig_save(self, rnd, plan, K, U12, L21, perm, S, **kw)

    fac_probe = MultifrontalFactorization(
        matrix, impl="jax", maps=maps, sym=sym,
        factor_checkpoint_dir=str(tmp_path / "probe"))
    n_rounds = len(fac_probe.engine.plans)
    # die at the LAST round: its extend-adds consume the deepest Schur
    # chain, the worst case for drop-before-save
    n_keep["n"] = n_rounds - 1

    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", dying_save)
    with pytest.raises(_Died):
        MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                  factor_checkpoint_dir=ck)
    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", orig_save)

    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    factor_checkpoint_dir=ck)
    # the full prefix resumed — nothing was cascaded back by missing Schur
    assert fac.engine._scan_done(fac.engine._ckpt) \
        == set(range(n_rounds))
    rng = np.random.default_rng(7)
    b = rng.standard_normal(matrix.flat_len)
    x = fac.solve(b)
    rel = np.linalg.norm(matrix.to_scipy() @ x - b) / np.linalg.norm(b)
    assert rel <= 1e-10


def test_schur_repair_keeps_banked_factors(problem, tmp_path, monkeypatch):
    """Repair mode: a round with a valid factor checkpoint whose Schur
    stack (needed downstream) was lost is recomputed for its Schur only —
    its on-disk factor file is left untouched — and the factorization
    completes; stale S files are swept once every round is checkpointed."""
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        FactorRoundCheckpointer)

    matrix, maps, sym = problem
    ck = str(tmp_path / "fckpt")

    class _Stop(RuntimeError):
        pass

    orig_save = FactorRoundCheckpointer.save_round
    n_keep = {}

    def capped_save(self, rnd, plan, K, U12, L21, perm, S=None, **kw):
        orig_save(self, rnd, plan, K, U12, L21, perm, S, **kw)
        if rnd + 1 >= n_keep["n"]:
            raise _Stop    # dies right AFTER persisting round n_keep-1

    fac_probe = MultifrontalFactorization(
        matrix, impl="jax", maps=maps, sym=sym,
        factor_checkpoint_dir=str(tmp_path / "probe"))
    plans = fac_probe.engine.plans
    n_rounds = len(plans)
    n_keep["n"] = n_rounds - 1

    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", capped_save)
    with pytest.raises(_Stop):
        MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                  factor_checkpoint_dir=ck)
    monkeypatch.setattr(FactorRoundCheckpointer, "save_round", orig_save)

    # lose one Schur stack a remaining round still needs (the gx1 state)
    victims = sorted({g.src_round for p in plans[n_keep["n"]:]
                      for g in p.child_groups
                      if os.path.exists(
                          os.path.join(ck, f"round_{g.src_round:04d}_S.npy"))})
    assert victims, "test problem too small: no live Schur file to lose"
    victim = victims[0]
    os.remove(os.path.join(ck, f"round_{victim:04d}_S.npy"))
    mtime_before = os.path.getmtime(
        os.path.join(ck, f"round_{victim:04d}.npz"))

    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    factor_checkpoint_dir=ck)
    # the victim's factor file was NOT rewritten (repair, not re-save)
    assert os.path.getmtime(
        os.path.join(ck, f"round_{victim:04d}.npz")) == mtime_before
    # every round is checkpointed and the S files were swept
    files = os.listdir(ck)
    assert sum(1 for f in files if f.endswith(".npz")) == n_rounds
    assert not any(f.endswith("_S.npy") for f in files)
    rng = np.random.default_rng(8)
    b = rng.standard_normal(matrix.flat_len)
    x = fac.solve(b)
    rel = np.linalg.norm(matrix.to_scipy() @ x - b) / np.linalg.norm(b)
    assert rel <= 1e-10


def test_offload_roundtrip_matches_resident(problem, tmp_path, monkeypatch):
    """NK_FACTOR_OFFLOAD drops factors from device memory during the
    factor phase and streams them back for the solve; the streamed-back
    solve must be bit-identical to the factors-resident one."""
    matrix, maps, sym = problem
    rng = np.random.default_rng(6)
    b = rng.standard_normal(matrix.flat_len)

    monkeypatch.setenv("NK_FACTOR_OFFLOAD", "0")
    fac_res = MultifrontalFactorization(
        matrix, impl="jax", maps=maps, sym=sym,
        factor_checkpoint_dir=str(tmp_path / "ck_res"))
    assert not fac_res.engine._offload
    x_res = fac_res.solve(b, refine=False)

    monkeypatch.setenv("NK_FACTOR_OFFLOAD", "1")
    fac_off = MultifrontalFactorization(
        matrix, impl="jax", maps=maps, sym=sym,
        factor_checkpoint_dir=str(tmp_path / "ck_off"))
    assert fac_off.engine._offload
    x_off = fac_off.solve(b, refine=False)
    np.testing.assert_allclose(x_off, x_res, rtol=0, atol=0)
