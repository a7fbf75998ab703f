"""Factor-precision selection and float64 escalation.

The reference solves in float64 throughout (SuperLU_DIST dgssvx,
solve_ABdist.c:518). The rebuild's float32 fast path is only valid where
eps32 x elimination growth stays well under 1; on 60-level deep trees the
year-long implicit vertical diffusion drives growth to ~1e5-1e11 and the
float32 preconditioner comes out O(1) wrong (measured raw apply error
0.4-1e4 at gx3deep/gx1, round 3). These tests pin the repair: explicit
precision plumbing plus automatic escalation to float64 factors when
refinement detects a hopeless preconditioner.
"""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import read_matrix_file
from nk_ocn_tracer_jacobian_precond_tpu.ops import (AssemblyOptions,
                                                    PerTracerOptions)
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
    MultifrontalFactorization, _resolve_precision)
from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
    symbolic_from_matrix)
from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file


@pytest.fixture(scope="module")
def small_problem(tmp_path_factory):
    d = tmp_path_factory.mktemp("prec")
    circ = str(d / "circ.nc")
    make_circ_file(circ, imt=14, jmt=12, km=6, seed=61)
    mat = str(d / "m.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="const",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    sym = symbolic_from_matrix(maps, matrix, leaf_size=8)
    return matrix, maps, sym


def test_resolve_precision_strings():
    import jax.numpy as jnp
    assert _resolve_precision("f32") == jnp.float32
    assert _resolve_precision("float64") == jnp.float64
    assert _resolve_precision("auto") is None
    assert _resolve_precision(None) is None
    assert _resolve_precision(jnp.float64) == jnp.float64
    with pytest.raises(ValueError):
        _resolve_precision("bf16")


def test_nk_prec_env(small_problem, monkeypatch):
    import jax.numpy as jnp
    matrix, maps, sym = small_problem
    monkeypatch.setenv("NK_PREC", "f64")
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym)
    assert fac.engine.prec == jnp.float64


def test_f64_requires_x64(small_problem):
    """float64 without x64 must fail loudly, never silently compute f32
    (the round-3 phantom: every 'f64 CPU' repro was secretly float32)."""
    import jax
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        JaxMultifrontal)
    matrix, maps, sym = small_problem
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import equilibrate
    fm, _, _ = equilibrate(matrix)
    assert jax.config.jax_enable_x64      # conftest turns it on
    jax.config.update("jax_enable_x64", False)
    try:
        import jax.numpy as jnp
        with pytest.raises(ValueError, match="x64"):
            JaxMultifrontal(sym, fm, precision=jnp.float64, factorize=False)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_escalation_flow(small_problem, monkeypatch):
    """float32 factors + a giveup threshold below their accuracy: the
    refiner must bail out instead of grinding Krylov cycles, the facade
    must refactor in float64, and the solve must reach the contract."""
    import jax.numpy as jnp
    matrix, maps, sym = small_problem
    # this small problem's float32 preconditioner is GOOD (~1e-6 apply
    # error); dropping the giveup bar below it forces the exact code path
    # a production-scale float32 breakdown takes
    monkeypatch.setenv("NK_REFINE_GIVEUP", "1e-9")
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    refine_tol=1e-12, precision="f32")
    assert fac.engine.prec == jnp.float32
    rng = np.random.default_rng(0)
    b = rng.standard_normal(matrix.flat_len)
    x = fac.solve(b)
    assert fac.engine.prec == jnp.float64      # escalated
    rel = (np.linalg.norm(matrix.to_scipy() @ x - b)
           / np.linalg.norm(b))
    assert rel <= 1e-10


def test_escalation_disabled(small_problem, monkeypatch):
    """NK_ESCALATE=0 keeps the float32 engine (and the stall warning)."""
    import jax.numpy as jnp
    matrix, maps, sym = small_problem
    monkeypatch.setenv("NK_ESCALATE", "0")
    monkeypatch.setenv("NK_REFINE_GIVEUP", "1e-9")
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    refine_tol=1e-12, precision="f32")
    rng = np.random.default_rng(0)
    b = rng.standard_normal(matrix.flat_len)
    with pytest.warns(RuntimeWarning, match="stalled|target accuracy"):
        fac.solve(b)
    assert fac.engine.prec == jnp.float32
