"""Error bound of the exact-slice (Ozaki-scheme) f64 GEMM.

solver/mf_jax.py::_mm_oz runs the float64 factor's trailing Schur
updates as bf16 MXU GEMMs over 8-bit integer-grid slices of the
operands: every bf16 product pair is exact in the f32 accumulator, so
the only error sources are the dropped cross terms (~K * 2^-56 relative
to rowmax*colmax at the default 6-term budget) and one f64 rounding per
partial accumulation. This test proves the bound on CPU (NK_MM_OZ=force
takes the same trace the TPU takes) against numpy's native f64 matmul,
on adversarial data with full-width mantissas and wide dynamic range.

Reference analog: the trailing dgemm inside SuperLU_DIST's pdgstrf
(reference SuperLU_brief_tree.txt:12-14), which runs native f64 BLAS.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nk_ocn_tracer_jacobian_precond_tpu.solver import mf_jax
from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
    _mm_oz, _oz_enabled)


def _adversarial(B, M, K, N, seed, spread=12.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((B, M, K)) * np.exp(
        rng.uniform(-spread, spread, size=(B, M, K)))
    b = rng.standard_normal((B, K, N)) * np.exp(
        rng.uniform(-spread, spread, size=(B, K, N)))
    return a, b


@pytest.mark.parametrize("B,M,K,N", [
    (2, 64, 128, 96),      # trailing-update class (K = PANEL)
    (1, 100, 300, 50),     # K-chunked (nch > 1), ragged sizes
    (3, 32, 1000, 32),     # deep contraction
])
def test_mm_oz_error_bound(B, M, K, N):
    a, b = _adversarial(B, M, K, N, seed=B)
    ref = a @ b
    got = np.asarray(_mm_oz(jnp.asarray(a), jnp.asarray(b)))
    # the bound: dropped terms ~ K * 2^(-8*(T+1)) relative to the
    # row/column envelopes; f64 partial-accumulation rounding adds
    # ~n_partials * eps64. Assert an order of magnitude below the df64
    # panel's 2^-48 working precision.
    scale = (np.abs(a).max(2)[:, :, None] * np.abs(b).max(1)[:, None, :]
             * max(K, 1))
    err = (np.abs(got - ref) / scale).max()
    assert err < 2.0 ** -50, err


def test_mm_oz_zero_rows_and_exact_powers():
    """Degenerate magnitudes: all-zero rows/columns (envelope falls back
    to 1.0) and exact powers of two (the ceil envelope's frac==0 path)."""
    a = np.zeros((1, 4, 8))
    a[0, 0] = 2.0 ** np.arange(-4, 4)
    a[0, 2, 3] = -1.0
    b = np.zeros((1, 8, 3))
    b[0, :, 1] = 0.5 ** np.arange(8)
    ref = a @ b
    got = np.asarray(_mm_oz(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-15)


def test_mm_oz_row_chunked_matches_unchunked(monkeypatch):
    """The memory-lawful output-row chunking (fori over mc-row blocks)
    must produce bit-identical results to the single-shot form — the
    diagonal GEMMs are exact, so chunk boundaries cannot change any
    rounding."""
    a, b = _adversarial(1, 300, 128, 64, seed=7)
    full = np.asarray(_mm_oz(jnp.asarray(a), jnp.asarray(b)))
    monkeypatch.setattr(mf_jax, "_F64_MM_BUDGET", 1)  # force mc=128 < M
    chunked = np.asarray(_mm_oz(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(full, chunked)


def test_oz_enabled_gates(monkeypatch):
    monkeypatch.setenv("NK_MM_OZ", "0")
    assert not _oz_enabled(jnp.float64)
    monkeypatch.setenv("NK_MM_OZ", "force")
    assert _oz_enabled(jnp.float64)
    assert not _oz_enabled(jnp.float32)


def test_factor_with_oz_reaches_contract(monkeypatch, tmp_path):
    """End-to-end: a float64 factorization whose trailing updates run
    through the exact-slice GEMM still solves to the 1e-10 contract."""
    monkeypatch.setenv("NK_MM_OZ", "force")
    from nk_ocn_tracer_jacobian_precond_tpu.drivers.gen_a import run_gen_a
    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import (
        read_matrix_file)
    from nk_ocn_tracer_jacobian_precond_tpu.ops import (
        AssemblyOptions, PerTracerOptions)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
        MultifrontalFactorization)
    from nk_ocn_tracer_jacobian_precond_tpu.testdata import make_circ_file
    circ = str(tmp_path / "circ.nc")
    make_circ_file(circ, imt=24, jmt=20, km=8, seed=33)
    mat = str(tmp_path / "matrix.nc")
    pt = PerTracerOptions(sink_type="const", sink_rate=1.21e-4)
    opts = AssemblyOptions(circ_fname=circ, hmix_type="isop_file",
                           vmix_type="file", per_tracer=[pt])
    run_gen_a(mat, opts=opts)
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps,
                                    precision=jnp.float64)
    rng = np.random.default_rng(3)
    Bm = rng.standard_normal((matrix.flat_len, 2))
    X = fac.solve(Bm)
    A = matrix.to_scipy()
    rel = np.linalg.norm(A @ X - Bm, axis=0) / np.linalg.norm(Bm, axis=0)
    assert rel.max() < 1e-10, rel
