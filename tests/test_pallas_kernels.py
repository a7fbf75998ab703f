"""Pallas panel kernel vs the XLA formulation (interpret mode on CPU).

The TPU factor path swaps the sequential pivoted-panel loop for a Pallas
kernel (solver/pallas_kernels.py) that keeps each front's panel in VMEM;
the two formulations must be BIT-identical — same pivot choices, same
factored panel — because the multifrontal numerics (restricted pivoting,
identity padding behavior) are defined by the XLA reference
(solver/mf_jax.py::_pivoted_panel). Verified bit-equal compiled on a real
v5e as well.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import _pivoted_panel
from nk_ocn_tracer_jacobian_precond_tpu.solver.pallas_kernels import (
    pallas_pivoted_panel, panel_fits_vmem)


@pytest.mark.parametrize("B,R,T,off", [
    (4, 256, 128, 128),   # mid-panel: rows already eliminated above
    (3, 128, 128, 0),     # first panel
    (2, 512, 64, 0),      # narrow final panel
])
@pytest.mark.parametrize("tau", [0.0, 0.05])
def test_pallas_panel_matches_xla(B, R, T, off, tau):
    rng = np.random.default_rng(0)
    Pan = rng.standard_normal((B, R, T)).astype(np.float32)
    # mixed true eliminated counts: one front fully dummy (p=0, identity
    # diagonal pivots), one partially padded, one full
    p_arr = np.linspace(0, off + R, B).astype(np.int32)
    Px, piv_x = _pivoted_panel(jnp.asarray(Pan), off, jnp.asarray(p_arr),
                               tau)
    Pp, piv_p = pallas_pivoted_panel(jnp.asarray(Pan), off,
                                     jnp.asarray(p_arr), tau,
                                     interpret=True)
    assert np.array_equal(np.asarray(piv_x), np.asarray(piv_p))
    assert np.array_equal(np.asarray(Px), np.asarray(Pp))


def test_pallas_panel_factors_correctly():
    """The factored panel reproduces the pivoted submatrix: P A = L U on
    the panel columns (independent of the XLA reference)."""
    rng = np.random.default_rng(1)
    B, R, T = 2, 128, 128
    Pan = rng.standard_normal((B, R, T)).astype(np.float32)
    p_arr = np.array([128, 96], dtype=np.int32)
    Pp, piv = pallas_pivoted_panel(jnp.asarray(Pan), 0,
                                   jnp.asarray(p_arr), interpret=True)
    Pp, piv = np.asarray(Pp, dtype=np.float64), np.asarray(piv)
    for b in range(B):
        A = np.asarray(Pan[b], dtype=np.float64)
        # replay the swap sequence
        for k in range(T):
            s = piv[b, k]
            A[[k, s]] = A[[s, k]]
        L = np.tril(Pp[b][:T], -1) + np.eye(T)
        Lfull = np.vstack([L, Pp[b][T:]]) if R > T else L
        U = np.triu(Pp[b][:T])
        # float32 elimination of a random panel: elementwise error grows
        # with element growth; 1e-3 absolute on O(10) entries is the
        # expected float32 envelope and far below any pivoting mistake
        np.testing.assert_allclose(Lfull @ U, A, atol=2e-3)


def test_vmem_gate():
    assert panel_fits_vmem(8192, 128)
    assert not panel_fits_vmem(8320, 128)


# --------------------------------------------------------------------------
# double-f32 (df64) panel — the float64 path's production panel kernel
# --------------------------------------------------------------------------

from nk_ocn_tracer_jacobian_precond_tpu.solver.pallas_kernels import (  # noqa: E402
    pallas_pivoted_panel_df64, panel_fits_vmem_df64)


def _split_hi_lo(x):
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@pytest.mark.parametrize("B,R,T,off", [
    (4, 256, 128, 128),
    (2, 128, 128, 0),
])
def test_df64_panel_backward_error(B, R, T, off):
    """df64 elimination must land within its ~2^-48 working precision:
    P A = L U to ~1e-12 absolute on O(1) data — 5 orders tighter than
    the f32 kernel's envelope, ~1e3 looser than pure f64."""
    rng = np.random.default_rng(3)
    A0 = rng.standard_normal((B, R, T))
    p_arr = np.linspace(off + 16, off + R, B).astype(np.int32)
    hi, lo = _split_hi_lo(A0)
    oh, ol, piv = pallas_pivoted_panel_df64(
        jnp.asarray(hi), jnp.asarray(lo), off, jnp.asarray(p_arr),
        tau=1e-8, interpret=True)
    Pp = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    piv = np.asarray(piv)
    for b in range(B):
        A = A0[b].copy()
        for k in range(T):
            s = piv[b, k]
            A[[k, s]] = A[[s, k]]
        L = np.tril(Pp[b][:T], -1) + np.eye(T)
        Lfull = np.vstack([L, Pp[b][T:]]) if R > T else L
        U = np.triu(Pp[b][:T])
        np.testing.assert_allclose(Lfull @ U, A, atol=1e-11)


def test_df64_panel_pivots_match_f64_reference():
    """On data whose pivot scores are f32-distinguishable, the df64
    kernel makes the SAME pivot choices as the XLA f64 panel and its
    factored panel agrees to df64 precision."""
    rng = np.random.default_rng(4)
    B, R, T = 2, 128, 64
    A0 = rng.standard_normal((B, R, T)) * np.exp(
        rng.uniform(-2, 2, (B, R, T)))
    p_arr = np.array([R, 96], dtype=np.int32)
    Px, piv_x = _pivoted_panel(jnp.asarray(A0), 0, jnp.asarray(p_arr),
                               tau=1e-8)
    hi, lo = _split_hi_lo(A0)
    oh, ol, piv_d = pallas_pivoted_panel_df64(
        jnp.asarray(hi), jnp.asarray(lo), 0, jnp.asarray(p_arr),
        tau=1e-8, interpret=True)
    assert np.array_equal(np.asarray(piv_x), np.asarray(piv_d))
    Pd = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    np.testing.assert_allclose(Pd, np.asarray(Px), rtol=0, atol=1e-11)


def test_df64_vmem_gate():
    assert panel_fits_vmem_df64(4096, 128)
    assert not panel_fits_vmem_df64(4224, 128)
