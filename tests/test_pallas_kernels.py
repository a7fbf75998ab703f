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
