"""Bit-exactness of the extend-add formulations (VERDICT round-3 item 2).

The float64-on-TPU wave extend-add (solver/mf_jax.py::_extend_add,
wlinks branch) reformulates the Schur scatter-add as native-f32 one-hot
GEMMs over a 3-way hi/mid/lo mantissa split. Every step is pure
selection (one unit coefficient per output element), so the result must
be BIT-EQUAL to the straightforward f64 gather/scatter — this test
proves it on CPU (NK_EA_FORCE_WAVES=1 runs the same trace the TPU
takes), against both a numpy loop oracle and the default path.

Reference analog: the extend-add inside SuperLU_DIST's pdgstrf
(SuperLU_brief_tree.txt:12-14) — there a plain f64 scatter; here the
formulation XLA:TPU's f64 lowering pathologies force.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
    _dst_gather_waves, _ea_chunk_len_waves, _extend_add)


def _synthetic(B, N, M, Sb, L, seed=0):
    """Adversarial f64 data: full-width mantissas (splitting into f32
    components must lose nothing) and magnitudes spanning ~1e12."""
    rng = np.random.default_rng(seed)
    S_src = rng.standard_normal((Sb, M, M))
    S_src *= np.exp(rng.uniform(-14, 14, size=(Sb, M, M)))
    ss = rng.integers(0, Sb, size=L).astype(np.int32)
    ds = rng.integers(0, B, size=L).astype(np.int32)   # duplicates likely
    iv = rng.integers(0, M + 1, size=(L, N)).astype(np.int32)  # M+1 = pad
    return S_src, ss, ds, iv


def _oracle(B, N, S_src, ss, ds, iv):
    Spn = np.pad(S_src, ((0, 0), (0, 1), (0, 1)))
    ref = np.zeros((B, N, N))
    for l in range(len(ss)):
        ref[ds[l]] += Spn[ss[l]][iv[l]][:, iv[l]]
    return ref


@pytest.mark.parametrize("dst_form", ["gemm", "gather"])
@pytest.mark.parametrize("B,N,M,Sb,L", [(6, 16, 24, 8, 13),
                                        (4, 8, 8, 4, 9)])
def test_wave_extend_add_bit_exact(B, N, M, Sb, L, dst_form, monkeypatch):
    S_src, ss, ds, iv = _synthetic(B, N, M, Sb, L)
    ref = _oracle(B, N, S_src, ss, ds, iv)

    # default (CPU take_along_axis + scatter-add) path
    out_def = np.asarray(_extend_add(
        jnp.zeros((B, N, N), jnp.float64), jnp.asarray(S_src),
        jnp.asarray(ss), jnp.asarray(ds), jnp.asarray(iv), None))
    np.testing.assert_array_equal(out_def, ref)

    # wave path: the exact trace the f64-on-TPU production factor runs.
    # Both destination placements must be bit-exact: the GEMM form is
    # the TPU default (the gather composite hangs the remote compiler,
    # ea_bisect 2026-08-20); gather stays as the opt-in fallback.
    Lc = _ea_chunk_len_waves(N, M + 1)
    wl = _dst_gather_waves(ds, B, Lc)
    monkeypatch.setenv("NK_EA_FORCE_WAVES", "1")
    monkeypatch.setenv("NK_EA_DST", dst_form)
    _extend_add.clear_cache()   # force_waves is read at trace time
    try:
        out_wave = np.asarray(_extend_add(
            jnp.zeros((B, N, N), jnp.float64), jnp.asarray(S_src),
            jnp.asarray(ss), jnp.asarray(ds), jnp.asarray(iv),
            jnp.asarray(wl)))
    finally:
        monkeypatch.delenv("NK_EA_FORCE_WAVES")
        monkeypatch.delenv("NK_EA_DST")
        _extend_add.clear_cache()
    # pure selection at every step: BIT equality, not a tolerance
    np.testing.assert_array_equal(out_wave, ref)


def test_three_way_split_covers_f64():
    """The hi/mid/lo f32 split reassembles any f64 within f32's exponent
    range exactly (3 x 24 >= 53 mantissa bits; a 2-way split demonstrably
    does not). Outside f32's exponent range the split under/overflows —
    the production factor path satisfies the precondition by Ruiz
    equilibration (solver/mf.py::equilibrate) + bounded GESP growth."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(4096) * np.exp(rng.uniform(-60, 60, 4096))
    hi = x.astype(np.float32)
    r1 = x - hi.astype(np.float64)
    mid = r1.astype(np.float32)
    lo = (r1 - mid.astype(np.float64)).astype(np.float32)
    back = (hi.astype(np.float64) + mid.astype(np.float64)) \
        + lo.astype(np.float64)
    np.testing.assert_array_equal(back, x)
    # and the 2-way split does lose bits on full-width mantissas
    two = hi.astype(np.float64) + r1.astype(np.float32).astype(np.float64)
    assert (two != x).any()


def test_f64_split_assembly_bit_exact(monkeypatch):
    """The f64-on-TPU assembly one-hot runs as three f32 selection
    passes over an exact hi/mid/lo split (solver/mf_jax.py::_assemble);
    forced on CPU it must be BIT-EQUAL to the plain f64 one-hot."""
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import _assemble

    rng = np.random.default_rng(5)
    B, N, W, nnz = 2, 8, 3, 12
    nzval_ext = np.zeros(nnz + 1)
    nzval_ext[:nnz] = rng.standard_normal(nnz) * np.exp(
        rng.uniform(-10, 10, nnz))
    a_col = np.zeros((B, N, W), np.int32)
    a_csrc = np.full((B, N, W), nnz, np.int32)
    # unique front column per (b, r, w) slot — the invariant the split
    # path relies on (front columns are unique per row)
    for b in range(B):
        for r in range(N):
            cols = rng.choice(N, size=W, replace=False)
            nsl = rng.integers(1, W + 1)
            a_col[b, r, :nsl] = np.sort(cols[:nsl])
            a_csrc[b, r, :nsl] = rng.integers(0, nnz, nsl)
    a_pos = np.full((B, 1), N * N, np.int32)
    a_src = np.full((B, 1), nnz, np.int32)
    p_arr = np.array([N, N - 2], np.int32)
    args = (jnp.asarray(nzval_ext), jnp.asarray(a_col),
            jnp.asarray(a_csrc), jnp.asarray(a_pos), jnp.asarray(a_src),
            jnp.asarray(p_arr))

    ref = np.asarray(_assemble(*args, N=N, P=N, spill=False,
                               impl="onehot"))
    monkeypatch.setenv("NK_ASM_F64_SPLIT", "force")
    _assemble.clear_cache()
    try:
        out = np.asarray(_assemble(*args, N=N, P=N, spill=False,
                                   impl="onehot"))
    finally:
        monkeypatch.delenv("NK_ASM_F64_SPLIT")
        _assemble.clear_cache()
    np.testing.assert_array_equal(out, ref)
