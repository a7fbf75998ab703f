"""Pallas TPU kernels for the multifrontal numeric phase.

The batched pivoted panel factorization is the one sequential part of the
blocked LU (solver/mf_jax.py::_pivoted_panel): T ~ 128 dependent column
steps, each a pivot search + row swap + rank-1 update of the (B, R, T)
panel. Expressed as a `lax.fori_loop` over XLA ops, every step
round-trips the whole batched panel through HBM; as a Pallas kernel the
panel of ONE front lives in VMEM across all T steps — HBM sees exactly
one read and one write of each panel, and the per-column work runs at
VPU speed from on-chip memory.

This is the TPU analog of the panel kernel inside SuperLU_DIST's pdgstrf
(dgstrf2, reference SuperLU_brief_tree.txt:12-14, reached via pdgssvx,
solve_ABdist.c:518): per-panel partial pivoting, restricted — as the
multifrontal structure requires — to fully-summed rows.

Kernel style notes: every access is a full-block vector op. Dynamic
row/column selection (the pivot row, column k) is done with masked
reductions and `jnp.where` against iota grids instead of dynamic
lane/sublane indexing, which Mosaic lowers poorly. Grid: one program per
front (batch element); Pallas double-buffers the per-front panel DMA
across grid steps. VMEM footprint is the (R, T) panel twice (in + out
block) — R <= 8192, T <= 128 keeps it under ~8.5 MB of the ~16 MB
budget. Callers fall back to the XLA formulation on non-TPU backends,
for panels too tall for VMEM, and under GSPMD sharding (a pallas_call is
a custom call the partitioner cannot split).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the panel block. 8192 * 128 * 4 B = 4 MB per buffer.
_MAX_R = 8192


def _panel_body(limit, tau, pan_ref, piv_ref, *, T: int):
    """Factor one (R, T) panel in place; record pivot rows in piv_ref.

    limit: number of panel rows eligible for pivoting (fully-summed rows
    below the already-eliminated offset). Rows at/beyond `limit` are
    identity padding or border rows and must never be chosen — except
    that column k may always pivot on its own diagonal (the identity
    padding guarantees a unit pivot there).

    tau: GESP static-pivot threshold (mf_jax._pivoted_panel): a selected
    pivot with |pv| < tau is replaced by sign(pv) * tau before the
    division, bounding 1/pivot element growth.
    """
    R = pan_ref.shape[0]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    # every literal is explicitly 32-bit: under jax_enable_x64 a Python
    # scalar becomes an f64[]/i64[] constant plus a scalar down-convert,
    # and Mosaic's convert lowering recurses without terminating on those
    f0 = jnp.float32(0.0)
    neg1 = jnp.float32(-1.0)
    Ri = jnp.int32(R)

    def step(k, _):
        P = pan_ref[:, :]
        colk = jnp.sum(jnp.where(c_idx == k, P, f0), axis=1,
                       keepdims=True)                        # (R, 1)
        ok = (r_idx >= k) & ((r_idx < limit) | (r_idx == k))
        score = jnp.where(ok, jnp.abs(colk), neg1)
        # first-max row in pure int32 (argmax would produce an int64
        # intermediate under x64 — see dtype note above)
        sel = jnp.min(jnp.where(score == jnp.max(score), r_idx, Ri))
        piv_ref[:, :] = jnp.where(c_idx == k, sel, piv_ref[:, :])
        # swap rows k and sel (masked writes; sel == k is a no-op)
        rowk = jnp.sum(jnp.where(r_idx == k, P, f0), axis=0,
                       keepdims=True)                        # (1, T)
        rowsel = jnp.sum(jnp.where(r_idx == sel, P, f0), axis=0,
                         keepdims=True)
        P = jnp.where(r_idx == k, rowsel, P)
        P = jnp.where((r_idx == sel) & (sel != k), rowk, P)
        # pivot value and the swapped column k; GESP threshold tiny pivots
        pv = jnp.sum(jnp.where(c_idx == k, rowsel, f0))
        pv = jnp.where(jnp.abs(pv) < tau,
                       jnp.where(pv < f0, -tau, tau), pv)
        P = jnp.where((c_idx == k) & (r_idx == k), pv, P)
        colv = jnp.sum(jnp.where(c_idx == k, P, f0), axis=1,
                       keepdims=True)
        colv = jnp.where(r_idx > k, colv / pv, f0)           # L multipliers
        rowv = jnp.where(c_idx > k, rowsel, f0)              # U row
        P = P - colv * rowv
        P = jnp.where((c_idx == k) & (r_idx > k), colv, P)
        pan_ref[:, :] = P
        return _

    # int32-typed bounds keep the induction variable int32 even under
    # jax_enable_x64: ANY in-kernel int64 (including a scalar int64->int32
    # convert) sends Mosaic's conversion lowering into infinite recursion
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("off", "interpret"))
def pallas_pivoted_panel(Pan, off: int, p_arr, tau=0.0,
                         interpret: bool = False):
    """Batched restricted-pivot panel LU — Pallas version of
    mf_jax._pivoted_panel. Pan (B, R, T) float32; p_arr (B,) true
    eliminated counts; tau the GESP pivot threshold. Returns (factored
    panel, piv (B, T) panel-relative pivot choices), bit-identical
    semantics to the XLA formulation."""
    B, R, T = Pan.shape
    # None squeezes the grid dim out of the in-kernel refs (a literal
    # `.at[0]` sub-ref index lowers as i64 under jax_enable_x64, which
    # Mosaic's 32-bit memref_slice rejects)
    pan_spec = pl.BlockSpec((None, R, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    # pivot choices come back as an (8, T) tile per front (Mosaic needs
    # sublane-aligned blocks); row 0 is the data, the copies are discarded
    piv_spec = pl.BlockSpec((None, 8, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec(memory_space=pltpu.SMEM)   # whole (B,) in SMEM
    tau_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # (1,) f32 in SMEM

    def kernel(p_ref, tau_ref, pan_in, pan_out, piv_ref):
        pan_out[:, :] = pan_in[:, :]
        piv_ref[:, :] = jnp.zeros((8, T), jnp.int32)
        _panel_body(p_ref[pl.program_id(0)] - jnp.int32(off),
                    tau_ref[0], pan_out, piv_ref, T=T)

    # trace the kernel with x64 OFF regardless of the session setting:
    # stray f64/i64 scalars (Python literals, loop indices) send Mosaic's
    # convert/memref lowering into recursion or legalization failures, and
    # nothing in this kernel needs 64-bit. The operands are 32-bit either
    # way, so the context only affects literals created inside the trace.
    with jax.enable_x64(False):
        out, piv = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[p_spec, tau_spec, pan_spec],
            out_specs=(pan_spec, piv_spec),
            out_shape=(jax.ShapeDtypeStruct((B, R, T), Pan.dtype),
                       jax.ShapeDtypeStruct((B, 8, T), jnp.int32)),
            interpret=interpret,
            # in+out panel blocks are double-buffered across grid steps:
            # 4 x (R*T*4) bytes; the default 16 MB scoped limit trips just
            # above R ~ 8k panels
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * R * T * T, transcendentals=0,
                bytes_accessed=2 * B * R * T * 4),
        )(p_arr.astype(jnp.int32),
          jnp.asarray(tau, jnp.float32).reshape(1), Pan)
    return out, piv[:, 0, :]


def panel_fits_vmem(R: int, T: int) -> bool:
    return R * T <= _MAX_R * 128


# --------------------------------------------------------------------------
# double-f32 (df64) pivoted panel — the production-precision panel kernel
# --------------------------------------------------------------------------
#
# The float64 factor path cannot use the f32 panel above, and the XLA
# fori_loop panel at emulated f64 dominated the gx3 f64 factor
# (profile_f64_rounds 2026-08-19: pf = 70.5 s of 197 s synced). Mosaic
# has no native f64 either — so the panel runs in DOUBLE-F32 arithmetic
# (Dekker/Knuth error-free transforms, ~2^-48 working precision): the
# f64 panel is split OUTSIDE into (hi, lo) f32 planes (hi = f32(x),
# lo = f32(x - hi), exact within f32's exponent range — guaranteed by
# Ruiz equilibration), the T sequential column steps run entirely in
# VMEM on f32 vectors, and the planes recombine to f64 outside.
#
# Accuracy: the panel's divisions and rank-1 updates carry ~2^-48
# relative error instead of f64's 2^-53 — against the measured element
# growth of these transport Jacobians (1e5-1e9) the raw apply error
# moves from ~1e-11 to ~1e-7..1e-9, which plain iterative refinement
# absorbs at one extra outer (solver/refine.py); the alternative (the
# XLA f64 panel) spent tens of seconds per factor on ~0.1% of the
# flops. Reference analog: dgstrf2's panel inside pdgstrf
# (SuperLU_brief_tree.txt:12-14), which runs native f64 on CPUs.
#
# Error-free transforms used (all plain f32 vector ops; correct under
# IEEE round-to-nearest, robust to fma contraction in the positions
# they appear):
#   two_sum(a,b)        -> (s, e)   s = fl(a+b), s+e = a+b exactly
#   quick_two_sum(a,b)  -> (s, e)   requires |a| >= |b|
#   two_prod(a,b)       -> (p, e)   p = fl(a*b), p+e = a*b exactly
#                                   (Veltkamp split, no fma needed)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _split_f32(a):
    c = jnp.float32(4097.0) * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df64_add(xh, xl, yh, yl):
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _quick_two_sum(s, e)


def _df64_mul(xh, xl, yh, yl):
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def _df64_panel_body(limit, tau, hi_ref, lo_ref, piv_ref, *, T: int):
    """Pivoted elimination of one (R, T) panel held as hi/lo f32 planes.
    Same pivot-selection/swap/GESP semantics as _panel_body; the divide
    and rank-1 update run in df64. Scoring and the tau threshold use the
    hi plane (a pivot CHOICE differing within f32 rounding is still a
    valid factorization; the threshold is an order-of-magnitude guard)."""
    R = hi_ref.shape[0]
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    f0 = jnp.float32(0.0)
    neg1 = jnp.float32(-1.0)
    Ri = jnp.int32(R)

    def step(k, _):
        H = hi_ref[:, :]
        L = lo_ref[:, :]
        ck = jnp.where(c_idx == k, H, f0)
        colk = jnp.sum(ck, axis=1, keepdims=True)             # (R, 1)
        ok = (r_idx >= k) & ((r_idx < limit) | (r_idx == k))
        score = jnp.where(ok, jnp.abs(colk), neg1)
        sel = jnp.min(jnp.where(score == jnp.max(score), r_idx, Ri))
        piv_ref[:, :] = jnp.where(c_idx == k, sel, piv_ref[:, :])
        # swap rows k and sel on BOTH planes
        rowk_h = jnp.sum(jnp.where(r_idx == k, H, f0), axis=0,
                         keepdims=True)
        rowk_l = jnp.sum(jnp.where(r_idx == k, L, f0), axis=0,
                         keepdims=True)
        rsel_h = jnp.sum(jnp.where(r_idx == sel, H, f0), axis=0,
                         keepdims=True)
        rsel_l = jnp.sum(jnp.where(r_idx == sel, L, f0), axis=0,
                         keepdims=True)
        swap_in = (r_idx == sel) & (sel != k)
        H = jnp.where(r_idx == k, rsel_h, H)
        H = jnp.where(swap_in, rowk_h, H)
        L = jnp.where(r_idx == k, rsel_l, L)
        L = jnp.where(swap_in, rowk_l, L)
        # pivot (df64 scalar as (1,1) planes); GESP threshold on hi
        pv_h = jnp.sum(jnp.where(c_idx == k, rsel_h, f0))
        pv_l = jnp.sum(jnp.where(c_idx == k, rsel_l, f0))
        small = jnp.abs(pv_h) < tau
        pv_h = jnp.where(small, jnp.where(pv_h < f0, -tau, tau), pv_h)
        pv_l = jnp.where(small, f0, pv_l)
        H = jnp.where((c_idx == k) & (r_idx == k), pv_h, H)
        L = jnp.where((c_idx == k) & (r_idx == k), pv_l, L)
        # L multipliers: col_k / pv in df64 (one Newton correction)
        cv_h = jnp.sum(jnp.where(c_idx == k, H, f0), axis=1, keepdims=True)
        cv_l = jnp.sum(jnp.where(c_idx == k, L, f0), axis=1, keepdims=True)
        q1 = cv_h / pv_h
        mh, ml = _df64_mul(q1, f0, pv_h, pv_l)                # q1 * pv
        rh, rl = _df64_add(cv_h, cv_l, -mh, -ml)              # remainder
        q2 = (rh + rl) / pv_h
        qh, ql = _quick_two_sum(q1, q2)
        below = r_idx > k
        qh = jnp.where(below, qh, f0)
        ql = jnp.where(below, ql, f0)
        # U row (entries right of k)
        right = c_idx > k
        uh = jnp.where(right, jnp.sum(jnp.where(r_idx == k, H, f0),
                                      axis=0, keepdims=True), f0)
        ul = jnp.where(right, jnp.sum(jnp.where(r_idx == k, L, f0),
                                      axis=0, keepdims=True), f0)
        # rank-1 update: P -= q * u  (df64)
        ph, pe = _df64_mul(qh, ql, uh, ul)
        H2, L2 = _df64_add(H, L, -ph, -pe)
        upd = below & right
        H = jnp.where(upd, H2, H)
        L = jnp.where(upd, L2, L)
        # write the multipliers into column k
        H = jnp.where((c_idx == k) & below, qh, H)
        L = jnp.where((c_idx == k) & below, ql, L)
        hi_ref[:, :] = H
        lo_ref[:, :] = L
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), step, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("off", "interpret"))
def pallas_pivoted_panel_df64(Pan_hi, Pan_lo, off: int, p_arr, tau=0.0,
                              interpret: bool = False):
    """Batched restricted-pivot panel LU in double-f32: hi/lo f32 planes
    (B, R, T) in and out, plus piv (B, T) — the production-precision
    (float64 path) replacement for the XLA _pivoted_panel loop. Semantics
    match mf_jax._pivoted_panel with the arithmetic at ~2^-48 instead of
    2^-53 (see the module note above)."""
    B, R, T = Pan_hi.shape
    pan_spec = pl.BlockSpec((None, R, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    piv_spec = pl.BlockSpec((None, 8, T), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tau_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def kernel(p_ref, tau_ref, hi_in, lo_in, hi_out, lo_out, piv_ref):
        hi_out[:, :] = hi_in[:, :]
        lo_out[:, :] = lo_in[:, :]
        piv_ref[:, :] = jnp.zeros((8, T), jnp.int32)
        _df64_panel_body(p_ref[pl.program_id(0)] - jnp.int32(off),
                         tau_ref[0], hi_out, lo_out, piv_ref, T=T)

    with jax.enable_x64(False):
        hi, lo, piv = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[p_spec, tau_spec, pan_spec, pan_spec],
            out_specs=(pan_spec, pan_spec, piv_spec),
            out_shape=(jax.ShapeDtypeStruct((B, R, T), jnp.float32),
                       jax.ShapeDtypeStruct((B, R, T), jnp.float32),
                       jax.ShapeDtypeStruct((B, 8, T), jnp.int32)),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 20 * B * R * T * T, transcendentals=0,
                bytes_accessed=4 * B * R * T * 4),
        )(p_arr.astype(jnp.int32),
          jnp.asarray(tau, jnp.float32).reshape(1), Pan_hi, Pan_lo)
    return hi, lo, piv[:, 0, :]


def panel_fits_vmem_df64(R: int, T: int) -> bool:
    # four (R, T) f32 blocks double-buffered: 8 * R * T * 4 bytes
    return R * T <= _MAX_R * 128 // 2


# --------------------------------------------------------------------------
# ELL front assembly
# --------------------------------------------------------------------------

def _ell_body(col_ref, val_ref, out_ref, *, W: int):
    """One (RT, N) output tile: out[r, n] = sum_w val[r, w] * (col[r, w]
    == n). The compare/select/accumulate runs entirely in VMEM — HBM sees
    one write of the tile and one read of the (RT, W) maps. The same
    expression as XLA ops makes the (B, N, W, N) broadcast an explicit
    ~100 GB fusion traffic (cost-analysis-verified); here it is W vector
    passes over a resident tile."""
    RT, N = out_ref.shape
    col = col_ref[:, :]                                     # (RT, W) i32
    val = val_ref[:, :]                                     # (RT, W) f32
    n_idx = jax.lax.broadcasted_iota(jnp.int32, (RT, N), 1)
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (RT, W), 1)
    f0 = jnp.float32(0.0)
    i0 = jnp.int32(0)
    acc = jnp.zeros((RT, N), jnp.float32)
    for w in range(W):
        wk = jnp.int32(w)
        cw = jnp.sum(jnp.where(w_idx == wk, col, i0), axis=1,
                     keepdims=True)                         # (RT, 1)
        vw = jnp.sum(jnp.where(w_idx == wk, val, f0), axis=1,
                     keepdims=True)
        acc = acc + jnp.where(n_idx == cw, vw, f0)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_ell_assemble(a_col, vals, interpret: bool = False):
    """Gather-form (ELLPACK) front assembly: a_col / vals (B, R, W) ->
    dense fronts (B, R, R). Row entries land at their front columns;
    padding entries carry col 0 / val 0.0 and contribute nothing.

    This is the TPU-native replacement for the assembly scatter
    (mf_jax._assemble's spill path): XLA:TPU serializes scatters, and
    leaf-round assembly was 31% of the gx3 steady factor even with
    unique+in-bounds promises."""
    B, R, W = a_col.shape
    N = R
    RT = 128 if R % 128 == 0 else R
    spec_in = pl.BlockSpec((None, RT, W), lambda b, t: (b, t, 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((None, RT, N), lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            functools.partial(_ell_body, W=W),
            grid=(B, R // RT),
            in_specs=[spec_in, spec_in],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((B, R, N), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * R * W * N, transcendentals=0,
                bytes_accessed=B * R * (N + 2 * W) * 4),
        )(a_col.astype(jnp.int32), vals.astype(jnp.float32))


def ell_fits_vmem(N: int, W: int) -> bool:
    RT = 128 if N % 128 == 0 else N
    # in/out blocks double-buffered: 2 * RT * (N + 2W) * 4 bytes
    return 2 * RT * (N + 2 * W) * 4 <= 12 * 1024 * 1024
