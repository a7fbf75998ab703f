"""Per-round, per-stage wall-clock profile of the float64 factor path.

Times each numeric-factorization stage (assemble / extend-add /
partial-factor) with a device sync between stages, per round, on the
real chip. The ~30-60 ms forced-round-trip tunnel noise per sync is
irrelevant against the ~51 s gx3 f64 steady factor this exists to
explain (VERDICT round-3 weak #1: 1.6e11 flops / 51 s = 0.3% of the
chip's measured emulated-f64 GEMM rate — something other than GEMM
throughput dominates, and this attributes it).

Usage: python scripts/profile_f64_rounds.py [size] [prec]
"""

import os
import sys
import time

os.environ.setdefault("NK_SOLVE_BS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "gx3"
    prec_s = sys.argv[2] if len(sys.argv) > 2 else "f64"

    import jax
    import jax.numpy as jnp

    if prec_s == "f64":
        jax.config.update("jax_enable_x64", True)
        prec = jnp.float64
    else:
        prec = jnp.float32
    print(f"backend: {jax.default_backend()} prec={prec_s}", flush=True)

    from bench import build_problem
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        load_symbolic, save_symbolic)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import equilibrate
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        JaxMultifrontal, _assemble, _extend_add)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    from nk_ocn_tracer_jacobian_precond_tpu.utils import set_dbg_lvl

    set_dbg_lvl(1)
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    matrix, maps = build_problem(size, cache)
    sym_ck = os.path.join(cache, f"sym_{size}.npz")
    if os.path.exists(sym_ck):
        sym = load_symbolic(sym_ck)
    else:
        sym = symbolic_from_matrix(maps, matrix, leaf_size=16)
        save_symbolic(sym_ck, sym)
    fac_matrix, dr, dc = equilibrate(matrix)

    eng = JaxMultifrontal(sym, fac_matrix, precision=prec, factorize=False)
    # warm-up: compiles everything (persistent cache)
    t0 = time.perf_counter()
    eng.refactor(fac_matrix)
    print(f"warm-up factor (compiles): {time.perf_counter()-t0:.1f}s",
          flush=True)
    eng.factors = None      # two resident factor sets OOM a 16 GB chip
    t0 = time.perf_counter()
    eng.refactor(fac_matrix)
    print(f"steady factor (reference): {time.perf_counter()-t0:.1f}s",
          flush=True)
    eng.factors = None

    # stage-timed replica of the round loop (single-device, no ckpt)
    nz = np.zeros(len(fac_matrix.nzval) + 1, dtype=eng.prec)
    nz[:-1] = fac_matrix.nzval
    nzval_ext = eng._put(nz, None)
    consts = eng._consts
    tot = dict(asm=0.0, ea=0.0, pf=0.0)
    schur = [None] * len(eng.plans)
    uses = [0] * len(eng.plans)
    for plan in eng.plans:
        for g in plan.child_groups:
            uses[g.src_round] += 1

    def sync(x):
        jax.block_until_ready(x)
        # remote-tunnel backends defer execution to a D2H read
        jnp.asarray(x[0] if isinstance(x, tuple) else x).ravel()[0].block_until_ready()

    t_all = time.perf_counter()
    for rnd, plan in enumerate(eng.plans):
        cc = consts[rnd]
        t0 = time.perf_counter()
        F = _assemble(nzval_ext, cc["a_col"], cc["a_csrc"],
                      cc["a_pos"], cc["a_src"], cc["p_arr"],
                      N=plan.N, P=plan.P, spill=cc["spill"],
                      impl=cc["asm_impl"])
        sync(F)
        t_asm = time.perf_counter() - t0
        t_ea = 0.0
        for gi, g in enumerate(plan.child_groups):
            _, ss, ds, inv, wl = cc["groups"][gi]
            t0 = time.perf_counter()
            F = _extend_add(F, schur[g.src_round], ss, ds, inv, wl)
            sync(F)
            t_ea += time.perf_counter() - t0
            uses[g.src_round] -= 1
            if uses[g.src_round] == 0:
                schur[g.src_round] = None
        t0 = time.perf_counter()
        K, U12, L21, S, perm = eng._partial_factor_dispatch_round(
            plan, F, cc["p_arr"])
        sync((K, U12, L21, S))
        t_pf = time.perf_counter() - t0
        schur[rnd] = S
        tot["asm"] += t_asm
        tot["ea"] += t_ea
        tot["pf"] += t_pf
        print(f"round {rnd+1:2d}/{len(eng.plans)} B={plan.B:4d} "
              f"P={plan.P:5d} N={plan.N:5d} nchild={len(plan.child_groups)}"
              f"  asm {t_asm:6.2f}s  ea {t_ea:6.2f}s  pf {t_pf:6.2f}s",
              flush=True)
    print(f"TOTAL {time.perf_counter()-t_all:.1f}s  "
          f"asm {tot['asm']:.1f}s  ea {tot['ea']:.1f}s  pf {tot['pf']:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
