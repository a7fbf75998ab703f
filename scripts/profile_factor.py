"""Per-kernel wall-clock profile of the factor + solve path on the real
chip: times every chunk's assemble / extend-add / partial-factor
dispatch separately (block_until_ready between steps), then the solve
and one refinement cycle. Output: ranked cost table — the optimization
worklist for the steady-state Newton iteration.

Run (uses the real TPU):  python scripts/profile_factor.py [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "gx3"
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import (
        read_matrix_file)
    from nk_ocn_tracer_jacobian_precond_tpu.solver import mf_jax
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
        MultifrontalFactorization)

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    mat = os.path.join(cache, f"matrix_{size}.nc")
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps,
                                    refine_tol=1e-11)
    eng = fac.engine

    # instrumented refactor: separate blocking timings per kernel class.
    # Drop the facade's factor set first — holding it while re-running
    # every phase doubles residency (float64 gx3 OOM'd here)
    eng.factors = None
    import gc
    gc.collect()
    nz = np.zeros(len(fac._fac_matrix.nzval) + 1, dtype=eng.prec)
    nz[:-1] = fac._fac_matrix.nzval
    nzval_ext = eng._put(nz, None)
    stats = {}

    def bench(name, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        stats.setdefault(name, 0.0)
        stats[name] += time.perf_counter() - t0
        return out

    with jax.default_matmul_precision("highest"):
        # warm-up pass (compiled already via __init__, but prime caches)
        schur = [None] * len(eng.plans)
        for rnd, plan in enumerate(eng.plans):
            cc = eng._consts[rnd]
            F = bench(f"assemble N={plan.N}", mf_jax._assemble, nzval_ext,
                      cc["a_col"], cc["a_csrc"], cc["a_pos"], cc["a_src"],
                      cc["p_arr"], N=plan.N, P=plan.P, spill=cc["spill"],
                      impl=cc["asm_impl"])
            for gi, g in enumerate(plan.child_groups):
                _, ss, ds, inv, wl = cc["groups"][gi]
                F = bench(f"extend N={plan.N}", mf_jax._extend_add,
                          F, schur[g.src_round], ss, ds, inv, wl)
            K, U12, L21, S, perm = bench(
                f"factor B={plan.B} P={plan.P} N={plan.N}",
                mf_jax._partial_factor, F, P=plan.P, p_arr=cc["p_arr"],
                tau=eng._tau, use_pallas=eng._use_pallas,
                allow_native_lu=True, pack_bs=eng._pack_bs)
            schur[rnd] = S
        total = sum(stats.values())
        print(f"# factor instrumented total {total:.3f}s "
              f"(steady, blocking per kernel)")
        for name, t in sorted(stats.items(), key=lambda kv: -kv[1]):
            print(f"  {t:7.3f}s  {100*t/total:5.1f}%  {name}")

        # solve + one refinement cycle timing
        rng = np.random.default_rng(0)
        B = rng.standard_normal((matrix.flat_len, 4))
        X = fac.solve(B)            # warm (compiles handled in __init__? no: solve jits here)
        t0 = time.perf_counter()
        X = fac.solve(B)
        print(f"# full refined solve (4 rhs): {time.perf_counter()-t0:.3f}s")
        rel = np.linalg.norm(fac.A @ X - B, axis=0) / np.linalg.norm(B, axis=0)
        print(f"# residuals {rel}")


if __name__ == "__main__":
    raise SystemExit(main())
