"""Probe: the exact f32-pair WAVE extend-add on the real chip, float64.

Round 3 gated this formulation off (NK_EA_WAVES opt-in) after three TPU
worker faults at gx3-class shapes; the default f64-on-TPU extend-add is
the proven-but-slow chunked-f64 one-hot GEMM, which dominates the ~50 s
f64 gx3 factor (the same round's fp32 program runs in 1.9 s, and
emulated-f64 GEMM itself is only ~2.8x fp32 — the gap is overhead, not
arithmetic). Host/runtime versions change between driver rounds, so this
probe re-tests the wave path end to end: steady factor time + a raw
solve residual identical (to refinement noise) to the default path.

Run: python scripts/f64_ea_probe.py [size]    (default gx3)
Env: NK_EA_WAVES is set HERE (=1); compare against a run without it.
"""

import os
import sys
import time

os.environ.setdefault("NK_EA_WAVES", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "gx3"
    import jax
    jax.config.update("jax_enable_x64", True)

    from bench import build_problem
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import (
        MultifrontalFactorization)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    from nk_ocn_tracer_jacobian_precond_tpu.utils import set_dbg_lvl

    set_dbg_lvl(1)
    # the wave gate (mf_jax._device_constants) requires backend==tpu AND
    # NK_EA_WAVES=1; on any other backend this probe would "pass" while
    # exercising only the default chunked path (advisor round-3 finding)
    if jax.default_backend() != "tpu":
        print(f"ABORT: backend={jax.default_backend()}, wave path needs "
              f"tpu", flush=True)
        return 2
    print(f"backend: {jax.default_backend()}", flush=True)
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    matrix, maps = build_problem(size, cache)
    print(f"{size}: flat_len={matrix.flat_len} nnz={matrix.nnz}", flush=True)

    t0 = time.perf_counter()
    sym = symbolic_from_matrix(maps, matrix, leaf_size=16)
    print(f"symbolic {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    fac = MultifrontalFactorization(matrix, impl="jax", maps=maps, sym=sym,
                                    refine_tol=1e-10, precision="f64")
    print(f"cold factor {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    fac.refactor()
    t_steady = time.perf_counter() - t0
    print(f"steady factor {t_steady:.2f}s (waves={os.environ['NK_EA_WAVES']})",
          flush=True)

    rng = np.random.default_rng(0)
    B = rng.standard_normal((matrix.flat_len, 4))
    A = matrix.to_scipy()
    # RAW preconditioner apply (refine=False): this is what measures the
    # extend-add's accuracy — a refined residual only measures that
    # GMRES-IR converged (advisor round-3 finding). The wave path is a
    # bit-exact selection, so raw must match the default path's class.
    t0 = time.perf_counter()
    X_raw = fac.solve(B, refine=False)
    t_raw = time.perf_counter() - t0
    rel_raw = np.max(np.linalg.norm(A @ X_raw - B, axis=0)
                     / np.linalg.norm(B, axis=0))
    t0 = time.perf_counter()
    X = fac.solve(B)
    t0b = time.perf_counter() - t0
    t0 = time.perf_counter()
    X = fac.solve(B)
    t_solve = time.perf_counter() - t0
    rel = np.max(np.linalg.norm(A @ X - B, axis=0) / np.linalg.norm(B, axis=0))
    print(f"solve cold {t0b:.2f}s steady {t_solve:.2f}s max_rel {rel:.3e} "
          f"raw {rel_raw:.3e} ({t_raw:.2f}s)", flush=True)
    waves_eff = os.environ.get("NK_EA_WAVES")   # the gate actually seen
    print(f"RESULT size={size} waves={waves_eff} "
          f"steady_factor={t_steady:.2f} solve={t_solve:.2f} "
          f"rel={rel:.3e} raw={rel_raw:.3e} ok={rel <= 1e-10}", flush=True)
    return 0 if rel <= 1e-10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
