"""gx1 (1-degree, 320x384x60) out-of-core float64 solve.

The production factor set (~88 GB trimmed float64, ~144 GB padded)
exceeds this host's 125 GB RAM as an in-memory array set, exactly as it
exceeds one rank in the reference (144 MPI ranks,
test/test_solve_ABglobal.csh:6-7). The factor pass
(scripts/chip_factor_only.py, NK_RUN_PREC=f64) streams per-round v3
trimmed checkpoints to disk; this script solves from them out-of-core:
each preconditioner application walks the round files forward then
backward, holding ONE round's factors in memory at a time
(solver/stream_solve.py), with exact float64 residual refinement.

Run: python scripts/gx1_stream_solve.py   (env: NK_RUN_SIZE, NK_RUN_CKPT)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    # host-only: the factors stream through numpy; keep jax off the chip
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import (
        read_matrix_file)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        load_symbolic, save_symbolic)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.stream_solve import (
        stream_solve)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    from nk_ocn_tracer_jacobian_precond_tpu.utils import set_dbg_lvl

    set_dbg_lvl(1)
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    size = os.environ.get("NK_RUN_SIZE", "gx1")
    ckpt_dir = os.environ.get("NK_RUN_CKPT",
                              os.path.join(cache, f"fckpt_{size}"))
    t0 = time.perf_counter()
    mat = os.path.join(cache, f"matrix_{size}.nc")
    matrix = read_matrix_file(mat)
    maps = load_ind_maps(mat)
    print(f"load {time.perf_counter()-t0:.1f}s flat_len={matrix.flat_len} "
          f"nnz={matrix.nnz}", flush=True)

    sym_ck = os.path.join(cache, f"sym_{size}.npz")
    t0 = time.perf_counter()
    if os.path.exists(sym_ck):
        sym = load_symbolic(sym_ck)
    else:
        sym = symbolic_from_matrix(maps, matrix, leaf_size=16)
        save_symbolic(sym_ck, sym)
    print(f"symbolic {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    nrhs = int(os.environ.get("NK_NRHS", "4"))
    B = rng.standard_normal((matrix.flat_len, nrhs))
    t0 = time.perf_counter()
    # target the production contract (1e-10), not 1e-11: the residual
    # plateaus at ~5e-11 at gx1, and refinement outers past the contract
    # bought nothing for ~1,500 s of disk walking (round-4 finding,
    # BENCH_NOTES gx1 section; VERDICT round-4 item 5)
    X, rel = stream_solve(matrix, maps, sym, ckpt_dir, B,
                          pack_bs=int(os.environ.get("NK_SOLVE_BS", "128")),
                          refine_tol=float(os.environ.get(
                              "NK_REFINE_TOL", "1e-10")))
    t_solve = time.perf_counter() - t0
    ok = bool(rel.max() <= 1e-10)
    print(f"{size} stream-solve: ok={ok} max_rel={rel.max():.3e} "
          f"residuals={rel} wall={t_solve:.1f}s", flush=True)

    # machine-readable result artifact (VERDICT round-3 item 1): factor
    # wall-clock is the mtime span of the round checkpoint files (the
    # factor pass may span several resumed attempts)
    import glob
    import json
    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "round_*.npz")))
    factor_span = (os.path.getmtime(rounds[-1]) - os.path.getmtime(rounds[0])
                   if len(rounds) > 1 else 0.0)
    ckpt_bytes = sum(os.path.getsize(f) for f in glob.glob(
        os.path.join(ckpt_dir, "round_*")))
    result = {
        "problem": size,
        "flat_len": int(matrix.flat_len),
        "nnz": int(matrix.nnz),
        "precision": "float64",
        "nrhs": nrhs,
        "ok": ok,
        "max_rel_residual": float(rel.max()),
        "rel_residuals": [float(r) for r in rel],
        "residual_contract": 1e-10,
        "stream_solve_wall_s": round(t_solve, 1),
        "factor_rounds": len(rounds),
        "factor_wall_span_s": round(factor_span, 1),
        "factor_ckpt_bytes": int(ckpt_bytes),
        "reference_equivalent": ("144-rank SuperLU_DIST dgssvx, "
                                 "test/test_solve_ABglobal.csh:6-7,31-32"),
    }
    out = os.path.join(cache, f"{size}_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"result artifact: {out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
