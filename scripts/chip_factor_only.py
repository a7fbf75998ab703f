"""Factor-only continuation on the real TPU chip.

Runs (or resumes) the numeric factorization of a cached bench problem on
the single real TPU device with NK_FACTOR_ONLY: every completed round's
factors stream to the per-round checkpoint directory and are dropped from
HBM, so a 16 GB chip factors problems whose complete factor set is tens
of GB. The solve then runs elsewhere (the simulated multi-device mesh, or
any engine pointed at the same checkpoint dir).

This is the production split for the reference's 1-degree problem
(test/test_solve_ABglobal.csh:31-32): the tree-top rounds are big dense
GEMM chains — exactly what the MXU eats — while the leaf rounds and the
final distributed solve are batch/memory bound.

Env knobs:
    NK_RUN_SIZE    problem name (default gx1)
    NK_RUN_CKPT    checkpoint dir (default .bench_cache/fckpt_<size>)
    NK_MIN_RESUME  abort if fewer checkpointed rounds resume (plan or
                   hash mismatch guard; default 0)
    NK_RUN_PREC    factor precision, f32 (default) or f64 — the deep
                   production trees NEED f64: measured elimination growth
                   makes eps32 x growth O(1) and the float32 factor set
                   unusable as a preconditioner (round-3 gx1 solve
                   stalled at raw residual 1.1e4)
"""

import os
import sys
import time

# SOLVE_BS is read at solver-module import: 128 matches the mesh engines'
# pinned pack_bs so checkpoints interchange between this pass and the
# multi-device solve pass (see JaxMultifrontal._ckpt_for)
os.environ.setdefault("NK_SOLVE_BS", "128")
os.environ.setdefault("NK_FACTOR_ONLY", "1")
os.environ.setdefault("NK_FACTOR_OFFLOAD", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("NK_RUN_CPU") == "1":
        # the memory-bound repair/mid-tree configuration: run the SAME
        # factor-only pass on the host CPU (live Schur peaks exceed one
        # chip's HBM mid-tree; the host has the RAM), hand the tree-top
        # rounds to the chip via NK_FACTOR_STOP_AFTER
        jax.config.update("jax_platforms", "cpu")

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          flush=True)

    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.io.matrixfile import (
        read_matrix_file)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        load_symbolic, save_symbolic)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf import equilibrate
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        JaxMultifrontal)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    from nk_ocn_tracer_jacobian_precond_tpu.utils import set_dbg_lvl

    set_dbg_lvl(1)
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    size = os.environ.get("NK_RUN_SIZE", "gx1")
    ckpt_dir = os.environ.get("NK_RUN_CKPT",
                              os.path.join(cache, f"fckpt_{size}"))
    min_resume = int(os.environ.get("NK_MIN_RESUME", "0"))

    t0 = time.perf_counter()
    matrix = read_matrix_file(os.path.join(cache, f"matrix_{size}.nc"))
    maps = load_ind_maps(os.path.join(cache, f"matrix_{size}.nc"))
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

    # the same equilibration the solve pass applies (mf.py facade):
    # deterministic numpy, so the checkpoint value-hash matches exactly
    t0 = time.perf_counter()
    fac_matrix, dr, dc = equilibrate(matrix)
    print(f"equilibrate {time.perf_counter()-t0:.1f}s", flush=True)

    prec = jnp.float32
    if os.environ.get("NK_RUN_PREC", "f32").lower() in ("f64", "float64"):
        jax.config.update("jax_enable_x64", True)
        prec = jnp.float64
    t0 = time.perf_counter()
    eng = JaxMultifrontal(sym, fac_matrix, precision=prec,
                          checkpoint_dir=ckpt_dir, factorize=False,
                          factor_only=True)
    done = eng._scan_done(eng._ckpt_for(fac_matrix))
    n = len(eng.plans)
    print(f"plan {time.perf_counter()-t0:.1f}s: resuming {len(done)}/{n} "
          f"rounds from {ckpt_dir}", flush=True)
    if len(done) < min_resume:
        print(f"ABORT: expected >= {min_resume} resumable rounds "
              f"(plan/hash mismatch with the prior run?)", flush=True)
        return 2

    t0 = time.perf_counter()
    eng._factorize(fac_matrix)
    t_factor = time.perf_counter() - t0
    remaining = n - len(done)
    print(f"{size} factor-only: {remaining} rounds computed in "
          f"{t_factor:.1f}s ({len(done)} resumed); factors in {ckpt_dir}",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
