"""Micro-profile of the f64 partial-factor internals on the real chip.

profile_f64_rounds.py attributes the gx3 f64 factor to asm/ea/pf; this
drills into pf: at the hot round shapes, time (a) the sequential pivoted
panel loop, (b) the TRSMs, (c) the trailing-update GEMM (_mm), each as
its own jitted program, in f64 and f32. The ratio decides which of
VERDICT round-3 items 3 (double-f32 GEMMs) and 4 (production-precision
Pallas panel) buys the pf seconds.

Usage: python scripts/profile_pf_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (B, P, N) of the pf-heavy gx3 f64 rounds (profile_f64_rounds 2026-08-19:
# rounds 1, 2, 5, 8, 11 = 8.9 + 6.0 + 15.2 + 13.1 + 12.3 of 70.5 s)
SHAPES = [(256, 512, 1024), (384, 256, 512), (128, 512, 1280),
          (16, 640, 2176), (2, 1664, 3072)]


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    from jax.lax.linalg import triangular_solve
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        PANEL, _mm, _mm_oz, _pack_diag_inv, _pivoted_panel)

    def bench(fn, *args, n=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)
    for B, P, N in SHAPES:
        nb = (P + PANEL - 1) // PANEL
        for dt in (jnp.float64, jnp.float32):
            Fh = rng.standard_normal((B, N, N))
            F = jnp.asarray(Fh, dt)
            p_arr = jnp.full((B,), P, jnp.int32)

            # (a) panel loop alone: nb sequential pivoted panels
            @jax.jit
            def panels(F, p_arr):
                outs = []
                for t in range(nb):
                    off = t * PANEL
                    T = min(PANEL, P - off)
                    R = P - off
                    Pan = jax.lax.dynamic_slice(F, (0, off, off), (B, R, T))
                    Pan, piv = _pivoted_panel(Pan, off, p_arr, tau=1e-8)
                    outs.append((Pan.sum(), piv.sum()))
                return outs

            t_pan = bench(panels, F, p_arr)

            # (b) TRSMs: one per panel against the full trailing width
            @jax.jit
            def trsms(F):
                outs = []
                for t in range(nb):
                    off = t * PANEL
                    T = min(PANEL, P - off)
                    D = jax.lax.dynamic_slice(F, (0, off, off), (B, T, T))
                    A12 = jax.lax.dynamic_slice(F, (0, off, off + T),
                                                (B, T, N - off - T))
                    outs.append(triangular_solve(
                        D, A12, left_side=True, lower=True,
                        unit_diagonal=True).sum())
                return outs

            t_trsm = bench(trsms, F)

            # (c)/(d) trailing updates: one program PER PANEL STEP — an
            # unrolled all-steps program materializes every step's
            # (B, rest, rest) partial as an HLO temp (21.7 GB compile OOM
            # at the first shape, 2026-08-20); the real factor runs these
            # as sequential per-step regions inside _partial_factor_body
            def step_shapes():
                for t in range(nb):
                    off = t * PANEL
                    T = min(PANEL, P - off)
                    rest = N - off - T
                    if rest > 0:
                        yield off, T, rest

            def bench_trailing(mm_fn, cast64):
                tot = 0.0
                for off, T, rest in step_shapes():
                    fn = jax.jit(lambda Lr, A12: mm_fn(Lr, A12).sum())
                    Lr = F[:, off + T:, off:off + T]
                    A12 = F[:, off:off + T, off + T:off + T + rest]
                    if cast64:
                        Lr = Lr.astype(jnp.float64)
                        A12 = A12.astype(jnp.float64)
                    tot += bench(fn, Lr, A12)
                return tot

            t_tr = bench_trailing(_mm, False)
            t_oz = (bench_trailing(_mm_oz, dt != jnp.float64)
                    if dt == jnp.float64 else 0.0)

            # (e) the solve-side pivot-block packing (full explicit
            # inverse at gx3's adaptive pack_bs = maxP)
            @jax.jit
            def pack(F):
                return _pack_diag_inv(F[:, :P, :P], P).sum()

            t_pack = bench(pack, F)
            flops = 2 * B * sum(
                (N - t * PANEL - min(PANEL, P - t * PANEL))
                * min(PANEL, P - t * PANEL)
                * (N - t * PANEL - min(PANEL, P - t * PANEL))
                for t in range(nb))
            print(f"B={B:4d} P={P:5d} N={N:5d} {np.dtype(dt).name:8s} "
                  f"panels {t_pan:7.3f}s  trsm {t_trsm:7.3f}s  "
                  f"trailing {t_tr:7.3f}s ({flops / max(t_tr, 1e-9) / 1e9:7.1f}"
                  f" GF/s)  oz {t_oz:7.3f}s "
                  f"({flops / max(t_oz, 1e-9) / 1e9:7.1f} GF/s)  "
                  f"pack {t_pack:7.3f}s", flush=True)


if __name__ == "__main__":
    main()
