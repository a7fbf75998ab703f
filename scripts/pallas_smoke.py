"""On-chip Pallas kernel smoke test (VERDICT round-3 item 7).

Runs every real Mosaic-compiled kernel this framework ships on tiny
shapes on the ACTUAL attached TPU and cross-checks each against its
interpret-mode reference. Worker-crash-class Mosaic regressions (hit in
rounds 1 and 3: gather kernel faults, convert-lowering recursion) are
caught HERE, in ~1 min, instead of mid-way through a multi-hour
production factorization.

bench.py invokes this in a subprocess before timing anything and refuses
to run if a kernel is broken; the output names the failing kernel.

Exit 0 = all kernels OK. Exit 1 = mismatch (named). Exit 2 = backend is
not TPU (nothing to smoke). A worker fault shows up as a nonzero rc with
the kernel name already printed (each check prints BEFORE running).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)   # production session setting

    # honor an explicit CPU request: sitecustomize pre-imports jax pinned
    # to the axon TPU, so the env var alone would NOT switch backends and
    # this probe would block on a busy TPU tunnel during CPU-only runs
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    if jax.default_backend() != "tpu":
        print(f"pallas-smoke: backend={jax.default_backend()}, skipping",
              flush=True)
        return 2

    from nk_ocn_tracer_jacobian_precond_tpu.solver.pallas_kernels import (
        pallas_ell_assemble, pallas_pivoted_panel, pallas_pivoted_panel_df64)

    rng = np.random.default_rng(11)
    failures = []

    # --- batched restricted-pivot panel LU (dgstrf2 analog) -------------
    B, R, T = 4, 256, 128
    Pan = rng.standard_normal((B, R, T)).astype(np.float32)
    # identity padding beyond each front's true rows, like the real plans
    p_arr = np.array([128, 96, 128, 64], dtype=np.int32)
    print("pallas-smoke: pivoted_panel (compiled) ...", flush=True)
    out_c, piv_c = pallas_pivoted_panel(jnp.asarray(Pan), 0,
                                        jnp.asarray(p_arr), tau=1e-8)
    out_c, piv_c = np.asarray(out_c), np.asarray(piv_c)
    print("pallas-smoke: pivoted_panel (interpret) ...", flush=True)
    out_i, piv_i = pallas_pivoted_panel(jnp.asarray(Pan), 0,
                                        jnp.asarray(p_arr), tau=1e-8,
                                        interpret=True)
    out_i, piv_i = np.asarray(out_i), np.asarray(piv_i)
    if not np.array_equal(piv_c, piv_i):
        failures.append("pivoted_panel: pivot choices differ "
                        f"({int((piv_c != piv_i).sum())} of {piv_c.size})")
    err = np.max(np.abs(out_c - out_i))
    scale = max(1.0, float(np.max(np.abs(out_i))))
    if err > 1e-5 * scale:
        failures.append(f"pivoted_panel: values differ, max abs {err:.3e}")
    print(f"pallas-smoke: pivoted_panel ok (max abs diff {err:.1e})",
          flush=True)

    # --- double-f32 pivoted panel (the float64 path's panel kernel) -----
    A64 = rng.standard_normal((B, R, T))
    hi64 = jnp.asarray(A64.astype(np.float32))
    lo64 = jnp.asarray((A64 - np.asarray(hi64, np.float64))
                       .astype(np.float32))
    print("pallas-smoke: pivoted_panel_df64 (compiled) ...", flush=True)
    dh_c, dl_c, dpiv_c = pallas_pivoted_panel_df64(
        hi64, lo64, 0, jnp.asarray(p_arr), tau=1e-8)
    d_c = np.asarray(dh_c, np.float64) + np.asarray(dl_c, np.float64)
    dpiv_c = np.asarray(dpiv_c)
    print("pallas-smoke: pivoted_panel_df64 (interpret) ...", flush=True)
    dh_i, dl_i, dpiv_i = pallas_pivoted_panel_df64(
        hi64, lo64, 0, jnp.asarray(p_arr), tau=1e-8, interpret=True)
    d_i = np.asarray(dh_i, np.float64) + np.asarray(dl_i, np.float64)
    if not np.array_equal(dpiv_c, np.asarray(dpiv_i)):
        failures.append("pivoted_panel_df64: pivot choices differ "
                        f"({int((dpiv_c != np.asarray(dpiv_i)).sum())}"
                        f" of {dpiv_c.size})")
    err = np.max(np.abs(d_c - d_i))
    scale = max(1.0, float(np.max(np.abs(d_i))))
    if err > 1e-10 * scale:   # df64 working precision, not f32
        failures.append(f"pivoted_panel_df64: values differ, "
                        f"max abs {err:.3e}")
    print(f"pallas-smoke: pivoted_panel_df64 ok (max abs diff {err:.1e})",
          flush=True)

    # --- ELL gather-form front assembly ---------------------------------
    B, R, W = 3, 256, 18
    a_col = rng.integers(0, R, size=(B, R, W)).astype(np.int32)
    vals = rng.standard_normal((B, R, W)).astype(np.float32)
    a_col[:, :, -2:] = 0
    vals[:, :, -2:] = 0.0
    print("pallas-smoke: ell_assemble (compiled) ...", flush=True)
    F_c = np.asarray(pallas_ell_assemble(jnp.asarray(a_col),
                                         jnp.asarray(vals)))
    print("pallas-smoke: ell_assemble (interpret) ...", flush=True)
    F_i = np.asarray(pallas_ell_assemble(jnp.asarray(a_col),
                                         jnp.asarray(vals), interpret=True))
    err = np.max(np.abs(F_c - F_i))
    if err > 1e-6:
        failures.append(f"ell_assemble: values differ, max abs {err:.3e}")
    print(f"pallas-smoke: ell_assemble ok (max abs diff {err:.1e})",
          flush=True)

    # --- wave extend-add (the default f64-on-TPU Schur scatter) ---------
    # Not a Pallas kernel, but the same worker-crash risk class (gathers/
    # one-hot GEMMs at real shapes inside one program): compile + run the
    # wave branch of _extend_add on the chip and cross-check against the
    # numpy oracle. VERDICT round-4 item 7 — bench refuses to run when
    # the default extend-add path regresses.
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        _dst_gather_waves, _ea_chunk_len_waves, _extend_add)
    B, N, M, Sb, L = 16, 640, 512, 16, 21
    S_src = rng.standard_normal((Sb, M, M))
    S_src *= np.exp(rng.uniform(-10, 10, size=(Sb, M, M)))
    ss = rng.integers(0, Sb, size=L).astype(np.int32)
    ds = rng.integers(0, B, size=L).astype(np.int32)   # duplicates likely
    iv = rng.integers(0, M + 1, size=(L, N)).astype(np.int32)
    Lc = _ea_chunk_len_waves(N, M + 1)
    wl = _dst_gather_waves(ds, B, Lc)
    print(f"pallas-smoke: wave_extend_add (compiled, W={wl.shape[1]}) ...",
          flush=True)
    out = np.asarray(_extend_add(
        jnp.zeros((B, N, N), jnp.float64), jnp.asarray(S_src),
        jnp.asarray(ss), jnp.asarray(ds), jnp.asarray(iv),
        jnp.asarray(wl)))
    Spn = np.pad(S_src, ((0, 0), (0, 1), (0, 1)))
    ref = np.zeros((B, N, N))
    for l in range(L):
        ref[ds[l]] += Spn[ss[l]][iv[l]][:, iv[l]]
    scale = max(float(np.abs(ref).max()), 1.0)
    err = float(np.abs(out - ref).max()) / scale
    # pure selection — exact vs IEEE f64; XLA:TPU's EMULATED f64 adds are
    # ~1e-14-relative off IEEE (measured 2026-08-19), so tight tolerance
    if err > 1e-12:
        failures.append(f"wave_extend_add: values differ, max rel {err:.3e}")
    print(f"pallas-smoke: wave_extend_add ok (max rel diff {err:.1e})",
          flush=True)

    if failures:
        for f in failures:
            print(f"pallas-smoke FAIL: {f}", flush=True)
        return 1
    print("pallas-smoke: ALL KERNELS OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
