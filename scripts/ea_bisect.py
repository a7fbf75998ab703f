"""Minimize the NK_EA_WAVES TPU worker fault (VERDICT round-3 item 2).

The exact-selection f32-pair wave extend-add (solver/mf_jax.py:506-547)
crashed the TPU worker 3x at gx3-class shapes in round 3 and was gated
behind NK_EA_WAVES=1. This probe bisects WHICH kernel faults: it pulls
the real per-round extend-add shapes from the gx3 (or given size) plan,
then runs each stage of the wave formulation in an isolated SUBPROCESS
per (stage, shape) with synthetic data, so a worker fault is attributed
to one stage at one shape instead of killing a 50 s factor run.

Stages (mirroring mf_jax._extend_add's f64_tpu+wlinks branch):
  1 slot+row gather        rows = vmap(g[i])(Sp[ss], iv)          (f64)
  2 hi/lo split + sel GEMM ah/al = f32 batched (Lc,N,Mp1)@(Lc,Mp1,N)
  3 concat+reshape         [ah; zrow] -> (Lc+1, N*N)
  4 wave dst GEMM          d1h(B,Lc+1) @ ah chunks + F add
  5 full _extend_add       the real jitted function, donated F

Usage:
  python scripts/ea_bisect.py --shapes [size]       # dump shape classes
  python scripts/ea_bisect.py --run [size]          # orchestrate bisect
  python scripts/ea_bisect.py --stage N B N_ Mp1 L W  # one stage (child)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def plan_shapes(size: str):
    """Host-only: per-round extend-add shape classes of the real plan."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import build_problem
    from nk_ocn_tracer_jacobian_precond_tpu.grid.indmap import load_ind_maps
    from nk_ocn_tracer_jacobian_precond_tpu.solver.checkpoint import (
        load_symbolic, save_symbolic)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        _ea_chunk_len_waves, _dst_gather_waves, build_plan)
    from nk_ocn_tracer_jacobian_precond_tpu.solver.symbolic import (
        symbolic_from_matrix)
    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache")
    matrix, maps = build_problem(size, cache)
    sym_ck = os.path.join(cache, f"sym_{size}.npz")
    if os.path.exists(sym_ck):
        sym = load_symbolic(sym_ck)
    else:
        sym = symbolic_from_matrix(maps, matrix, leaf_size=16)
        save_symbolic(sym_ck, sym)
    plans = build_plan(sym, matrix)
    shapes = []
    for rnd, p in enumerate(plans):
        for g in p.child_groups:
            Mp1 = plans[g.src_round].M + 1
            L = len(g.dst_slots)
            Lc = _ea_chunk_len_waves(p.N, Mp1)
            wl = _dst_gather_waves(g.dst_slots, p.B, Lc)
            shapes.append(dict(rnd=rnd, B=int(p.B), N=int(p.N),
                               Mp1=int(Mp1), L=int(L), Lc=int(Lc),
                               W=int(wl.shape[1]),
                               Sb=int(plans[g.src_round].B)))
    return shapes


def run_stage(stage: int, B: int, N: int, Mp1: int, L: int, W: int,
              Sb: int) -> None:
    """Child process: one stage at one shape on the real TPU."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    assert jax.default_backend() == "tpu", jax.default_backend()
    from nk_ocn_tracer_jacobian_precond_tpu.solver.mf_jax import (
        _ea_chunk_len_waves, _dst_gather_waves, _extend_add, _mm_raw)

    rng = np.random.default_rng(0)
    Lc = _ea_chunk_len_waves(N, Mp1)
    Lc_eff = min(Lc, L)
    ss = (np.arange(L, dtype=np.int64) * 2654435761 % Sb).astype(np.int32)
    # dst pattern forcing exactly W duplicate waves per chunk: cycle dst
    # values with period ceil(chunk_len / W) so each dst repeats <= W
    # times within a chunk (matches the real plan's wave width)
    cyc = max(1, min(B, -(-Lc_eff // max(1, W))))
    ds = np.empty(L, dtype=np.int32)
    for lo in range(0, L, Lc):
        n = min(Lc, L - lo)
        ds[lo:lo + n] = np.arange(n, dtype=np.int32) % cyc
    iv = ((np.arange(L, dtype=np.int64)[:, None] * 40503
           + np.arange(N, dtype=np.int64)[None, :] * 69069)
          % Mp1).astype(np.int32)
    # cheap non-RNG values with non-representable-in-f32 mantissas (the
    # hi/lo split must reassemble them exactly); RNG datagen at (Sb,
    # 512, 512) f64 was minutes of contended host time per class
    M0 = Mp1 - 1
    S_src = (np.arange(Sb)[:, None, None] * 0.123456789
             + np.arange(M0)[None, :, None] * 1.9999999991e-3
             + np.arange(M0)[None, None, :] * 7.77777777e-7)
    wl = _dst_gather_waves(ds, B, Lc)
    print(f"synthetic waves={wl.shape[1]} (plan W={W})", flush=True)

    if stage == 5:
        F = jnp.zeros((B, N, N), jnp.float64)
        out = _extend_add(F, jnp.asarray(S_src), jnp.asarray(ss),
                          jnp.asarray(ds), jnp.asarray(iv), jnp.asarray(wl))
        out = np.asarray(out)
        # every step of the wave path is pure selection, so against IEEE
        # f64 the result is BIT-EQUAL (proven on CPU by
        # tests/test_extend_add.py). XLA:TPU's EMULATED f64 is not
        # bit-identical IEEE (measured 2026-08-19: max abs 4.8e-13 on
        # O(50) values, ~1e-14 relative, from the emulated adds) — on
        # chip this check is a tight tolerance, not bit equality.
        Spn = np.pad(S_src, ((0, 0), (0, 1), (0, 1)))
        ref = np.zeros((B, N, N))
        for l in range(L):
            ref[ds[l]] += Spn[ss[l]][iv[l]][:, iv[l]]
        scale = max(np.abs(ref).max(), 1.0)
        err = np.abs(out - ref).max() / scale
        if err > 1e-12:
            print(f"stage5 VALUE MISMATCH: max rel {err:.3e}", flush=True)
            raise SystemExit(3)
        print(f"stage5 ok max_rel={err:.3e} sum={float(out.sum()):.3e}",
              flush=True)
        return

    Sp = jnp.pad(jnp.asarray(S_src), ((0, 0), (0, 1), (0, 1)))
    iv0 = jnp.asarray(iv[:Lc_eff])
    ss0 = jnp.asarray(ss[:Lc_eff])

    @jax.jit
    def st1(Sp, ss0, iv0):
        G = Sp[ss0]
        return jax.vmap(lambda g, i: g[i])(G, iv0)

    rows = st1(Sp, ss0, iv0)
    rows.block_until_ready()
    print(f"stage1 ok {rows.shape}", flush=True)
    if stage == 1:
        return

    @jax.jit
    def st2(rows, iv0):
        oh_t = jnp.swapaxes(
            (iv0[:, :, None] == jnp.arange(Mp1)[None, None, :]
             ).astype(jnp.float32), 1, 2)
        rh = rows.astype(jnp.float32)
        rl = (rows - rh.astype(jnp.float64)).astype(jnp.float32)
        return _mm_raw(rh, oh_t), _mm_raw(rl, oh_t)

    ah, al = st2(rows, iv0)
    ah.block_until_ready()
    print(f"stage2 ok {ah.shape}", flush=True)
    if stage == 2:
        return

    @jax.jit
    def st3(ah, al):
        zrow = jnp.zeros((1, N, N), jnp.float32)
        a = jnp.concatenate([ah, zrow], axis=0).reshape(-1, N * N)
        b = jnp.concatenate([al, zrow], axis=0).reshape(-1, N * N)
        return a, b

    a2, b2 = st3(ah, al)
    a2.block_until_ready()
    print(f"stage3 ok {a2.shape}", flush=True)
    if stage == 3:
        return

    wl0 = jnp.asarray(wl[0])
    NN = N * N
    CH = 1 << 21

    @jax.jit
    def st4(F, a2, b2, wl0):
        for w in range(wl0.shape[0]):
            d1h = (wl0[w][:, None]
                   == jnp.arange(a2.shape[0])[None, :]).astype(jnp.float32)
            parts = []
            for co in range(0, NN, CH):
                ce = min(co + CH, NN)
                uh = _mm_raw(d1h[None], a2[None, :, co:ce])[0]
                ul = _mm_raw(d1h[None], b2[None, :, co:ce])[0]
                parts.append(uh.astype(jnp.float64)
                             + ul.astype(jnp.float64))
            upd = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=1)
            F = F + upd.reshape(F.shape)
        return F

    F = st4(jnp.zeros((B, N, N), jnp.float64), a2, b2, wl0)
    F.block_until_ready()
    print(f"stage4 ok sum={float(F.sum()):.3e}", flush=True)


def run_all5(classes) -> None:
    """Child: stage 5 (the full wave _extend_add) for EVERY class in one
    process, largest first — one jax init + one persistent-cache warm
    pass instead of 21. A worker fault kills this child; the orchestrator
    reads the last OK line to know which class faulted and falls back to
    the per-class bisect from there."""
    for i, s in enumerate(classes):
        print(f"all5 {i + 1}/{len(classes)}: B={s['B']} N={s['N']} "
              f"Mp1={s['Mp1']} L={s['L']} W={s['W']}", flush=True)
        run_stage(5, s["B"], s["N"], s["Mp1"], s["L"], s["W"], s["Sb"])
        print(f"all5 {i + 1} OK", flush=True)


def _classes(size: str):
    shapes = plan_shapes(size)
    # dedupe into classes, largest output first
    seen = {}
    for s in shapes:
        key = (s["B"], s["N"], s["Mp1"], min(s["L"], 10 ** 9), s["W"])
        seen.setdefault(key, s)
    classes = sorted(seen.values(),
                     key=lambda s: -(s["B"] * s["N"] * s["N"]))
    print(f"{len(shapes)} group instances -> {len(classes)} shape classes",
          flush=True)
    return classes


def orchestrate(size: str) -> int:
    classes = _classes(size)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.nk_tpu_jax_cache"))
    # fast path: every class's full formulation in ONE child
    import json as _json
    cmd = [sys.executable, __file__, "--all5", size]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200,
                       env=env, input=_json.dumps(classes))
    sys.stdout.write(r.stdout)
    if r.returncode == 0:
        print(_json.dumps(dict(classes=len(classes), failures=[],
                               mode="all5")), flush=True)
        return 0
    n_ok = r.stdout.count(" OK")
    print(f"all5 child rc={r.returncode} after {n_ok}/{len(classes)} "
          f"classes; stderr tail: {r.stderr[-400:]!r}", flush=True)
    print("falling back to per-class bisect from the faulting class",
          flush=True)
    classes = classes[n_ok:]
    # children get the persistent compile cache (the engine sets it in
    # JaxMultifrontal.__init__, which bisect children never construct)
    # and one retry on failure: the remote-compile RPC flakes
    # ("response body closed before all bytes were read", measured
    # 2026-08-20) would otherwise read as kernel faults
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.nk_tpu_jax_cache"))
    results = []
    for s in classes:
        for stage in (5, 4, 3, 2, 1):
            cmd = [sys.executable, __file__, "--stage", str(stage),
                   str(s["B"]), str(s["N"]), str(s["Mp1"]), str(s["L"]),
                   str(s["W"]), str(s["Sb"])]
            for attempt in range(2):
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=1200, env=env)
                if r.returncode == 0:
                    break
                print(f"  retry (attempt {attempt + 1} rc={r.returncode}) "
                      f"err tail: {r.stderr[-160:]!r}", flush=True)
            ok = r.returncode == 0
            tag = (f"B={s['B']} N={s['N']} Mp1={s['Mp1']} L={s['L']} "
                   f"W={s['W']} stage={stage}")
            print(f"{'OK  ' if ok else 'FAIL'} {tag}"
                  + ("" if ok else f" rc={r.returncode} "
                     f"tail={r.stdout[-200:]!r} err={r.stderr[-300:]!r}"),
                  flush=True)
            results.append(dict(**s, stage=stage, ok=ok, rc=r.returncode))
            if ok and stage == 5:
                break   # whole formulation fine at this shape; next shape
        else:
            continue
    bad = [r for r in results if not r["ok"]]
    print(json.dumps(dict(classes=len(classes), failures=bad), indent=1),
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    if sys.argv[1] == "--shapes":
        for s in plan_shapes(sys.argv[2] if len(sys.argv) > 2 else "gx3"):
            print(s)
    elif sys.argv[1] == "--stage":
        run_stage(*[int(x) for x in sys.argv[2:9]])
    elif sys.argv[1] == "--all5":
        run_all5(json.loads(sys.stdin.read()))
    elif sys.argv[1] == "--run":
        raise SystemExit(
            orchestrate(sys.argv[2] if len(sys.argv) > 2 else "gx3"))
