"""Mixed-precision refinement: FGMRES-IR3, fused device loop + exact
host polish.

The rebuild of SuperLU_DIST's iterative refinement (pdgsrfs*, reference
SuperLU_brief_tree.txt:20-24), upgraded for a float32 factorization: the
restricted-pivot LU suffers real element growth on these transport
matrices (measured ~1e7 at gx3, worse at 60 levels), so plain residual
correction stalls in float32. The repair is three-precision flexible
GMRES iterative refinement, staged by residual accuracy (round 2):

  * FUSED BULK (device, ONE dispatch per solve): up to max_cycles
    restarted-FGMRES correction cycles chained in a lax.while_loop with
    float64 device-side outer residuals between them (_make_fused) —
    float32 Krylov vectors, the float32 multifrontal solve as the
    preconditioner with its outputs STORED (flexible GMRES: the
    correction is the stored combination Z y, never a re-application —
    re-rounding M^-1(Vy) through float32 carries basis-cancellation-
    amplified noise), Givens-QR least squares (normal equations square
    kappa(H)). This contracts from O(1) down to the emulated-f64
    device-residual floor (~3e-10 at gx3deep) for ONE host<->device
    round trip — the per-outer transfer on a tunneled chip (~0.9 s) used
    to dominate the refinement.
  * POLISH (host-exact residuals, one single-cycle dispatch per outer):
    r = b - A x in exact float64 scipy SpMV; the same cycle fed an exact
    residual contracts ~2.3 digits (vs ~1.4 against device residuals),
    so 1-2 polish outers carry 3e-10 down to the true attainable floor
    (kappa_Skeel * eps64 — SuperLU's own refined residual sits there
    too: ~5e-12 at gx3, ~1.5e-11 at gx3deep).
  * Escalation: stalls far from target deepen the Krylov space
    (m: 4 -> 8 -> 16, memoized across solves of one factorization) and
    only then raise the Krylov precision to emulated float64.

All right-hand sides iterate together, batched; phase and depth are
memoized so Newton-loop re-solves skip the doomed plain-IR attempts.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import dbg, timed


def _giveup_threshold() -> float:
    """Raw preconditioner-apply error above which refinement is hopeless
    (the giveup branch in DeviceRefiner.solve). Read per solve, not at
    import, so NK_REFINE_GIVEUP works whenever it is set."""
    import os
    return float(os.environ.get("NK_REFINE_GIVEUP", "0.25"))


def _givens_lstsq(H, beta, m: int):
    """Batched min ||beta e1 - H y|| for the tiny Hessenberg H
    (m+1, m, nrhs) via Givens QR, unrolled (m is small and static).

    Normal equations square kappa(H) — and the Krylov basis of a
    float32-factor-preconditioned operator with 1e9-class element growth
    (60-level problems) is EXACTLY where kappa(H) is large; the Gram-
    matrix route put a hard ~5e-10 floor under the whole refinement.
    Givens QR is backward stable and costs nothing at this size.
    XLA:TPU has no f64 QR/LU custom call, so this is plain jnp ops."""
    nrhs = H.shape[-1]
    g = jnp.zeros((m + 1, nrhs), dtype=H.dtype)
    g = g.at[0].set(beta.astype(H.dtype))
    cs, sn = [], []
    for j in range(m):
        col = H[:, j, :]
        for i in range(j):
            a, b = col[i], col[i + 1]
            col = col.at[i].set(cs[i] * a + sn[i] * b)
            col = col.at[i + 1].set(-sn[i] * a + cs[i] * b)
        a, b = col[j], col[j + 1]
        r = jnp.sqrt(a * a + b * b)
        ok = r > 0
        rs = jnp.where(ok, r, 1.0)
        c = jnp.where(ok, a / rs, 1.0)
        s = jnp.where(ok, b / rs, 0.0)
        cs.append(c)
        sn.append(s)
        col = col.at[j].set(r).at[j + 1].set(0.0)
        H = H.at[:, j, :].set(col)
        ga, gb = g[j], g[j + 1]
        g = g.at[j].set(c * ga + s * gb)
        g = g.at[j + 1].set(-s * ga + c * gb)
    # back substitution on the upper-triangular R = H[:m, :m]
    y = jnp.zeros((m, nrhs), dtype=H.dtype)
    for j in range(m - 1, -1, -1):
        acc = g[j]
        for k in range(j + 1, m):
            acc = acc - H[j, k, :] * y[k]
        d = H[j, j, :]
        ok = jnp.abs(d) > 0
        y = y.at[j].set(jnp.where(ok, acc / jnp.where(ok, d, 1.0), 0.0))
    return y                                             # (m, nrhs)


class DeviceRefiner:
    """GMRES-IR3 driven from the host, with the whole inner Krylov
    correction batched on device.

    Structure (the standard three-precision refinement):
      * OUTER loop (host, exact float64): r = b - A x via scipy SpMV
        (13 ms at gx3 — exactness is what matters, the device's emulated
        f64 left a ~1e-10 attainable-residual floor and cycle-to-cycle
        bounce when the outer residual lived on device);
      * INNER correction (device, ONE dispatch): batched restarted GMRES
        solving A d = r a few digits, float64 Krylov vectors, float32
        multifrontal preconditioner.
    Plain refinement (inner = one preconditioner apply) is tried first —
    it is the reference's pdgsrfs — and GMRES kicks in when element
    growth stalls it.

    Requires jax_enable_x64 for the device-side float64 Krylov vectors.
    """

    def __init__(self, engine, matrix, dr=None, dc=None,
                 tol: float = 1e-12, m: int = 16, m_start: int = 4,
                 max_cycles: int = 10, precond_host=None):
        if not jax.config.jax_enable_x64:
            raise RuntimeError("DeviceRefiner needs jax_enable_x64 "
                               "(float64 residual accumulation)")
        self.engine = engine
        self.precond_host = precond_host
        self.tol = tol
        # adaptive inner depth: each f32 cycle's contraction is limited by
        # the preconditioned rounding floor, not by Krylov dimension —
        # measured at gx3, m=4 contracts the same ~3 digits per cycle as
        # m=32 at a fraction of the device work. Start small, double (up
        # to the cap `m`) when a cycle gains under ~1.5 digits; the tier
        # is memoized across solves of the same factorization.
        self.m = m
        self._m = min(m_start, m)
        self.max_cycles = max_cycles
        self.n = matrix.flat_len
        self._rowptr = np.asarray(matrix.rowptr)
        self._bind_matrix(matrix, dr, dc)
        self._cycle_jit = {}
        self._fused_jit = {}

    def _bind_matrix(self, matrix, dr=None, dc=None) -> None:
        """Stage the matrix-value-dependent device arrays (ELL SpMV
        operands, equilibration scalings). All of them enter the compiled
        programs as ARGUMENTS (_env), so refreshing them never invalidates
        a compiled cycle/fused program."""
        n = self.n
        put = self.engine._put
        self.A = matrix.to_scipy()
        # ELL (padded row-major) storage: the SpMV becomes gather +
        # multiply + row reduction — no scatter, which XLA:TPU serializes
        rowptr = self._rowptr
        rowlen = np.diff(rowptr)
        E = int(rowlen.max())
        nnz = len(matrix.colind)
        rows = np.repeat(np.arange(n, dtype=np.int64), rowlen)
        pos = np.arange(nnz, dtype=np.int64) - rowptr[rows]
        # both precisions of the matrix kept on device: float32 for the
        # standard inner cycles, float64 for the escalation tier
        ell_col = np.full((n, E), n, dtype=np.int32)     # n -> zero pad row
        ell_val = np.zeros((n, E), dtype=np.float64)
        ell_col[rows, pos] = np.asarray(matrix.colind, dtype=np.int32)
        ell_val[rows, pos] = np.asarray(matrix.nzval, dtype=np.float64)
        self._ell_col = put(ell_col, None)
        ell_hi = ell_val.astype(np.float32)
        self._ell_val32 = put(ell_hi, None)
        self._ell_val64 = put(ell_val, None)
        # double-float32 split of the matrix for the compensated SpMV
        # (_spmv_comp): hi is the f32 rounding, lo the f32 of the
        # remainder — hi + lo reproduces the f64 value to ~2^-48
        self._ell_lo = put((ell_val - ell_hi.astype(np.float64))
                           .astype(np.float32), None)
        one = np.ones(n)
        self._dr = put(np.asarray(dr if dr is not None else one,
                                  dtype=np.float64), None)
        self._dc = put(np.asarray(dc if dc is not None else one,
                                  dtype=np.float64), None)

    def rebind(self, matrix, dr=None, dc=None, precond_host=None) -> None:
        """New matrix VALUES on the identical sparsity pattern — the
        Newton-iteration reuse path. Refreshes the device operands and
        keeps every compiled (and traced) program: rebuilding the refiner
        instead re-traced the fused restart-chain program each outer
        iteration (~10-20 s of host tracing at gx3 even with the XLA
        disk cache hot — measured via bench.py --nk-loop, 2026-08-18)."""
        if (matrix.flat_len != self.n
                or not np.array_equal(np.asarray(matrix.rowptr),
                                      self._rowptr)):
            raise ValueError("rebind requires the identical sparsity "
                             "pattern (new pattern => new DeviceRefiner)")
        if precond_host is not None:
            self.precond_host = precond_host
        self._bind_matrix(matrix, dr, dc)

    # -- building blocks (traced inside the cycle program) -----------------

    def _env(self, dtype=None):
        """Every large device array the programs touch, passed as jit
        ARGUMENTS — closing over them would bake gigabytes of factors into
        the compiled executable as constants. Both ELL precisions ride
        along: _spmv picks by operand dtype (the fused program computes
        float64 outer residuals around float32 inner cycles)."""
        return dict(factors=self.engine.factors,
                    consts=self.engine._flatten_consts(),
                    ell_val32=self._ell_val32, ell_val64=self._ell_val64,
                    ell_hi=self._ell_val32, ell_lo=self._ell_lo,
                    ell_col=self._ell_col,
                    dr=self._dr, dc=self._dc)

    def _spmv(self, env, x):
        """y = A x in x's precision; x (n, nrhs)."""
        vals = (env["ell_val64"] if x.dtype == jnp.float64
                else env["ell_val32"])
        xp = jnp.concatenate(
            [x, jnp.zeros((1, x.shape[1]), dtype=x.dtype)], axis=0)
        return jnp.sum(vals[:, :, None] * xp[env["ell_col"]], axis=1)

    def _spmv_comp(self, env, x64):
        """y = A x in compensated double-float32: Dekker two-products of
        the split matrix values against split x, error terms accumulated
        in emulated float64 (whose ADDS are accurate; it is the emulated
        f64 MULTIPLY that is only ~2^-33 effective on TPU — measured as
        a ~3e-10 device-residual floor that cost the fused refinement
        ~2 extra cycles plus host polish outers). Effective precision
        ~2^-48 relative to |A||x|."""
        f32, f64 = jnp.float32, jnp.float64
        xh = x64.astype(f32)
        xl = (x64 - xh.astype(f64)).astype(f32)
        zero = jnp.zeros((1, x64.shape[1]), dtype=f32)
        xph = jnp.concatenate([xh, zero], axis=0)[env["ell_col"]]
        xpl = jnp.concatenate([xl, zero], axis=0)[env["ell_col"]]
        vh = env["ell_hi"][:, :, None]
        vl = env["ell_lo"][:, :, None]
        # Dekker twoProduct via Veltkamp splitting (no hardware FMA
        # exposed): p + e == vh * xph exactly
        C = f32(4097.0)                      # 2^12 + 1 splitter
        a1 = (vh * C) - ((vh * C) - vh)
        a2 = vh - a1
        b1 = (xph * C) - ((xph * C) - xph)
        b2 = xph - b1
        p = vh * xph
        e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
        small = e + vh * xpl + vl * xph
        return jnp.sum(p.astype(f64) + small.astype(f64), axis=1)

    def _precond(self, env, v):
        """M^-1 v: scale, float32 multifrontal solve, unscale; the result
        comes back in the caller's working precision."""
        eng = self.engine
        r32 = (env["dr"].astype(v.dtype)[:, None] * v).astype(eng.prec)
        W = jnp.concatenate(
            [r32, jnp.zeros((1, r32.shape[1]), dtype=eng.prec)], axis=0)
        W = eng._solve_program(W, env["factors"], env["consts"])
        return env["dc"].astype(v.dtype)[:, None] * W[:self.n].astype(v.dtype)

    def _make_fused(self, m: int, nrhs: int, K: int, dtype=jnp.float32):
        """K chained restart cycles in ONE device program: between cycles
        the outer residual r = b - A x is recomputed ON DEVICE by the
        compensated double-float32 SpMV (_spmv_comp, ~2^-48 effective —
        emulated-f64 multiplies are only ~2^-33 on TPU and put a ~3e-10
        floor under device residuals), and the
        loop exits early on reaching tol or on stall. The per-outer
        host<->device round trip (~0.9 s of a 1.1 s outer on the tunneled
        chip at gx3deep) is paid ONCE per solve instead of once per cycle;
        a final host-side float64-exact residual check still gates
        acceptance (solve()), so the device loop can never silently
        under-deliver."""
        cycle = self._cycle_body(m, nrhs, dtype)

        def fused(b, X0, env, tol):
            bnorm = jnp.linalg.norm(b, axis=0)
            bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

            def cond(carry):
                X, rel, prev, k = carry
                # exit as soon as the contraction rate degrades below
                # ~0.6 digits/cycle: with exact host residuals the same
                # cycle contracts ~2.3 digits (measured, gx3deep), so
                # near-floor grinding here is strictly worse than handing
                # over to the host loop's exact-residual polish cycles
                improving = (rel < 0.25 * prev) | (k < 2)
                return (k < K) & (rel > tol) & improving

            def body(carry):
                X, rel, prev, k = carry
                # compensated SpMV: the device outer residual is exact to
                # ~2^-48 of |A||x|, so the fused loop converges to tol
                # instead of the ~3e-10 emulated-f64-multiply floor that
                # previously forced host polish outers
                R = b - self._spmv_comp(env, X)
                rel_now = jnp.max(jnp.linalg.norm(R, axis=0) / bnorm)
                rel_now = rel_now.astype(jnp.float64)
                d = cycle(R.astype(dtype), env)
                X = X + d.astype(b.dtype)
                return X, rel_now, rel, k + jnp.int32(1)

            inf = jnp.array(jnp.inf, jnp.float64)
            init = (X0, inf, inf, jnp.array(0, jnp.int32))
            X, rel, _, k = jax.lax.while_loop(cond, body, init)
            # rel is the residual BEFORE the last correction (one-step
            # lag keeps the loop at one SpMV per cycle); the host makes
            # the exact call
            return X, rel, k

        return jax.jit(fused)

    def _cycle_body(self, m: int, nrhs: int, dtype=jnp.float32):
        n = self.n

        def cycle(b, env):
            """One restarted-FGMRES correction: solve A d ~= b from zero,
            return d. The caller owns the outer residual (host, exact).

            Flexible GMRES: the preconditioned vectors Z_j = M^-1 v_j are
            STORED and the correction is their linear combination Z y.
            Re-applying M^-1 to V y instead (plain right-preconditioned
            GMRES) re-rounds through the float32 solve, whose
            nonlinearity is amplified by basis cancellation (||y|| >>
            ||Zy|| for ill-conditioned H) — measured as an absolute
            ~3e-10 noise floor on 60-level problems."""
            beta = jnp.linalg.norm(b, axis=0)               # (nrhs,)
            safe = jnp.where(beta > 0, beta, 1.0)
            V = jnp.zeros((m + 1, n, nrhs), dtype=dtype)
            V = V.at[0].set((b / safe).astype(dtype))
            Z = jnp.zeros((m, n, nrhs), dtype=dtype)
            H = jnp.zeros((m + 1, m, nrhs), dtype=dtype)

            def body(j, carry):
                V, Z, H = carry
                z = self._precond(env, V[j])
                Z = Z.at[j].set(z)
                w = self._spmv(env, z)
                mask = (jnp.arange(m + 1) <= j).astype(dtype)
                coef_tot = jnp.zeros((m + 1, nrhs), dtype=dtype)
                # classical Gram-Schmidt, two passes (re-orthogonalized —
                # one-shot CGS is batched-matmul friendly but loses
                # orthogonality exactly when the preconditioned operator
                # is ill-conditioned, which is the whole use case here)
                for _ in range(2):
                    coef = jnp.einsum("inr,nr->ir", V, w) * mask[:, None]
                    w = w - jnp.einsum("inr,ir->nr", V, coef)
                    coef_tot = coef_tot + coef
                hnorm = jnp.linalg.norm(w, axis=0)
                hsafe = jnp.where(hnorm > 0, hnorm, 1.0)
                H = H.at[:, j, :].add(coef_tot)
                H = H.at[j + 1, j, :].set(hnorm)
                V = V.at[j + 1].set(w / hsafe)
                return V, Z, H

            V, Z, H = jax.lax.fori_loop(0, m, body, (V, Z, H))

            # least squares min ||beta e1 - H y|| per RHS via Givens QR
            # (backward stable; see _givens_lstsq for why not normal
            # equations)
            y = _givens_lstsq(H, beta, m)                   # (m, nrhs)
            return jnp.einsum("inr,ir->nr", Z, y)

        return cycle

    def _make_cycle(self, m: int, nrhs: int, dtype=jnp.float32):
        return jax.jit(self._cycle_body(m, nrhs, dtype))

    def _prefetch(self, padn: int) -> None:
        """Compile this refinement's device programs in parallel
        background threads, overlapping the plain-IR outers and each
        other. Each program embeds the whole multifrontal solve, so on a
        remote-compile TPU they are the dominant cost of a truly cold
        solve (~minutes) when compiled serially at first use. Jit objects
        are created here (main thread) and only lowered/compiled in the
        background, so the solve loop reuses the same in-memory caches;
        failures just fall back to compile-on-first-use."""
        if (jax.default_backend() != "tpu"
                or getattr(self, "_prefetched", None) == padn):
            return
        self._prefetched = padn
        eng = self.engine
        sd = jax.ShapeDtypeStruct
        jobs = []
        if padn not in eng._solve_jit:
            eng._solve_jit[padn] = jax.jit(eng._solve_program,
                                           donate_argnums=(0,))
        jobs.append((eng._solve_jit[padn],
                     (sd((eng.flat_len + 1, padn), eng.prec), eng.factors,
                      eng._flatten_consts())))
        if eng.prec == jnp.float64:
            # float64 engines converge under plain IR (raw apply error
            # ~2^-48 x growth; measured gx3: 1e-7 raw -> 3e-12 in two
            # outers). The fused-GMRES/polish programs embed the full
            # f64 multifrontal solve, whose emulated-f64 dot temps make
            # the COMPILE demand ~19 GB HBM at gx3 scale (2026-08-19,
            # 'Ran out of memory in memory space hbm ... jit(cycle)') —
            # don't burn cold-time compiling programs the f64 path
            # neither needs nor can place; first use compiles inline,
            # and the dispatch sites fail soft.
            self._run_prefetch(jobs)
            return
        env32 = self._env(jnp.float32)
        for m_t in {self._m, min(2 * self._m, self.m)}:
            key = (m_t, padn, "gmres")
            if key not in self._fused_jit:
                self._fused_jit[key] = self._make_fused(
                    m_t, padn, K=self.max_cycles, dtype=jnp.float32)
            jobs.append((self._fused_jit[key],
                         (sd((self.n, padn), jnp.float64),
                          sd((self.n, padn), jnp.float64), env32, self.tol)))
        ckey = (self._m, padn, "polish")
        if ckey not in self._cycle_jit:
            self._cycle_jit[ckey] = self._make_cycle(self._m, padn,
                                                     dtype=jnp.float32)
        jobs.append((self._cycle_jit[ckey],
                     (sd((self.n, padn), jnp.float32), env32)))
        self._run_prefetch(jobs)

    @staticmethod
    def _run_prefetch(jobs) -> None:
        import concurrent.futures as cf

        def compile_one(job):
            fn, args = job
            try:
                with jax.default_matmul_precision("highest"):
                    fn.lower(*args).compile()
            except Exception as e:  # noqa: BLE001 best-effort
                dbg(1, f"refine prefetch miss: {type(e).__name__}: {e}")

        ex = cf.ThreadPoolExecutor(max_workers=4)
        for j in jobs:
            ex.submit(compile_one, j)
        ex.shutdown(wait=False)

    # -- host driver --------------------------------------------------------

    def solve(self, B: np.ndarray) -> np.ndarray:
        """Solve A X = B to self.tol relative residual. B (n, nrhs) f64."""
        B = np.asarray(B, dtype=np.float64)
        single = B.ndim == 1
        if single:
            B = B[:, None]
        nrhs = B.shape[1]
        # pad the RHS batch to a lane-friendly width: XLA:TPU's codegen
        # for trailing dim 2 degraded the float32 solve path so badly the
        # Krylov iteration stalled outright (measured at gx3); width >= 4
        # behaves
        padn = max(4, nrhs)
        self._prefetch(padn)
        Bp = np.zeros((self.n, padn))
        Bp[:, :nrhs] = B
        X = np.zeros_like(Bp)
        bnorm = np.linalg.norm(B, axis=0)
        bnorm[bnorm == 0] = 1.0
        put = self.engine._put
        # phase memo: once a factorization is known to need Krylov
        # corrections, later solves (same factors, new RHS — the Newton
        # loop) skip the doomed plain-IR attempts
        phase = getattr(self, "_phase", "ir")
        giveup = _giveup_threshold()
        applied_ir = False
        prev = np.inf
        stall = 0
        fused_stalled = False
        Bd = None    # device f64 copy of the padded RHS, staged once
        Xd = None    # device-resident iterate matching X (fused outers)
        # best-iterate guard: corrections computed against device-side
        # residuals can DEGRADE an iterate whose true residual already
        # sits below the device-residual floor (~2^-48 x |A||x|/|b| for
        # the compensated SpMV); the refiner must never return anything
        # worse than the best host-exact-residual iterate it has seen
        X_best, rel_best = X, np.inf
        with timed("refine (gmres-ir3)"), \
                jax.default_matmul_precision("highest"):
            # progress-based termination: keep cycling while each outer
            # still contracts the residual meaningfully; a hard cap of
            # 3x max_cycles bounds pathological cases
            for outer in range(3 * self.max_cycles):
                # OUTER residual on host: exact float64, no emulated-f64
                # attainable-accuracy floor (X == 0 => R is exactly Bp;
                # neither branch mutates R or Bp downstream)
                R = Bp - self.A @ X if X.any() else Bp
                rel = float((np.linalg.norm(R[:, :nrhs], axis=0)
                             / bnorm).max())
                dbg(1, f"refine outer {outer} ({phase}): max rel residual "
                       f"{rel:.3e}")
                if rel < rel_best:
                    rel_best, X_best = rel, X.copy()
                if rel <= self.tol:
                    break
                if (applied_ir or outer >= 1) and rel > giveup:
                    # the preconditioner itself is O(1) wrong (raw apply
                    # error, not slow contraction): no Krylov tier can
                    # repair that — every observed case is float32 factor
                    # breakdown under deep-tree element growth (raw rel
                    # 0.4-1e4 measured at gx3deep/gx1 vs <=1e-4 whenever
                    # refinement eventually converges). Bail out NOW so
                    # the facade's precision escalation refactors in
                    # float64 instead of grinding doomed GMRES-IR cycles
                    # (the round-3 gx1 solve spun for hours here).
                    dbg(1, f"refine: preconditioner apply error {rel:.3e} "
                           f"> {giveup} — abandoning refinement "
                           f"(factor-precision escalation is the repair)")
                    break
                if phase == "ir" and (self.precond_host is None or
                                      (applied_ir and rel > 0.1 * prev)):
                    # plain refinement stalled (element growth x float32):
                    # escalate to Krylov corrections. Memoize the fused
                    # path for Newton re-solves, but if this iterate is
                    # already within sight of the target, its true
                    # residual may be BELOW the fused loop's device-
                    # residual floor — go straight to host-exact polish
                    self._phase = "gmres"
                    phase = "polish" if rel <= 1e3 * self.tol else "gmres"
                elif phase == "gmres" and fused_stalled:
                    # the fused device loop exited on ITS OWN stall
                    # detector (k < K with rel_est above tol): don't pay
                    # another fused dispatch to rediscover the same stall
                    if rel <= 1e3 * self.tol:
                        phase = "polish"
                    elif self._m < self.m:
                        self._m = min(2 * self._m, self.m)
                        dbg(1, f"refine: deepening inner cycle to "
                               f"m={self._m}")
                    else:
                        phase = "gmres64"
                        self._phase = "gmres64"
                        dbg(1, "refine: escalating inner cycle to float64")
                elif phase == "gmres" and rel > 0.5 * prev:
                    if rel <= 1e3 * self.tol:
                        # the fused loop stalled within sight of the
                        # target — usually the DEVICE residual floor
                        # (emulated f64 SpMV, ~2^-35 effective), not the
                        # true attainable floor. Push further with
                        # host-exact single-cycle corrections.
                        phase = "polish"
                    elif self._m < self.m:
                        # stalled with a shallow Krylov space: deepen it
                        # before paying for emulated-f64 arithmetic
                        self._m = min(2 * self._m, self.m)
                        dbg(1, f"refine: deepening inner cycle to "
                               f"m={self._m}")
                    else:
                        # the float32 inner correction stalled far from
                        # the target even at full depth: escalate the
                        # Krylov working precision to (emulated) float64
                        # — the factor stays float32
                        phase = "gmres64"
                        self._phase = "gmres64"
                        dbg(1, "refine: escalating inner cycle to float64")
                elif (phase == "gmres" and rel > 3e-2 * prev
                      and self._m < self.m):
                    # progressing but gaining under ~1.5 digits per cycle:
                    # a deeper space contracts more per (latency-dominated)
                    # round trip
                    self._m = min(2 * self._m, self.m)
                    dbg(1, f"refine: deepening inner cycle to m={self._m}")
                elif phase == "polish" and (rel > 0.5 * prev
                                            or rel <= 3 * self.tol):
                    # exact-residual corrections stalled, or within 3x of
                    # the target: the true attainable floor (kappa_Skeel *
                    # eps64 — SuperLU's own refined residual sits here as
                    # well, e.g. 1.46e-11 at gx3deep); one more 1.4s cycle
                    # cannot buy the remaining fraction of a digit
                    dbg(1, "refine: converged to the attainable floor")
                    break
                elif phase == "gmres64":
                    stall = stall + 1 if rel > 0.7 * prev else 0
                    if stall >= 2:
                        dbg(1, "refine: converged to the attainable floor")
                        break
                prev = rel
                if phase == "ir":
                    X = X + self.precond_host(R)
                    applied_ir = True
                    Xd = None
                elif phase == "polish":
                    # single restart cycle fed the host-exact residual:
                    # pushes below the fused loop's device-residual floor
                    m_cur = self._m
                    key = (m_cur, padn, "polish")
                    if key not in self._cycle_jit:
                        self._cycle_jit[key] = self._make_cycle(
                            m_cur, padn, dtype=jnp.float32)
                    try:
                        d = self._cycle_jit[key](
                            put(R.astype(np.float32), None),
                            self._env(jnp.float32))
                    except jax.errors.JaxRuntimeError as e:
                        # f64 engines at scale: the cycle program embeds
                        # the f64 solve and may not COMPILE within HBM
                        # (emulated-f64 dot temp law) — return the best
                        # plain-IR iterate instead of crashing the solve
                        dbg(1, f"refine: polish program unavailable "
                               f"({type(e).__name__}) — returning best "
                               f"IR iterate {rel_best:.3e}")
                        break
                    X = X + np.asarray(d, dtype=np.float64)
                    Xd = None
                else:
                    # one FUSED dispatch: up to max_cycles restart cycles
                    # with device-side f64 outer residuals between them
                    # (see _make_fused); this host loop re-checks exactly
                    # and only re-dispatches on genuine stall/deepening
                    jdt = jnp.float32 if phase == "gmres" else jnp.float64
                    m_cur = self._m if phase == "gmres" else self.m
                    key = (m_cur, padn, phase)
                    if key not in self._fused_jit:
                        self._fused_jit[key] = self._make_fused(
                            m_cur, padn, K=self.max_cycles, dtype=jdt)
                    if Bd is None:
                        Bd = put(Bp, None)
                    # X == 0 on the first fused outer: materialize the
                    # zeros on DEVICE — uploading them costs a full
                    # (n, nrhs) host->device transfer, ~0.2 s of a 1.5 s
                    # warm gx3 solve on the 25 MB/s tunnel. On later
                    # fused outers (stall -> deepen -> redispatch) the
                    # previous dispatch's device-resident iterate is
                    # still exactly X — reuse it instead of re-uploading.
                    if Xd is None:
                        Xd = (jnp.zeros_like(Bd) if not X.any()
                              else put(X, None))
                    try:
                        Xd, rel_est, k = self._fused_jit[key](
                            Bd, Xd, self._env(jdt), self.tol)
                    except jax.errors.JaxRuntimeError as e:
                        # see the polish branch: fail soft when the fused
                        # program cannot compile/place at this scale (the
                        # polish program embeds the same solve and would
                        # fail the same way)
                        dbg(1, f"refine: fused program unavailable "
                               f"({type(e).__name__}) — returning best "
                               f"iterate {rel_best:.3e}")
                        break
                    X = np.asarray(Xd, dtype=np.float64)
                    fused_stalled = (int(k) < self.max_cycles
                                     and float(rel_est) > self.tol)
                    dbg(1, f"refine: fused {int(k)} x m={m_cur} cycles, "
                           f"device residual estimate {float(rel_est):.3e}")
        # if the loop exhausted its outer budget, the final correction was
        # never residual-checked; give it the chance to win — then return
        # the best iterate ever seen
        if outer == 3 * self.max_cycles - 1:
            R = Bp - self.A @ X
            rel = float((np.linalg.norm(R[:, :nrhs], axis=0) / bnorm).max())
            if rel < rel_best:
                rel_best, X_best = rel, X
        self.last_rel = rel_best
        X = X_best[:, :nrhs]
        return X[:, 0] if single else X
