"""Device-resident mixed-precision refinement: batched GMRES-IR.

The rebuild of SuperLU_DIST's iterative refinement (pdgsrfs*, reference
SuperLU_brief_tree.txt:20-24), upgraded for a float32 factorization: the
restricted-pivot LU suffers real element growth on these transport
matrices (measured ~1e7 at gx3), so plain residual correction stalls in
float32. GMRES-IR — float64 Krylov vectors, the float32 factorization as
a right preconditioner — is the standard mixed-precision repair (GESP +
refinement taken one step further) and converges to ~1e-12 relative
residuals.

Everything runs on the device: the float64 CSR SpMV, the float32
multifrontal solve (as the preconditioner), the Gram-Schmidt
orthogonalization, and the small least-squares solve. One restart cycle
is ONE compiled XLA program — per-dispatch latency on a remote TPU link
is ~50-100 ms, so scattering a Krylov iteration over many dispatches
(as host-side scipy.gmres does, one RHS at a time) costs more in latency
than in math. All right-hand sides iterate together, batched.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import dbg, timed


def _small_spd_solve(G, t):
    """Batched solve of tiny SPD systems G y = t (G (r, m, m), t (r, m))
    by Gauss-Jordan without pivoting — XLA:TPU has no float64
    LuDecomposition, and for the ridge-regularized Gram matrix of a
    near-orthonormal Krylov basis pivoting is unnecessary."""
    m = G.shape[-1]
    A = jnp.concatenate([G, t[:, :, None]], axis=2)      # (r, m, m+1)

    def body(k, A):
        pivot_row = A[:, k, :] / A[:, k, k][:, None]
        factor = A[:, :, k]
        A = A - factor[:, :, None] * pivot_row[:, None, :]
        return A.at[:, k, :].set(pivot_row)

    A = jax.lax.fori_loop(0, m, body, A)
    return A[:, :, m]


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
                 tol: float = 1e-12, m: int = 16, max_cycles: int = 10,
                 precond_host=None):
        if not jax.config.jax_enable_x64:
            raise RuntimeError("DeviceRefiner needs jax_enable_x64 "
                               "(float64 residual accumulation)")
        self.engine = engine
        self.A = matrix.to_scipy()
        self.precond_host = precond_host
        self.tol = tol
        self.m = m
        self.max_cycles = max_cycles
        n = matrix.flat_len
        self.n = n
        put = engine._put
        # ELL (padded row-major) storage: the SpMV becomes gather +
        # multiply + row reduction — no scatter, which XLA:TPU serializes
        rowptr = np.asarray(matrix.rowptr)
        rowlen = np.diff(rowptr)
        E = int(rowlen.max())
        nnz = len(matrix.colind)
        rows = np.repeat(np.arange(n, dtype=np.int64), rowlen)
        pos = np.arange(nnz, dtype=np.int64) - rowptr[rows]
        # the INNER correction solver runs wholly in float32 (IR3: only
        # the outer residual needs high precision, and it lives on the
        # host; float64 on TPU is ~48-bit two-float emulation and made the
        # Krylov cycle 4x slower for zero accuracy benefit)
        ell_col = np.full((n, E), n, dtype=np.int32)     # n -> zero pad row
        ell_val = np.zeros((n, E), dtype=np.float32)
        ell_col[rows, pos] = np.asarray(matrix.colind, dtype=np.int32)
        ell_val[rows, pos] = np.asarray(matrix.nzval, dtype=np.float32)
        self._ell_col = put(ell_col, None)
        self._ell_val = put(ell_val, None)
        one = np.ones(n)
        self._dr = put(np.asarray(dr if dr is not None else one,
                                  dtype=np.float32), None)
        self._dc = put(np.asarray(dc if dc is not None else one,
                                  dtype=np.float32), None)
        self._cycle_jit = {}

    # -- building blocks (traced inside the cycle program) -----------------

    def _env(self):
        """Every large device array the programs touch, passed as jit
        ARGUMENTS — closing over them would bake gigabytes of factors into
        the compiled executable as constants."""
        return dict(factors=self.engine.factors,
                    consts=self.engine._flatten_consts(),
                    ell_val=self._ell_val, ell_col=self._ell_col,
                    dr=self._dr, dc=self._dc)

    def _spmv(self, env, x):
        """y = A x in float32; x (n, nrhs)."""
        xp = jnp.concatenate(
            [x, jnp.zeros((1, x.shape[1]), dtype=x.dtype)], axis=0)
        return jnp.sum(env["ell_val"][:, :, None] * xp[env["ell_col"]],
                       axis=1)

    def _precond(self, env, v):
        """M^-1 v: scale, multifrontal solve, unscale (all f32)."""
        eng = self.engine
        r32 = (env["dr"][:, None] * v).astype(eng.prec)
        W = jnp.concatenate(
            [r32, jnp.zeros((1, r32.shape[1]), dtype=eng.prec)], axis=0)
        W = eng._solve_program(W, env["factors"], env["consts"])
        return (env["dc"][:, None] * W[:self.n]).astype(jnp.float32)

    def _make_cycle(self, m: int, nrhs: int):
        n = self.n

        def cycle(b, env):
            """One restarted-GMRES correction: solve A d ~= b from zero,
            return d. The caller owns the outer residual (host, exact)."""
            beta = jnp.linalg.norm(b, axis=0)               # (nrhs,)
            safe = jnp.where(beta > 0, beta, 1.0)
            V = jnp.zeros((m + 1, n, nrhs), dtype=jnp.float32)
            V = V.at[0].set(b / safe)
            H = jnp.zeros((m + 1, m, nrhs), dtype=jnp.float32)

            def body(j, carry):
                V, H = carry
                w = self._spmv(env, self._precond(env, V[j]))
                mask = (jnp.arange(m + 1) <= j).astype(jnp.float32)
                coef_tot = jnp.zeros((m + 1, nrhs), dtype=jnp.float32)
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
                return V, H

            V, H = jax.lax.fori_loop(0, m, body, (V, H))

            # least squares min ||beta e1 - H y|| per RHS via normal
            # equations (m is tiny; H columns are near-orthonormal scaled)
            Hr = H.transpose(2, 0, 1)                       # (nrhs, m+1, m)
            g = jnp.zeros((nrhs, m + 1, 1), dtype=jnp.float32)
            g = g.at[:, 0, 0].set(beta)
            G = jnp.einsum("rim,rik->rmk", Hr, Hr)
            ridge = 1e-12 * jnp.trace(G, axis1=1, axis2=2)[:, None, None] \
                / m + 1e-30
            G = G + ridge * jnp.eye(m, dtype=jnp.float32)[None]
            t = jnp.einsum("rim,rik->rmk", Hr, g)[:, :, 0]  # (nrhs, m)
            y = _small_spd_solve(G, t)
            u = jnp.einsum("inr,ri->nr", V[:m], y)
            return self._precond(env, u)

        return jax.jit(cycle)

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
        Bp = np.zeros((self.n, padn))
        Bp[:, :nrhs] = B
        X = np.zeros_like(Bp)
        bnorm = np.linalg.norm(B, axis=0)
        bnorm[bnorm == 0] = 1.0
        put = self.engine._put
        env = None
        # phase memo: once a factorization is known to need Krylov
        # corrections, later solves (same factors, new RHS — the Newton
        # loop) skip the doomed plain-IR attempts
        phase = getattr(self, "_phase", "ir")
        applied_ir = False
        prev = np.inf
        with timed("refine (gmres-ir3)"), \
                jax.default_matmul_precision("highest"):
            for outer in range(self.max_cycles + 4):
                # OUTER residual on host: exact float64, no emulated-f64
                # attainable-accuracy floor
                R = Bp - self.A @ X
                rel = float((np.linalg.norm(R[:, :nrhs], axis=0)
                             / bnorm).max())
                dbg(1, f"refine outer {outer} ({phase}): max rel residual "
                       f"{rel:.3e}")
                if rel <= self.tol:
                    break
                if phase == "ir" and (self.precond_host is None or
                                      (applied_ir and rel > 0.1 * prev)):
                    # plain refinement stalled (element growth x float32):
                    # escalate to Krylov corrections
                    phase = "gmres"
                    self._phase = "gmres"
                prev = rel
                if phase == "ir":
                    X = X + self.precond_host(R)
                    applied_ir = True
                else:
                    key = (self.m, padn)
                    if key not in self._cycle_jit:
                        self._cycle_jit[key] = self._make_cycle(self.m, padn)
                    if env is None:
                        env = self._env()
                    d = self._cycle_jit[key](
                        put(R.astype(np.float32), None), env)
                    X = X + np.asarray(d, dtype=np.float64)
        X = X[:, :nrhs]
        return X[:, 0] if single else X
