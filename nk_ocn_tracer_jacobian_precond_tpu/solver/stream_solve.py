"""Out-of-core triangular solve over per-round factor checkpoints.

The production 1-degree problem's float64 factor set (~88 GB trimmed,
~144 GB padded) exceeds this host's RAM and any single accelerator's
memory, exactly as it exceeds one rank's memory in the reference (which
spreads it over 144 MPI ranks, test/test_solve_ABglobal.csh:6-7). The
distributed in-memory solve covers real multi-chip meshes; THIS module
covers the out-of-core configuration: the numeric factorization streams
to per-round checkpoints (mf_jax factor-only mode + offload,
checkpoint.py v3 trimmed format), and the solve walks those files —
forward substitution in round order, backward in reverse — touching one
round's factors at a time. Peak memory is one round's trimmed blocks
plus the (n, nrhs) workspace; each preconditioner application costs two
sequential passes over the factor files (disk-bandwidth bound).

The per-front math mirrors the device engine's packed layout exactly
(mf_jax._pack_diag_inv / _block_lower_apply / _block_upper_apply): K is
the pivot block with raw off-diagonal L/U panels and INVERTED bs-sized
diagonal blocks; U12 = L11^-1 P A12; L21 = A21 U11^-1.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import dbg, timed


def _lower_apply_packed(K: np.ndarray, rhs: np.ndarray, bs: int):
    """y = L11^-1 rhs for one front's packed pivot factor K (p, p)."""
    p = K.shape[0]
    y = np.empty_like(rhs)
    for o in range(0, p, bs):
        T = min(bs, p - o)
        t = rhs[o:o + T]
        if o:
            t = t - K[o:o + T, :o] @ y[:o]
        KD = K[o:o + T, o:o + T]
        y[o:o + T] = t + np.tril(KD, -1) @ t
    return y


def _upper_apply_packed(K: np.ndarray, rhs: np.ndarray, bs: int):
    """x = U11^-1 rhs (packed layout as above)."""
    p = K.shape[0]
    x = np.empty_like(rhs)
    for o in range(((p - 1) // bs) * bs, -1, -bs):
        T = min(bs, p - o)
        t = rhs[o:o + T]
        if o + T < p:
            t = t - K[o:o + T, o + T:] @ x[o + T:]
        KD = K[o:o + T, o:o + T]
        x[o:o + T] = np.triu(KD) @ t
    return x


class StreamSolver:
    """Solve A x = b from on-disk per-round factor checkpoints.

    Parameters mirror the engine that WROTE the checkpoints: the same
    symbolic factorization, plans, pack block size, and (equilibrated)
    matrix values — validated against the files' nzhash by the caller
    (FactorRoundCheckpointer.scan)."""

    def __init__(self, ckpt, sym, plans, pack_bs: int, flat_len: int):
        self.ckpt = ckpt
        self.sym = sym
        self.plans = plans
        self.bs = int(pack_bs)
        self.n = int(flat_len)

    def _round_fronts(self, rnd: int, plan):
        """Yield (front, K, U12, L21, perm) per real batch entry of a
        round, reading the trimmed v3 blocks directly (no padded
        reconstruction — the whole point is not materializing padding)."""
        path = self.ckpt._path(rnd)
        with np.load(path, allow_pickle=False) as z:
            perm_all = z["perm"]
            if "blocks" in z.files:
                pm = z["pm"]
                blocks = z["blocks"]
                off = 0
                for b, nid in enumerate(plan.node_ids):
                    p, m = int(pm[b, 0]), int(pm[b, 1])
                    K = blocks[off:off + p * p].reshape(p, p)
                    off += p * p
                    if m:
                        U12 = blocks[off:off + p * m].reshape(p, m)
                        off += p * m
                        L21 = blocks[off:off + m * p].reshape(m, p)
                        off += m * p
                    else:
                        U12 = np.zeros((p, 0)); L21 = np.zeros((0, p))
                    yield (self.sym.fronts[nid], K, U12, L21,
                           perm_all[b, :p])
            else:                       # v2 padded fallback
                FP = z["FP"]
                L21_all = z["L21"]
                for b, nid in enumerate(plan.node_ids):
                    f = self.sym.fronts[nid]
                    p, m = f.p, f.n - f.p
                    yield (f, FP[b, :p, :p], FP[b, :p, plan.P:plan.P + m],
                           L21_all[b, :m, :p], perm_all[b, :p])

    def apply(self, b: np.ndarray) -> np.ndarray:
        """x = A^-1 b (the equilibrated system's A) — one forward pass in
        round order, one backward pass in reverse, each streaming every
        round's factor file exactly once."""
        single = b.ndim == 1
        W = np.asarray(b, dtype=np.float64)
        if single:
            W = W[:, None]
        W = W.copy()
        for rnd, plan in enumerate(self.plans):
            for f, K, U12, L21, perm in self._round_fronts(rnd, plan):
                cells = np.asarray(f.cells)
                own = cells[:f.p]
                y = _lower_apply_packed(K, W[own][perm], self.bs)
                W[own] = y
                if f.n > f.p:
                    W[cells[f.p:]] -= L21 @ y
        for rnd in range(len(self.plans) - 1, -1, -1):
            plan = self.plans[rnd]
            for f, K, U12, L21, perm in self._round_fronts(rnd, plan):
                cells = np.asarray(f.cells)
                own = cells[:f.p]
                rhs = W[own]
                if f.n > f.p:
                    rhs = rhs - U12 @ W[cells[f.p:]]
                W[own] = _upper_apply_packed(K, rhs, self.bs)
        return W[:, 0] if single else W


def stream_solve(matrix, maps, sym, ckpt_dir: str, B: np.ndarray,
                 pack_bs: int = 128, refine_tol: float = 1e-10,
                 max_iters: int = 8):
    """End-to-end out-of-core solve: equilibrate, validate the on-disk
    checkpoints against the matrix values, stream-apply, refine with
    exact float64 residuals (scipy SpMV). Returns (X, rel_residuals).

    This is the solve half of the split the reference cannot do at all:
    its factorization lives and dies inside one MPI job's memory
    (options.Fact = FACTORED, solve_ABdist.c:539)."""
    from .mf import equilibrate
    from .mf_jax import JaxMultifrontal

    fac_matrix, dr, dc = equilibrate(matrix)
    # a factorize=False engine reproduces the plans + checkpoint key the
    # factor pass used (same nzhash: equilibrate is deterministic).
    # _pack_bs is forced to the WRITER's block size after construction —
    # the module-level SOLVE_BS env was read at import and the adaptive
    # selection would otherwise pick a different width (and a different
    # checkpoint-hash suffix) at production maxP
    eng = JaxMultifrontal(sym, fac_matrix, factorize=False,
                          checkpoint_dir=ckpt_dir)
    eng._pack_bs = int(pack_bs)
    ck = eng._ckpt_for(fac_matrix)
    done = ck.scan(eng.plans)
    if len(done) != len(eng.plans):
        raise RuntimeError(
            f"checkpoint dir {ckpt_dir} holds {len(done)}/{len(eng.plans)} "
            f"valid rounds — cannot stream-solve an incomplete factor set")
    solver = StreamSolver(ck, sym, eng.plans, eng._pack_bs, eng.flat_len)

    A = matrix.to_scipy().tocsr()
    single = B.ndim == 1
    Bm = B[:, None] if single else B
    bnorm = np.linalg.norm(Bm, axis=0)
    bnorm[bnorm == 0] = 1.0

    def precond(r):
        scaled = dr[:, None] * r if dr is not None else r
        y = solver.apply(scaled)
        return dc[:, None] * y if dc is not None else y

    X = np.zeros_like(Bm, dtype=np.float64)
    rel = np.ones(Bm.shape[1])
    for it in range(max_iters):
        R = Bm - A @ X if X.any() else Bm
        rel = np.linalg.norm(R, axis=0) / bnorm
        dbg(1, f"stream-solve outer {it}: max rel residual {rel.max():.3e}")
        if rel.max() <= refine_tol:
            break
        with timed(f"stream apply {it}"):
            X = X + precond(R)
    R = Bm - A @ X
    rel = np.linalg.norm(R, axis=0) / bnorm
    return (X[:, 0] if single else X), rel
