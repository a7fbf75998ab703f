"""Symbolic-analysis checkpointing.

The reference's durable artifact between stages is the matrix NetCDF file;
within a solver run the factorization is reused but the symbolic analysis
is recomputed every run (SURVEY.md §5). Here the symbolic factorization —
which depends only on the sparsity pattern, i.e. on grid + option choices,
and is identical across every Newton iteration of a spin-up — can be saved
once and reloaded, skipping ordering + analysis entirely.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import dbg
from .symbolic import Front, SymbolicFactorization


def save_symbolic(path: str, sym: SymbolicFactorization) -> None:
    nodes = sorted(sym.fronts.keys())
    arrays = {
        "perm": sym.perm,
        "iperm": sym.iperm,
        "flat_len": np.array([sym.flat_len]),
        "nodes": np.array(nodes, dtype=np.int64),
        "rounds_sizes": np.array([len(r) for r in sym.rounds], dtype=np.int64),
        "rounds_flat": np.concatenate(
            [np.asarray(r, dtype=np.int64) for r in sym.rounds]
            or [np.empty(0, np.int64)]),
    }
    for nid in nodes:
        f = sym.fronts[nid]
        arrays[f"f{nid}_owned"] = f.owned_cols
        arrays[f"f{nid}_border"] = f.border_cols
        arrays[f"f{nid}_cells"] = f.cells
        arrays[f"f{nid}_meta"] = np.array(
            [f.p, f.n, f.parent, f.round], dtype=np.int64)
        arrays[f"f{nid}_children"] = np.array(f.children, dtype=np.int64)
        if f.parent_map is not None:
            arrays[f"f{nid}_pmap"] = f.parent_map
    np.savez_compressed(path, **arrays)


def load_symbolic(path: str) -> SymbolicFactorization:
    z = np.load(path)
    nodes = z["nodes"]
    fronts = {}
    for nid in nodes:
        nid = int(nid)
        p, n, parent, rnd = (int(v) for v in z[f"f{nid}_meta"])
        pmap_key = f"f{nid}_pmap"
        fronts[nid] = Front(
            node=nid,
            owned_cols=z[f"f{nid}_owned"],
            border_cols=z[f"f{nid}_border"],
            cells=z[f"f{nid}_cells"],
            p=p, n=n, parent=parent,
            parent_map=z[pmap_key] if pmap_key in z.files else None,
            children=[int(c) for c in z[f"f{nid}_children"]],
            round=rnd)
    rounds = []
    off = 0
    flat = z["rounds_flat"]
    for sz in z["rounds_sizes"]:
        rounds.append([int(x) for x in flat[off:off + int(sz)]])
        off += int(sz)
    return SymbolicFactorization(
        fronts=fronts, rounds=rounds, perm=z["perm"], iperm=z["iperm"],
        flat_len=int(z["flat_len"][0]))


class FactorRoundCheckpointer:
    """Per-round checkpointing of the numeric factorization — the
    resumability layer the round-1 gx1 run lacked (it died at round
    ~120/160 on a session CPU budget and had to restart from zero;
    SuperLU_DIST has no equivalent at all, its factorization is all-or-
    nothing within one pdgstrf call).

    Each completed round's factors (stored on disk as the
    concatenated [K | U12] block + L21 + perm) land in
    ``round_NNNN.npz`` (atomic rename), its Schur stack — needed only
    until the parent round consumes it — in ``round_NNNN_S.npy``,
    deleted as soon as every consumer is done, so on-disk Schur usage
    tracks the bounded live set, not the sum over the whole tree.
    Checkpoints are keyed by a hash of the factorized values + the
    plan shape, so a refactor with new Newton-iteration values never
    resumes from stale factors."""

    def __init__(self, dirpath: str, nzhash: str):
        self.dir = dirpath
        self.nzhash = nzhash
        os.makedirs(dirpath, exist_ok=True)

    def _path(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round_{rnd:04d}.npz")

    def _spath(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round_{rnd:04d}_S.npy")

    def _meta(self, plan) -> np.ndarray:
        return np.array([plan.B, plan.P, plan.N, plan.M], dtype=np.int64)

    def scan(self, plans) -> set[int]:
        """Rounds with a valid (shape- and value-matching) checkpoint."""
        done: set[int] = set()
        for rnd, plan in enumerate(plans):
            p = self._path(rnd)
            if not os.path.exists(p):
                continue
            try:
                with np.load(p, allow_pickle=False) as z:
                    if (str(z["nzhash"]) == self.nzhash
                            and np.array_equal(z["meta"], self._meta(plan))):
                        done.add(rnd)
            except Exception:
                continue
        if done:
            dbg(1, f"factor checkpoint: resuming {len(done)}/{len(plans)} "
                   f"rounds from {self.dir}")
        return done

    def save_round(self, rnd: int, plan, K, U12, L21, perm,
                   S=None, pm=None) -> None:
        tmp = self._path(rnd) + ".tmp.npz"
        if pm is not None:
            # v3 TRIMMED format: only each front's true (p, m) blocks are
            # stored — K[b,:p,:p], U12[b,:p,:m], L21[b,:m,:p] raveled into
            # one flat array. Batch padding (uniform round stacks) is
            # 30-50% of the padded bytes at production scale (gx1 float64
            # factors: 88 GB trimmed vs ~144 GB padded — the difference
            # between fitting on this host's disk and not).
            Kh, Uh, Lh = np.asarray(K), np.asarray(U12), np.asarray(L21)
            parts = []
            for b in range(plan.B):
                p, m = int(pm[b, 0]), int(pm[b, 1])
                if p:
                    parts.append(Kh[b, :p, :p].ravel())
                if p and m:
                    parts.append(Uh[b, :p, :m].ravel())
                    parts.append(Lh[b, :m, :p].ravel())
            blocks = (np.concatenate(parts) if parts
                      else np.empty(0, Kh.dtype))
            np.savez(tmp, blocks=blocks, pm=np.asarray(pm, np.int64),
                     perm=np.asarray(perm), meta=self._meta(plan),
                     nzhash=self.nzhash)
        else:
            # v2 padded format (concatenated [K | U12] stack) — kept for
            # engines that don't provide the trim map
            FP = np.concatenate([np.asarray(K), np.asarray(U12)], axis=2)
            np.savez(tmp, FP=FP, L21=np.asarray(L21),
                     perm=np.asarray(perm), meta=self._meta(plan),
                     nzhash=self.nzhash)
        os.replace(tmp, self._path(rnd))
        if S is not None and np.size(S):
            stmp = self._spath(rnd) + ".tmp.npy"
            np.save(stmp, np.asarray(S))
            os.replace(stmp, self._spath(rnd))

    def load_round(self, rnd: int, plan, eng, need_schur: bool,
                   factors: bool = True):
        """Returns (K, U12, L21, KD, perm, S-or-None) device-placed with
        the engine's shardings, or None if no valid checkpoint. With
        ``factors=False`` (the engine's factor-offload mode) only the
        Schur stack is materialized; the factor slots come back None and
        stream in later via a second load_round pass."""
        K = U12 = L21 = KD = perm = None
        if factors:
            with np.load(self._path(rnd), allow_pickle=False) as z:
                if "blocks" in z.files:      # v3 trimmed
                    Kh, Uh, Lh = _unpack_trimmed(z, plan)
                else:                        # v2 padded
                    FP = z["FP"]
                    Kh = FP[:, :, :plan.P]
                    Uh = np.ascontiguousarray(FP[:, :, plan.P:])
                    Lh = z["L21"]
                K = eng._put(Kh.astype(eng.prec), plan.B)
                U12 = eng._put(Uh.astype(eng.prec), plan.B)
                L21 = eng._put(Lh.astype(eng.prec), plan.B)
                perm = eng._put(z["perm"], plan.B)
            K, U12, L21, KD = eng._shard_factors(plan, K, U12, L21)
        S = None
        if need_schur:
            spath = self._spath(rnd)
            if not os.path.exists(spath):
                return None     # consumer needs the Schur we don't have
            S = eng._shard_schur(plan, eng._put(
                np.load(spath).astype(eng.prec), plan.B))
        return K, U12, L21, KD, perm, S

    def save_schur(self, rnd: int, S) -> None:
        """Persist ONLY a round's Schur stack (repair mode: the factor
        file is already banked; the regenerated Schur keeps the on-disk
        state resumable at every completed round)."""
        stmp = self._spath(rnd) + ".tmp.npy"
        np.save(stmp, np.asarray(S))
        os.replace(stmp, self._spath(rnd))

    def has_schur(self, rnd: int) -> bool:
        return os.path.exists(self._spath(rnd))

    def drop_schur(self, rnd: int) -> None:
        try:
            os.remove(self._spath(rnd))
        except OSError:
            pass


def _unpack_trimmed(z, plan):
    """Rebuild padded (B,P,P)/(B,P,M)/(B,M,P) factor stacks from a v3
    trimmed round file. Padding is IDENTITY on K's diagonal and zero
    elsewhere: the packed-inverse layout's diagonal blocks then act as
    identity in the block substitution (tril(I,-1)=0, triu(I)=I), so
    padded solve lanes pass through untouched — the same behavior the
    factor kernels produce natively by padding assembled fronts with a
    unit diagonal (mf_jax._assemble p_arr masking)."""
    pm = z["pm"]
    blocks = z["blocks"]
    B, P, M = plan.B, plan.P, plan.M
    K = np.zeros((B, P, P), blocks.dtype)
    K[:, np.arange(P), np.arange(P)] = 1.0
    U = np.zeros((B, P, M), blocks.dtype)
    L = np.zeros((B, M, P), blocks.dtype)
    off = 0
    for b in range(B):
        p, m = int(pm[b, 0]), int(pm[b, 1])
        if p:
            K[b, :p, :p] = blocks[off:off + p * p].reshape(p, p)
            off += p * p
        if p and m:
            U[b, :p, :m] = blocks[off:off + p * m].reshape(p, m)
            off += p * m
            L[b, :m, :p] = blocks[off:off + m * p].reshape(m, p)
            off += m * p
    return K, U, L


def _nzhash(matrix) -> str:
    import hashlib
    h = hashlib.sha1(np.ascontiguousarray(matrix.nzval).tobytes())
    h.update(np.ascontiguousarray(matrix.rowptr, dtype=np.int64).tobytes())
    # colind too: identical values + row counts with permuted columns is
    # a different matrix and must not resume silently
    h.update(np.ascontiguousarray(matrix.colind, dtype=np.int64).tobytes())
    return h.hexdigest()


def save_factors(path: str, fac) -> None:
    """Persist NUMERIC factors (a genuine improvement over the reference,
    which re-factors on every solver run, SURVEY.md §5): a Newton outer
    loop can restart and go straight to triangular solves.

    ``fac`` is a MultifrontalFactorization with the JAX engine; the file
    holds every round's factor stack (concatenated [K | U12], L21,
    perm) plus the equilibration
    scalings. The symbolic plan is NOT stored — it is rebuilt from the
    matrix pattern (deterministic, seconds) or loaded via save_symbolic.
    """
    eng = fac.engine
    arrays = {"n_rounds": np.array([len(eng.factors)]),
              "flat_len": np.array([eng.flat_len]),
              "pack_bs": np.array([getattr(eng, "_pack_bs", 128)]),
              # matrix-value hash: factors are only valid for the exact
              # values they were computed from — a Newton iteration's new
              # values must never silently resume from stale factors
              "nzhash": np.array([_nzhash(fac.matrix)])}
    if fac.dr is not None:
        arrays["dr"] = fac.dr
        arrays["dc"] = fac.dc
    for i, (K, U12, L21, perm, _KD) in enumerate(eng.factors):
        arrays[f"r{i}_FP"] = np.concatenate(
            [np.asarray(K), np.asarray(U12)], axis=2)
        arrays[f"r{i}_L21"] = np.asarray(L21)
        arrays[f"r{i}_perm"] = np.asarray(perm)
    np.savez(path, **arrays)


def load_factors(path: str, fac) -> None:
    """Load numeric factors saved by save_factors into ``fac`` (which must
    have been constructed with the same matrix pattern and options —
    shapes are validated), replacing its freshly computed factors."""
    import jax.numpy as jnp

    eng = fac.engine
    z = np.load(path)
    n_rounds = int(z["n_rounds"][0])
    if n_rounds != len(eng.plans):
        raise ValueError(f"checkpoint has {n_rounds} rounds, plan has "
                         f"{len(eng.plans)} — pattern mismatch")
    if int(z["flat_len"][0]) != eng.flat_len:
        raise ValueError("checkpoint flat_len mismatch")
    if "nzhash" not in z.files:
        raise ValueError("factor checkpoint has no matrix-value hash "
                         "(pre-hash format) — cannot prove it matches "
                         "these matrix values; refactor")
    if str(z["nzhash"][0]) != _nzhash(fac.matrix):
        raise ValueError("checkpoint was computed from different matrix "
                         "VALUES (stale Newton iteration?) — refactor")
    ck_bs = int(z["pack_bs"][0]) if "pack_bs" in z.files else 128
    if ck_bs != getattr(eng, "_pack_bs", 128):
        raise ValueError(f"checkpoint pack_bs {ck_bs} != engine "
                         f"{getattr(eng, '_pack_bs', 128)} (set NK_SOLVE_BS "
                         f"to match or refactor)")
    factors = []
    for i, plan in enumerate(eng.plans):
        FP = z[f"r{i}_FP"]
        if FP.shape != (plan.B, plan.P, plan.N):
            raise ValueError(f"round {i}: factor shape {FP.shape} != "
                             f"{(plan.B, plan.P, plan.N)}")
        Kd = eng._put(FP[:, :, :plan.P].astype(eng.prec), plan.B)
        U12d = eng._put(np.ascontiguousarray(
            FP[:, :, plan.P:]).astype(eng.prec), plan.B)
        L21d = eng._put(z[f"r{i}_L21"].astype(eng.prec), plan.B)
        # tree-top rounds shard along the front axes under a mesh
        # (mf_jax._shard_factors) — reapply on reload or the restored
        # factors would silently replicate
        Kd, U12d, L21d, KDd = eng._shard_factors(plan, Kd, U12d, L21d)
        factors.append((Kd, U12d, L21d,
                        eng._put(z[f"r{i}_perm"], plan.B), KDd))
    eng.factors = tuple(factors)
    if "dr" in z.files:
        fac.dr, fac.dc = z["dr"], z["dc"]
    elif fac.dr is not None:
        # the file's factors were computed from the UNequilibrated matrix
        # (save_factors stores dr/dc whenever equilibration was on):
        # adopt that convention rather than wrapping unscaled factors in
        # this facade's fresh scalings — a silently degraded preconditioner
        dbg(1, "factor checkpoint was computed without equilibration; "
               "dropping this facade's row/column scalings to match")
        fac.dr = fac.dc = None
    fac._refiner = None     # rebind the refiner to the loaded factors
