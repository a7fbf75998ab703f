"""Multifrontal numeric phase — JAX/TPU implementation.

Executes the symbolic plan as *rounds* of batched dense linear algebra:
all fronts in a round are padded to one (B, N, N) tensor, assembled by a
single scatter of the CSR values, extended with their children's Schur
complements via padded gathers (no giant scatter index tensors), and
partially factored with a blocked, no-pivot LU whose panel updates are
MXU GEMMs. This is the TPU replacement for SuperLU_DIST's pdgstrf
supernodal factorization (reference SuperLU_brief_tree.txt:12-14); like
SuperLU_DIST's static-pivoting GESP strategy, accuracy lost to restricted
pivoting is recovered by float64 iterative refinement.

Precision: factors are computed in PREC (float32 on TPU by default —
MXU-friendly; float64 under tests on CPU), solves run in the same
precision, refinement always accumulates the residual in float64.

Shape discipline: every round's (B, P, N) is padded up to multiples of
LANE=128 in the matrix dimensions so XLA tiles cleanly onto the MXU and
compiled kernels are reused across rounds/matrices with the same padded
shapes. The eliminated block's padding carries an identity diagonal so the
unpivoted LU never divides by zero.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.lax.linalg import triangular_solve

from ..io.matrixfile import SparseMatrix
from ..utils import dbg, timed
from .symbolic import SymbolicFactorization

LANE = 128
PANEL = 128


def _round_up(x: int, m: int) -> int:
    return max(m, (x + m - 1) // m * m)


def _pad_dim(x: int) -> int:
    """Pad a front dimension to a power of two (capped granularity for
    very large fronts). Coarse bucketing maximizes compiled-kernel reuse
    across rounds and matrices — compile time is a first-order cost on a
    remote-compile TPU — at a bounded (<2x linear) padding overhead."""
    if x <= 8:
        return 8
    if x >= 2048:
        return _round_up(x, 512)
    p = 8
    while p < x:
        p *= 2
    return p


@dataclass
class ChildLink:
    src_round: int
    src_slot: int          # batch slot within the source round's Schur stack
    dst_slot: int          # batch slot in this round
    inv: np.ndarray        # (N,) position in child's border (or M_src = pad)


@dataclass
class RoundPlan:
    node_ids: list[int]
    B: int
    P: int                 # padded eliminated size
    N: int                 # padded front size
    M: int                 # N - P (padded border size)
    a_pos: np.ndarray      # scatter positions (flat into B*N*N) for A values
    a_src: np.ndarray      # indices into CSR nzval
    eye_pos: np.ndarray    # flat positions that get identity padding
    cells_own: np.ndarray  # (B, P) matrix indices of eliminated cells (pad -> flat_len)
    cells_bor: np.ndarray  # (B, M) matrix indices of border cells (pad -> flat_len)
    children: list[ChildLink]


def build_plan(sym: SymbolicFactorization, matrix: SparseMatrix,
               mem_budget_bytes: float = 1.5e9,
               bytes_per_elem: int = 4) -> list[RoundPlan]:
    """Compile the symbolic factorization into static per-round arrays.

    Depends only on the sparsity pattern; reusable across matrices with
    the same pattern (every Newton iteration of a spin-up run).

    Entry routing is fully vectorized: each CSR entry (r, c) is assembled
    exactly once, in the front owning the earlier-eliminated of the two
    cells (if that is c, the entry lands in the owned-column block; if r,
    in the owned-row x border block) — the standard multifrontal assembly
    rule expressed as array ops over all nnz at once.
    """
    flat_len = sym.flat_len
    csr_rowptr = np.asarray(matrix.rowptr)
    csr_colind = np.asarray(matrix.colind, dtype=np.int64)
    nnz = len(csr_colind)

    # --- global per-cell tables -------------------------------------------
    cell_node = np.empty(flat_len, dtype=np.int64)   # owning node per cell
    cell_elim = np.empty(flat_len, dtype=np.int64)   # elimination position
    for nid, f in sym.fronts.items():
        cell_node[f.cells[:f.p]] = nid
        # per-cell elimination position: order within the permutation
    cell_elim[sym.perm] = np.arange(flat_len)

    # --- route every CSR entry to its assembly front ----------------------
    rows = np.repeat(np.arange(flat_len, dtype=np.int64), np.diff(csr_rowptr))
    cols = csr_colind
    from ..native import route_entries
    entry_node = route_entries(csr_rowptr, csr_colind, cell_node, cell_elim)
    if entry_node is None:
        col_first = cell_elim[cols] <= cell_elim[rows]
        entry_node = np.where(col_first, cell_node[cols], cell_node[rows])
    entry_src = np.arange(nnz, dtype=np.int64)

    # group entries by front
    order = np.argsort(entry_node, kind="stable")
    sorted_nodes = entry_node[order]
    bounds = np.searchsorted(sorted_nodes,
                             np.arange(len(sym.fronts) + 1))

    # split each dependency round into memory-bounded, size-homogeneous
    # chunks: fronts sorted by size so each chunk's padding is tight, and
    # B_chunk * N^2 stays under the budget (large rounds at 1-degree scale
    # would otherwise materialize tens of GB at once)
    chunked_rounds: list[list[int]] = []
    for node_ids in sym.rounds:
        by_size = sorted(node_ids, key=lambda nid: -sym.fronts[nid].n)
        chunk: list[int] = []
        chunk_n = 0
        for nid in by_size:
            n_pad = _pad_dim(sym.fronts[nid].p) + _pad_dim(
                max(sym.fronts[nid].n - sym.fronts[nid].p, 0))
            if chunk and (len(chunk) + 1) * chunk_n * chunk_n * \
                    bytes_per_elem > mem_budget_bytes:
                chunked_rounds.append(chunk)
                chunk, chunk_n = [], 0
            chunk.append(nid)
            chunk_n = max(chunk_n, n_pad)
        if chunk:
            chunked_rounds.append(chunk)

    plans: list[RoundPlan] = []
    slot_of_node: dict[int, tuple[int, int]] = {}
    for rnd, node_ids in enumerate(chunked_rounds):
        B_real = len(node_ids)
        # pad the batch to a power of two as well: dummy identity fronts
        # cost almost nothing but make (B, P, N) shapes highly reusable
        # across chunks and problem sizes
        B = 1
        while B < B_real:
            B *= 2
        maxp = max(sym.fronts[nid].p for nid in node_ids)
        maxm = max(sym.fronts[nid].n - sym.fronts[nid].p for nid in node_ids)
        P = _pad_dim(maxp)
        M = _pad_dim(maxm) if maxm > 0 else 0
        N = P + M
        a_pos_l, a_src_l, eye_l = [], [], []
        cells_own = np.full((B, P), flat_len, dtype=np.int64)
        cells_bor = np.full((B, M), flat_len, dtype=np.int64)
        for b in range(B_real, B):
            # dummy front: identity pivot block, empty border
            eye_l.append((b * N + np.arange(P)) * N + np.arange(P))
        children: list[ChildLink] = []
        for b, nid in enumerate(node_ids):
            f = sym.fronts[nid]
            slot_of_node[nid] = (rnd, b)
            p, n = f.p, f.n
            cells_own[b, :p] = f.cells[:p]
            if n > p:
                cells_bor[b, :n - p] = f.cells[p:]
            # padded front position per cell, via sorted lookup
            fpos = np.concatenate([np.arange(p), P + np.arange(n - p)])
            sort_idx = np.argsort(f.cells)
            s_cells = f.cells[sort_idx]
            s_pos = fpos[sort_idx]

            def pos_of(cells_arr):
                loc = np.searchsorted(s_cells, cells_arr)
                return s_pos[loc]

            ent = order[bounds[nid]:bounds[nid + 1]]
            if len(ent):
                er, ecol = rows[ent], cols[ent]
                rp = pos_of(er)
                cp = pos_of(ecol)
                a_pos_l.append((b * N + rp) * N + cp)
                a_src_l.append(entry_src[ent])
            eye_l.append((b * N + np.arange(p, P)) * N + np.arange(p, P))
            for ch in f.children:
                cf = sym.fronts[ch]
                src_rnd, src_slot = slot_of_node[ch]
                M_src = plans[src_rnd].M
                inv = np.full(N, M_src, dtype=np.int64)
                q = pos_of(cf.cells[cf.p:])
                inv[q] = np.arange(cf.n - cf.p)
                children.append(ChildLink(src_round=src_rnd, src_slot=src_slot,
                                          dst_slot=b, inv=inv))
        plans.append(RoundPlan(
            node_ids=list(node_ids), B=B, P=P, N=N, M=M,
            a_pos=(np.concatenate(a_pos_l) if a_pos_l
                   else np.empty(0, np.int64)),
            a_src=(np.concatenate(a_src_l) if a_src_l
                   else np.empty(0, np.int64)),
            eye_pos=(np.concatenate(eye_l) if eye_l
                     else np.empty(0, np.int64)),
            cells_own=cells_own, cells_bor=cells_bor, children=children))
    return plans


# --------------------------------------------------------------------------
# jitted kernels (shapes static per round; cached across rounds/matrices)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("B", "N"))
def _assemble(avals, a_pos, eye_pos, B: int, N: int):
    F = jnp.zeros((B * N * N,), dtype=avals.dtype)
    F = F.at[a_pos].add(avals)
    F = F.at[eye_pos].add(jnp.ones((), avals.dtype))
    return F.reshape(B, N, N)


@jax.jit
def _extend_add(F, S_src, inv, dst_slot):
    """F[dst] += S_src[src_pad][inv][:, inv] with S padded by a zero row/col."""
    m = S_src.shape[0]
    Sp = jnp.pad(S_src, ((0, 1), (0, 1)))
    add = Sp[inv][:, inv]
    return F.at[dst_slot].add(add)


def _pivoted_panel(Pan, off: int, p_arr):
    """Factor a tall panel (B, R, T) — rows [off, P), cols [off, off+T) —
    with partial pivoting restricted to fully-summed rows (global row <
    p_arr[b]; identity-padded rows never move). This is the restricted
    pivoting a multifrontal method allows (only fully-summed rows may be
    exchanged), which tames the element growth that unpivoted elimination
    suffers on these transport matrices. Returns (factored panel, piv
    sequence (B, T) of panel-relative row choices)."""
    B, R, T = Pan.shape
    rows_global = off + jnp.arange(R)
    r_idx = jnp.arange(R)[None, :]

    def body(k, carry):
        Pan, piv = carry
        col = Pan[:, :, k]
        ok = (r_idx >= k) & ((rows_global[None, :] < p_arr[:, None])
                             | (r_idx == k))
        score = jnp.where(ok, jnp.abs(col), -1.0)
        sel = jnp.argmax(score, axis=1)
        bidx = jnp.arange(B)
        rowk = Pan[:, k, :]
        rowsel = Pan[bidx, sel, :]
        Pan = Pan.at[:, k, :].set(rowsel)
        Pan = Pan.at[bidx, sel, :].set(rowk)
        piv = piv.at[:, k].set(sel.astype(jnp.int32))
        pv = Pan[:, k, k][:, None]
        colv = Pan[:, :, k] / pv
        colv = jnp.where(r_idx > k, colv, 0.0)[:, :, None]
        rowv = jnp.where(jnp.arange(T)[None, :] > k, Pan[:, k, :], 0.0)[:, None, :]
        Pan = Pan - colv * rowv
        Pan = Pan.at[:, :, k].set(jnp.where(r_idx > k, colv[:, :, 0],
                                            Pan[:, :, k]))
        return Pan, piv

    piv0 = jnp.zeros((B, T), dtype=jnp.int32)
    return jax.lax.fori_loop(0, T, body, (Pan, piv0))


def _seq_to_perm(piv, R: int):
    """Compose a pivot-swap sequence into a row permutation (B, R):
    perm[b, i] = panel-relative source row that ends up at position i."""
    B, T = piv.shape
    perm = jnp.tile(jnp.arange(R, dtype=jnp.int32)[None, :], (B, 1))

    def body(k, perm):
        sel = piv[:, k]
        bidx = jnp.arange(B)
        a = perm[:, k]
        b = perm[bidx, sel]
        perm = perm.at[:, k].set(b)
        perm = perm.at[bidx, sel].set(a)
        return perm

    return jax.lax.fori_loop(0, T, body, perm)


def _partial_factor_body(F, P: int, p_arr):
    """Blocked LU with restricted partial pivoting of F[:, :P, :P]; TRSM of
    the off-blocks; Schur update.

    Returns (F_factored, S, perm) where F holds P_r A = L\\U in [:P,:P],
    U12 in [:P,P:], L21 in [P:,:P] (border rows are never permuted),
    S = F22 - L21 @ U12, and perm (B, P) maps solve positions to original
    eliminated-row order.
    """
    N = F.shape[-1]
    B = F.shape[0]
    perm_total = jnp.tile(jnp.arange(P, dtype=jnp.int32)[None, :], (B, 1))
    nb = (P + PANEL - 1) // PANEL
    for t in range(nb):
        off = t * PANEL
        T = min(PANEL, P - off)
        R = P - off
        Pan = jax.lax.dynamic_slice(F, (0, off, off), (B, R, T))
        Pan, piv = _pivoted_panel(Pan, off, p_arr)
        pperm = _seq_to_perm(piv, R)
        # permute the panel rows' other columns, then write the factored
        # panel into place
        Rows = jax.lax.dynamic_slice(F, (0, off, 0), (B, R, N))
        Rows = jnp.take_along_axis(Rows, pperm[:, :, None].astype(jnp.int32),
                                   axis=1)
        Rows = jax.lax.dynamic_update_slice(Rows, Pan, (0, 0, off))
        F = jax.lax.dynamic_update_slice(F, Rows, (0, off, 0))
        seg = jax.lax.dynamic_slice(perm_total, (0, off), (B, R))
        seg = jnp.take_along_axis(seg, pperm, axis=1)
        perm_total = jax.lax.dynamic_update_slice(perm_total, seg, (0, off))

        rest = N - off - T
        if rest > 0:
            D = Pan[:, :T, :T]
            # U-part of the panel rows
            A12 = jax.lax.dynamic_slice(F, (0, off, off + T), (B, T, rest))
            A12 = triangular_solve(D, A12, left_side=True, lower=True,
                                   unit_diagonal=True)
            F = jax.lax.dynamic_update_slice(F, A12, (0, off, off + T))
            # L-part of the (never-permuted) border rows
            bord = N - P
            if bord > 0:
                A21b = jax.lax.dynamic_slice(F, (0, P, off), (B, bord, T))
                A21b = triangular_solve(D, A21b, left_side=False, lower=False,
                                        unit_diagonal=False)
                F = jax.lax.dynamic_update_slice(F, A21b, (0, P, off))
            # trailing update (MXU; HIGHEST precision — a direct solver
            # cannot afford the TPU's default bf16 matmul passes)
            Lrows = jax.lax.dynamic_slice(F, (0, off + T, off),
                                          (B, N - off - T, T))
            A22 = jax.lax.dynamic_slice(F, (0, off + T, off + T),
                                        (B, rest, rest))
            A22 = A22 - jnp.matmul(Lrows, A12,
                                   preferred_element_type=A22.dtype,
                                   precision=jax.lax.Precision.HIGHEST)
            F = jax.lax.dynamic_update_slice(F, A22, (0, off + T, off + T))
    S = F[:, P:, P:]
    return F, S, perm_total


_partial_factor = jax.jit(_partial_factor_body, static_argnames=("P",))


def _fwd_round(W, F, perm, cells_own, cells_bor):
    """Forward substitution for one round, batched over fronts.

    W is (flat_len+1, nrhs) with a trailing dump row for padding."""
    P = cells_own.shape[1]
    L11 = F[:, :P, :P]
    L21 = F[:, P:, :P]
    rhs = W[cells_own]                                  # (B, P, nrhs)
    rhs = jnp.take_along_axis(rhs, perm[:, :, None], axis=1)
    y = triangular_solve(L11, rhs, left_side=True, lower=True,
                         unit_diagonal=True)
    W = W.at[cells_own.reshape(-1)].set(y.reshape(-1, y.shape[-1]), mode="drop")
    upd = jnp.matmul(L21, y, preferred_element_type=y.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    W = W.at[cells_bor.reshape(-1)].add(-upd.reshape(-1, y.shape[-1]),
                                        mode="drop")
    return W


def _bwd_round(W, F, cells_own, cells_bor):
    P = cells_own.shape[1]
    U11 = F[:, :P, :P]
    U12 = F[:, :P, P:]
    rhs = W[cells_own]
    xb = W[cells_bor]
    rhs = rhs - jnp.matmul(U12, xb, preferred_element_type=rhs.dtype,
                           precision=jax.lax.Precision.HIGHEST)
    x = triangular_solve(U11, rhs, left_side=True, lower=False,
                         unit_diagonal=False)
    W = W.at[cells_own.reshape(-1)].set(x.reshape(-1, x.shape[-1]), mode="drop")
    return W


class JaxMultifrontal:
    """TPU numeric engine. The whole numeric factorization is ONE compiled
    XLA program (chunks unrolled; XLA's buffer liveness frees consumed
    Schur stacks), and the whole forward+backward triangular sweep is ONE
    compiled program per nrhs — a single device dispatch per factor/solve,
    which matters enormously on a remote-dispatch TPU link."""

    def __init__(self, sym: SymbolicFactorization, matrix: SparseMatrix,
                 precision=None):
        self.sym = sym
        if precision is None:
            precision = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.prec = precision
        # triangular solves lower to blocked matmuls that follow the global
        # default matmul precision; bf16 passes would wreck a direct solver
        jax.config.update("jax_default_matmul_precision", "highest")
        try:  # persistent cache: kernels recompile across processes
            import os
            cache = os.environ.get("NK_TPU_JAX_CACHE",
                                   os.path.expanduser("~/.nk_tpu_jax_cache"))
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass
        with timed("build round plans"):
            self.plans = build_plan(sym, matrix)
        self.flat_len = sym.flat_len
        self._consts = self._device_constants()
        self._solve_jit = {}
        self._factorize(matrix)

    def _device_constants(self):
        """Plan index arrays as device buffers, passed (not embedded) into
        the compiled programs."""
        c = []
        for p in self.plans:
            p_arr = np.zeros(p.B, dtype=np.int32)
            p_arr[:len(p.node_ids)] = [self.sym.fronts[nid].p
                                       for nid in p.node_ids]
            c.append(dict(
                a_pos=jnp.asarray(p.a_pos), a_src=jnp.asarray(p.a_src),
                eye_pos=jnp.asarray(p.eye_pos), p_arr=jnp.asarray(p_arr),
                own=jnp.asarray(p.cells_own), bor=jnp.asarray(p.cells_bor),
                inv=[jnp.asarray(l.inv) for l in p.children]))
        return c

    # -- factorization: per-chunk bucketed kernels -------------------------
    # (compiled shapes are powers of two, so kernels are reused across
    # chunks of one problem AND across problem sizes; the solve path stays
    # fused into one program because per-solve dispatch latency matters)

    def _flatten_consts(self):
        flat = []
        for cc in self._consts:
            flat.extend([cc["a_pos"], cc["a_src"], cc["eye_pos"],
                         cc["p_arr"], cc["own"], cc["bor"]])
            flat.extend(cc["inv"])
        return tuple(flat)

    def _unflatten_consts(self, flat):
        out = []
        i = 0
        for p in self.plans:
            cc = dict(a_pos=flat[i], a_src=flat[i + 1], eye_pos=flat[i + 2],
                      p_arr=flat[i + 3], own=flat[i + 4], bor=flat[i + 5])
            i += 6
            cc["inv"] = list(flat[i:i + len(p.children)])
            i += len(p.children)
            out.append(cc)
        return out

    def _factorize(self, matrix: SparseMatrix) -> None:
        nzval = jnp.asarray(matrix.nzval, dtype=self.prec)
        with timed("factor dispatch"):
            factors = []
            schur: list = [None] * len(self.plans)
            uses = [0] * len(self.plans)
            for plan in self.plans:
                for link in plan.children:
                    uses[link.src_round] += 1
            for rnd, plan in enumerate(self.plans):
                cc = self._consts[rnd]
                avals = nzval[cc["a_src"]]
                F = _assemble(avals, cc["a_pos"], cc["eye_pos"],
                              B=plan.B, N=plan.N)
                for li, link in enumerate(plan.children):
                    F = _extend_add(F, schur[link.src_round][link.src_slot],
                                    cc["inv"][li], link.dst_slot)
                    uses[link.src_round] -= 1
                    if uses[link.src_round] == 0:
                        schur[link.src_round] = None
                F, S, perm = _partial_factor(F, P=plan.P, p_arr=cc["p_arr"])
                factors.append((F, perm))
                schur[rnd] = S
            self.factors = tuple(factors)
            jax.block_until_ready(self.factors)

    def refactor(self, matrix: SparseMatrix) -> None:
        """New numeric values, same pattern (Newton-iteration reuse)."""
        self._factorize(matrix)

    # -- solve as one program ----------------------------------------------

    def _solve_program(self, W, factors, flat_consts):
        consts = self._unflatten_consts(flat_consts)
        for rnd in range(len(self.plans)):
            F, perm = factors[rnd]
            W = _fwd_round(W, F, perm, consts[rnd]["own"], consts[rnd]["bor"])
        for rnd in range(len(self.plans) - 1, -1, -1):
            F, perm = factors[rnd]
            W = _bwd_round(W, F, consts[rnd]["own"], consts[rnd]["bor"])
        return W

    def solve(self, b: np.ndarray) -> np.ndarray:
        B = np.asarray(b, dtype=np.float64)
        single = B.ndim == 1
        if single:
            B = B[:, None]
        nrhs = B.shape[1]
        if nrhs not in self._solve_jit:
            self._solve_jit[nrhs] = jax.jit(self._solve_program,
                                            donate_argnums=(0,))
        Wh = np.zeros((self.flat_len + 1, nrhs), dtype=np.float64)
        Wh[:self.flat_len] = B
        W = jnp.asarray(Wh, dtype=self.prec)
        W = self._solve_jit[nrhs](W, self.factors, self._flatten_consts())
        X = np.asarray(W[:self.flat_len], dtype=np.float64)
        return X[:, 0] if single else X
