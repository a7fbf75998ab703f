"""Symbolic multifrontal analysis (host side).

From the dissection tree, compute for every supernode its *front*: the
dense matrix over (owned cells | border cells), where border columns are
ancestor-owned columns coupled to the subtree:

    border(n) = (U_child border(child)  |  neighbors(owned(n))) \\ subtree(n)

This is the block-granular equivalent of SuperLU_DIST's symbolic
factorization + supernode detection (reference SuperLU_brief_tree.txt:5-8);
because borders live entirely inside ancestor separators, the recurrence is
exact — no extra fill beyond the dense blocks.

The output is a static execution plan: per processing round, the list of
fronts with their cell index sets, extend-add index maps into the parent
front, and A-assembly scatter maps. The numeric phase (numpy or JAX) just
replays the plan — the TPU side never sees a pointer or a dynamic shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..io.matrixfile import SparseMatrix
from ..utils import dbg
from .ordering import ColumnGraph, DissectionTree


@dataclass
class Front:
    node: int
    owned_cols: np.ndarray     # column ids, sorted by elimination position
    border_cols: np.ndarray    # column ids, sorted by elimination position
    cells: np.ndarray          # matrix indices: owned cells then border cells
    p: int                     # number of eliminated (owned) cells
    n: int                     # total front size
    parent: int                # parent node id (-1 at root)
    parent_map: np.ndarray | None  # position of this front's border cells
    #                                in the parent's front (len n - p)
    children: list[int]
    round: int


@dataclass
class SymbolicFactorization:
    fronts: dict[int, Front]           # node id -> Front
    rounds: list[list[int]]            # node ids per round (leaves first)
    perm: np.ndarray                   # permuted order: cells by elimination
    iperm: np.ndarray
    flat_len: int

    @property
    def max_front(self) -> int:
        return max(f.n for f in self.fronts.values())

    def factor_nnz(self) -> int:
        return sum(f.p * (2 * f.n - f.p) for f in self.fronts.values())

    def factor_flops(self) -> float:
        tot = 0.0
        for f in self.fronts.values():
            p, n, b = f.p, f.n, f.n - f.p
            tot += 2.0 / 3.0 * p ** 3 + 2.0 * p * p * b + 2.0 * p * b * b
        return tot


def analyze(graph: ColumnGraph, tree: DissectionTree) -> SymbolicFactorization:
    nodes = tree.nodes
    elim = tree.col_elim_pos

    def by_elim(cols: np.ndarray) -> np.ndarray:
        return cols[np.argsort(elim[cols], kind="stable")]

    # bottom-up border computation over the postorder
    border: dict[int, np.ndarray] = {}
    subtree_mark = np.full(graph.ncols, -1, dtype=np.int64)
    # subtree membership via min/max elimination position (postorder gives
    # each subtree a contiguous elim range)
    sub_lo = {}
    sub_hi = {}
    for nid in tree.postorder:
        nd = nodes[nid]
        lo = elim[nd.owned].min() if len(nd.owned) else np.inf
        hi = elim[nd.owned].max() if len(nd.owned) else -np.inf
        for ch in nd.children:
            lo = min(lo, sub_lo[ch])
            hi = max(hi, sub_hi[ch])
        sub_lo[nid], sub_hi[nid] = lo, hi
        cand = [border[ch] for ch in nd.children]
        cand.append(graph.neighbors_of(np.asarray(nd.owned, dtype=np.int64)))
        allc = np.unique(np.concatenate(cand)) if cand else np.empty(0, np.int64)
        # outside the subtree == eliminated after every column in it
        outside = allc[(elim[allc] < lo) | (elim[allc] > hi)]
        # only later-eliminated columns remain (earlier ones are impossible
        # with vertex separators, but filter defensively)
        border[nid] = outside[elim[outside] > hi]

    fronts: dict[int, Front] = {}
    for nid in tree.postorder:
        nd = nodes[nid]
        oc = by_elim(nd.owned)
        bc = by_elim(border[nid])
        cells = np.concatenate(
            [graph.cells_of_cols(oc), graph.cells_of_cols(bc)])
        p = int(graph.block_size[oc].sum())
        fronts[nid] = Front(node=nid, owned_cols=oc, border_cols=bc,
                            cells=cells, p=p, n=len(cells),
                            parent=nd.parent, parent_map=None,
                            children=list(nd.children), round=nd.round)

    # extend-add maps: child border cells -> positions in parent front.
    # One flat scratch array instead of a per-parent dict (a gx1-scale
    # hot spot); each parent's positions are written once, then every
    # child maps its border by a single gather.
    pos_of_cell = np.empty(graph.nt * graph.tsl, dtype=np.int64)
    for nid in tree.postorder:
        pf = fronts[nid]
        if not pf.children:
            continue
        pos_of_cell[pf.cells] = np.arange(pf.n)
        for ch in pf.children:
            cf = fronts[ch]
            cf.parent_map = pos_of_cell[cf.cells[cf.p:]]

    nrounds = max(f.round for f in fronts.values()) + 1
    rounds = [[] for _ in range(nrounds)]
    for nid in tree.postorder:
        rounds[fronts[nid].round].append(nid)

    perm = np.concatenate([fronts[nid].cells[:fronts[nid].p]
                           for nid in tree.postorder])
    flat_len = graph.nt * graph.tsl
    assert len(perm) == flat_len, (len(perm), flat_len)
    iperm = np.empty_like(perm)
    iperm[perm] = np.arange(flat_len)
    sym = SymbolicFactorization(fronts=fronts, rounds=rounds, perm=perm,
                                iperm=iperm, flat_len=flat_len)
    dbg(1, f"symbolic: {len(fronts)} fronts, {nrounds} rounds, "
           f"max front {sym.max_front}, factor nnz {sym.factor_nnz():,}, "
           f"flops {sym.factor_flops():.3e}")
    return sym


def symbolic_from_matrix(maps, matrix: SparseMatrix,
                         leaf_size: int = 32) -> SymbolicFactorization:
    from .ordering import build_column_graph, nested_dissection
    graph = build_column_graph(maps, matrix)
    tree = nested_dissection(graph, leaf_size=leaf_size)
    return analyze(graph, tree)
