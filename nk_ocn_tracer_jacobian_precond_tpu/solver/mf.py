"""Multifrontal factorization facade: symbolic once, numeric per matrix,
solve per RHS batch, iterative refinement to direct-solver accuracy.

This is the from-scratch replacement for the SuperLU_DIST factor/solve
path (reference src/solve_ABglobal.c:349-409). The symbolic plan depends
only on the sparsity pattern and is reusable across Newton iterations —
an improvement over the reference, which recomputed symbolic analysis on
every run (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import numpy as np

from ..io.matrixfile import SparseMatrix
from ..utils import dbg, timed
from .symbolic import SymbolicFactorization, symbolic_from_matrix


class MultifrontalFactorization:
    def __init__(self, matrix: SparseMatrix, impl: str = "auto",
                 leaf_size: int = 32, refine_tol: float = 1e-13,
                 maps=None, sym: SymbolicFactorization | None = None,
                 n_devices: int | None = None):
        self.matrix = matrix
        self.A = matrix.to_scipy()
        self.refine_tol = refine_tol
        if sym is None:
            if maps is None:
                maps = _maps_from_matrix(matrix)
            with timed("symbolic analysis"):
                sym = symbolic_from_matrix(maps, matrix, leaf_size=leaf_size)
        self.sym = sym
        if impl == "auto":
            impl = "jax" if _jax_usable() else "numpy"
        self.impl = impl
        with timed(f"numeric factorization ({impl})"):
            if impl == "numpy":
                from .mf_numpy import NumpyMultifrontal
                self.engine = NumpyMultifrontal(sym, matrix)
            elif impl == "jax":
                from .mf_jax import JaxMultifrontal
                self.engine = JaxMultifrontal(sym, matrix)
            else:
                raise ValueError(f"unknown multifrontal impl: {impl}")

    def solve(self, b: np.ndarray, refine: bool = True) -> np.ndarray:
        from .api import iterative_refinement
        b = np.asarray(b, dtype=np.float64)
        single = b.ndim == 1
        B = b[:, None] if single else b
        with timed("mf solve"):
            X = np.asarray(self.engine.solve(B), dtype=np.float64)
        if refine:
            with timed("mf refine"):
                X = iterative_refinement(self.A, self.engine.solve, B, X,
                                         tol=self.refine_tol)
        return X[:, 0] if single else X


def _maps_from_matrix(matrix: SparseMatrix):
    raise ValueError(
        "MultifrontalFactorization needs index maps (pass maps=...) when "
        "constructed from a bare SparseMatrix")


def _jax_usable() -> bool:
    try:
        import jax  # noqa: F401
        return True
    except Exception:
        return False
