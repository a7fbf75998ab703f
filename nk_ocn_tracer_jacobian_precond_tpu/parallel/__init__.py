from .stencil import StencilOperator
from .mesh import make_mesh

__all__ = ["StencilOperator", "make_mesh"]
