from .api import Factorization, factor

__all__ = ["Factorization", "factor"]
