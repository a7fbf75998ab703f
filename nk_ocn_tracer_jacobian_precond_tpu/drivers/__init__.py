from .config import parse_opt_file
from .gen_a import run_gen_a

__all__ = ["parse_opt_file", "run_gen_a"]
