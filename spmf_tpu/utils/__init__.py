from .checkpoint import OrbaxCheckpointer, load_pytree, save_pytree
from .debug import check_finite, debug_nans

__all__ = [
    "OrbaxCheckpointer",
    "save_pytree",
    "load_pytree",
    "check_finite",
    "debug_nans",
]
