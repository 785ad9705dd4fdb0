from .checkpoint import (
    OrbaxCheckpointer,
    load_fit_state,
    load_pytree,
    save_fit_state,
    save_pytree,
)
from .debug import check_finite, debug_nans

__all__ = [
    "OrbaxCheckpointer",
    "save_pytree",
    "load_pytree",
    "save_fit_state",
    "load_fit_state",
    "check_finite",
    "debug_nans",
]
