from .library import FunctionLibrary
from .lie import so, expm
from .integrators import odeint, solve_ode_batch

__all__ = [
    "FunctionLibrary",
    "so",
    "expm",
    "odeint",
    "solve_ode_batch",
]
