from .library import FunctionLibrary
from .lie import so, expm, sample_coefficients
from .integrators import odeint, solve_ode_batch

__all__ = [
    "FunctionLibrary",
    "so",
    "expm",
    "sample_coefficients",
    "odeint",
    "solve_ode_batch",
]
