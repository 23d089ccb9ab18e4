from .tape import TapeSpec, random_population, eval_population, tape_to_string
from .evolve import GPConfig, symbolic_regression

__all__ = [
    "TapeSpec",
    "random_population",
    "eval_population",
    "tape_to_string",
    "GPConfig",
    "symbolic_regression",
]
