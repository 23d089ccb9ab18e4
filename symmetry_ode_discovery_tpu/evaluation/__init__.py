from .eval_eq import eval_sindy_coefficients, sindy_truth, aggregate_results

__all__ = ["eval_sindy_coefficients", "sindy_truth", "aggregate_results"]
