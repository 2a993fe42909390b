from .batch import batch_guesses, default_mesh, make_batched_solver

__all__ = ["make_batched_solver", "default_mesh", "batch_guesses"]
