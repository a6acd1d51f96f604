"""TPU kernels (Pallas) for the solver's hot operations."""

from . import dsmatvec  # noqa: F401

__all__ = ["dsmatvec"]
