"""Import all query modules for their registration side effects."""

from . import maplejuice_q, relational, scalars, windows  # noqa: F401

__all__ = ["maplejuice_q", "relational", "scalars", "windows"]
