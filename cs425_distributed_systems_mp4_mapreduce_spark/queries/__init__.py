"""Import all query modules for their registration side effects."""

from . import relational, scalars, windows  # noqa: F401

__all__ = ["relational", "scalars", "windows"]
