"""Import all query modules for their registration side effects."""

from . import llm_ops, maplejuice_q, relational, scalars, windows  # noqa: F401

__all__ = ["llm_ops", "maplejuice_q", "relational", "scalars", "windows"]
