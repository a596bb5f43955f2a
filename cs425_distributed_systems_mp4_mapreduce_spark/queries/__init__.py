"""Import all query modules for their registration side effects."""

from . import relational  # noqa: F401

__all__ = ["relational"]
