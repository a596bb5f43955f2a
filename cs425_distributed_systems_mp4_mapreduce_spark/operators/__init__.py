from .maplejuice import juice, maple, maple_juice

__all__ = ["maple", "juice", "maple_juice"]
