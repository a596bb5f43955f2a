from .parity import davg, dsum, o_davg, o_dsum, o_dstddev, dstddev_cols

__all__ = ["davg", "dsum", "o_davg", "o_dsum", "o_dstddev", "dstddev_cols"]
