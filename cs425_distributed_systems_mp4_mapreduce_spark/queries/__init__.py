"""Import all query modules for their registration side effects."""

from . import (  # noqa: F401
    analytics_ext,
    analytics_r4,
    analytics_r4b,
    extras,
    ivm,
    llm_ops,
    maplejuice_q,
    pipeline_ops,
    relational,
    scalars,
    sinks,
    sketches,
    sql_surface,
    streaming_twins,
    tpch_more,
    windows,
)

__all__ = [
    "analytics_ext",
    "analytics_r4",
    "analytics_r4b",
    "extras",
    "ivm",
    "llm_ops",
    "maplejuice_q",
    "pipeline_ops",
    "relational",
    "scalars",
    "sinks",
    "sketches",
    "sql_surface",
    "streaming_twins",
    "tpch_more",
    "windows",
]
