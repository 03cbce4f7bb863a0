"""Batch operator inventory (SURVEY.md §2B), one module per category.

Importing this package populates the registry.
"""

from . import (  # noqa: F401
    scans,
    filters,
    joins,
    aggregates,
    analytics,
    tpch,
    windows,
    sort_limit,
    setops,
    scalars,
    textops,
    dedup,
    similarity,
    multimodal,
    quality,
    udfs,
    udtf,
    sinks,
    bucketed,
    graph,
    layout,
    modern,
    lifecycle,
    mining,
)
