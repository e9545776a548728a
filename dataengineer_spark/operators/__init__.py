"""Operator library (SURVEY.md §2).

Each operator is a composable ``DataFrame -> DataFrame`` function (or a
Column factory). Everything is declarative — Catalyst plans the physical
execution — and designed to survive a 100 TB input: no driver-side collects
of bulk data, broadcast for dimension-sized sides, shuffle only where the
semantics require one.
"""

from dataengineer_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    events,
    joins,
    multimodal,
    preparation,
    projection,
    quality,
    similarity,
    sketches,
    textops,
    windows,
)
