"""Label parsing + audit strings (F7/F8).

F7: the classifier emits labels like ``LABEL_7``; the reference parsed the
numeric suffix with ``x.split('_')[1]`` (reference dx_group.py:259), which
throws on a label with no underscore. Engine behavior is defined instead:
no separator → NULL (FIXTURES.md §B edge cases).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_label(col: Column | str, as_long: bool = True) -> Column:
    """``LABEL_7`` → 7 (bigint) / ``'7'``; no ``'_'`` → NULL.

    ANSI-safe: ``get`` returns NULL out-of-bounds and ``try_cast`` returns
    NULL for a non-numeric suffix instead of failing the job — a single
    malformed label must not kill a 100 TB run.
    """
    c = F.col(col) if isinstance(col, str) else col
    suffix = F.get(F.split(c, "_"), 1)
    return suffix.try_cast("bigint") if as_long else suffix


def audit_comment_expr(params: dict[str, str]) -> Column:
    """F8 audit-string construction (reference dx_group.py:95)."""
    return F.lit(f"Pipeline ran with parameters : {params}")
