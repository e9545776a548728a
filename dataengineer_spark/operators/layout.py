"""Multi-dimensional lake layout: z-order (Morton) clustering for writes.

A parquet scan prunes row groups / files by min-max column statistics, but
a table sorted on one key has useless stats for every other key.  Z-order
interleaves the bits of several keys into one clustering value so a sort
on it co-locates rows that are close in EVERY dimension — after the write,
a box predicate on any subset of the z-columns skips most files on footer
stats alone.  This is the layout step the reference's batch lake never
had (it relied on Postgres btree indexes; here the "index" is file-level
min-max statistics, which is the only index an object-store lake has).

All of it is plain column expressions (rank scaling + bit interleave) —
one range shuffle, no UDF.  At 100 TB the only data-size-dependent cost
is the range exchange the write needs anyway to control file count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column to an integer in [0, 2**bits) given its

    min/max.  Constant columns (hi == lo) map to 0."""
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    cells = F.lit((1 << bits) - 1)
    cell = F.least(F.floor(frac * (cells + F.lit(1))), cells)
    # clamp below too: caller-supplied approximate ranges may undershoot
    return F.greatest(cell, F.lit(0)).cast("long")


def zorder_value(
    df: DataFrame,
    zcols: list[str],
    bits: int = 16,
    out: str = "_z",
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Append the Morton interleave of ``zcols`` as column ``out``.

    Ranges come from one min/max aggregate over the input (control-plane:
    2 scalars per column) — or pass ``ranges`` ({col: (lo, hi)}) when
    they're already known (partition metadata, a stats table) to skip
    that extra full scan at 100 TB; out-of-range values clamp, so
    approximate bounds only cost clustering quality at the edges, never
    correctness.  Each column scales to ``bits`` bits; bit j of column c
    lands at position j*len(zcols)+c, so ``bits * len(zcols)`` must stay
    <= 63.  Deterministic for a given input regardless of partitioning.
    """
    if bits * len(zcols) > 63:
        raise ValueError("bits * len(zcols) must fit in a signed long")
    if ranges is None:
        stats = df.agg(
            *[F.min(c).alias(f"_lo_{c}") for c in zcols],
            *[F.max(c).alias(f"_hi_{c}") for c in zcols],
        ).first()
        ranges = {c: (stats[f"_lo_{c}"], stats[f"_hi_{c}"]) for c in zcols}
    n = len(zcols)
    scaled = [
        _scale_expr(c, F.lit(ranges[c][0]), F.lit(ranges[c][1]), bits)
        for c in zcols
    ]
    parts = [
        F.shiftleft(F.shiftright(s, j).bitwiseAND(F.lit(1)), j * n + c)
        for c, s in enumerate(scaled)
        for j in range(bits)
    ]
    z = reduce(lambda a, b: a.bitwiseOR(b), parts)
    return df.withColumn(out, z)


def zorder_write(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to parquet clustered by the z-value of ``zcols``.

    ``repartitionByRange`` on the z-value puts contiguous Morton ranges in
    the same file (one range exchange — sampling picks balanced bounds, so
    skewed key distributions still give even files); the within-partition
    sort tightens row-group stats inside each file.  ``files`` controls
    output file count = scan parallelism of future readers.
    """
    zdf = zorder_value(df, zcols, bits)
    (
        zdf.repartitionByRange(files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
