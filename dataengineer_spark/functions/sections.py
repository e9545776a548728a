"""Report sectionization (F3 regex-table compiler + F4 sectionizer).

The reference split each report into named sections with per-health-authority
regexes loaded from the ``section_regex`` config table (compiled once on the
driver, reference dx_group.py:177-183) and applied row-wise via an opaque
``create_sections`` returning a dict that pandas expanded to columns
(dx_group.py:185-189). Distributed redesign (SURVEY.md §1.4, §7.4.2):

- F3: collect the *tiny* config table once, keep per-authority variant
  lists per section — broadcast implicitly via the query plan (patterns
  are literals inside expressions; extraction coalesces across variants).
- F4: one ``regexp_extract`` per section assembled into a single ``struct``
  column in the same select, then expanded with ``select("*", "s.*")`` —
  never pandas-style positional alignment, which has no deterministic
  meaning on a distributed table.

Patterns use the Java/RE2-common subset (no lookaround, no backrefs) so the
same pattern string behaves identically in Spark, DuckDB (oracle), and
Python ``re`` (SURVEY.md §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: section fields in output order (reference dx_group.py:163-164)
SECTION_NAMES = ["gross", "addendum", "diagnosis", "diagnosis_comment", "micro"]

#: default clinical-report header patterns, group 1 = section body
DEFAULT_PATTERNS: dict[str, str] = {
    "gross": r"(?i)gross(?: description)?\s*:\s*([^\n]*)",
    "addendum": r"(?i)addendum\s*:\s*([^\n]*)",
    "diagnosis": r"(?i)diagnosis\s*:\s*([^\n]*)",
    "diagnosis_comment": r"(?i)(?:diagnosis )?comment\s*:\s*([^\n]*)",
    "micro": r"(?i)micro(?:scopic)?(?: description)?\s*:\s*([^\n]*)",
}

#: authority columns of the section_regex config table (dx_group.py:176-182)
AUTHORITY_COLUMNS = ["nha", "fha", "fha2", "iha", "vcha1", "vcha2"]


def compile_section_regex(section_df: DataFrame) -> dict[str, str | list[str]]:
    """F3: config table → pattern variant(s) per section.

    ``section_df`` has one row per section (``parent_category``) with one
    pattern variant per authority column. Multi-variant sections keep the
    variant *list* (tried in authority order by ``create_sections``) rather
    than a merged ``(?:A(x))|(?:B(y))`` alternation — merging renumbers the
    capture groups, so group-1 extraction silently returns '' for any report
    matching a non-first authority format. The table is config-sized
    (rows = sections), so a driver collect is correct at any data scale.
    """
    rows = section_df.collect()
    compiled: dict[str, str | list[str]] = {}
    for row in rows:
        variants = [
            row[c] for c in AUTHORITY_COLUMNS if c in row.__fields__ and row[c]
        ]
        if not variants:
            continue
        section = row["parent_category"]
        compiled[section] = variants[0] if len(variants) == 1 else variants
    return compiled


def _extract_section(c: Column, pattern: str | list[str]) -> Column:
    """Group-1 extraction over one pattern or a variant list (first
    variant that extracts a non-empty body wins)."""
    variants = [pattern] if isinstance(pattern, str) else list(pattern)
    out = F.regexp_extract(c, variants[0], 1)
    for v in variants[1:]:
        out = F.when(out != F.lit(""), out).otherwise(F.regexp_extract(c, v, 1))
    return out


def create_sections(
    msg: Column | str, patterns: dict[str, str | list[str]] | None = None
) -> Column:
    """F4: one report column → struct of named sections.

    Returns ``struct<gross, addendum, diagnosis, diagnosis_comment, micro,
    filtered_message, part_of_report>``. Semantics (contract defined by the
    engine; the reference body is absent, SURVEY.md F4):

    - each section = first regex match's group 1, '' if no match
    - ``part_of_report``: 'diag_or_add' when diagnosis/addendum matched,
      else 'gross_or_micro' when gross/micro matched, else 'entire report'
      (domain seen at reference dx_group.py:52-58)
    - ``filtered_message``: concatenation of matched sections when any
      matched, else the whole message.
    """
    pats = patterns or DEFAULT_PATTERNS
    c = F.col(msg) if isinstance(msg, str) else msg
    parts = {name: _extract_section(c, pats.get(name, r"$^")) for name in SECTION_NAMES}

    has = {name: parts[name] != F.lit("") for name in SECTION_NAMES}
    part_of_report = (
        F.when(has["diagnosis"] | has["addendum"], F.lit("diag_or_add"))
        .when(has["gross"] | has["micro"], F.lit("gross_or_micro"))
        .otherwise(F.lit("entire report"))
    )
    any_section = None
    for name in SECTION_NAMES:
        any_section = has[name] if any_section is None else (any_section | has[name])
    # skip EMPTY slots, not just NULLs (concat_ws only skips NULLs): a
    # report matching two non-adjacent sections must join them with one
    # space, not carry an interior run of separators
    joined = F.array_join(
        F.filter(
            F.array(*[parts[n] for n in SECTION_NAMES]),
            lambda x: x != F.lit(""),
        ),
        " ",
    )
    filtered_message = F.when(any_section, F.trim(joined)).otherwise(c)

    return F.struct(
        *[parts[n].alias(n) for n in SECTION_NAMES],
        filtered_message.alias("filtered_message"),
        part_of_report.alias("part_of_report"),
    )


def sectionize(
    df: DataFrame,
    msg_col: str = "msg",
    patterns: dict[str, str | list[str]] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Apply F4 and expand the struct to top-level columns (P9).

    The struct is computed and expanded in one select — the distributed-safe
    replacement for the reference's index-aligned horizontal concat
    (dx_group.py:189).

    Raises when the input already carries a section output column (e.g.
    re-sectionizing sectionized output): the expansion would otherwise
    produce duplicate column names that fail on first reference/write.
    """
    base_names = keep if keep is not None else df.columns
    outputs = set(SECTION_NAMES) | {"filtered_message", "part_of_report"}
    clash = outputs & set(base_names)
    if clash:
        raise ValueError(
            f"sectionize: input columns {sorted(clash)} collide with the "
            "section output columns — drop or rename them (or pass keep=)"
        )
    base = [F.col(c) for c in base_names]
    return df.select(*base, create_sections(msg_col, patterns).alias("_s")).select(
        "*", "_s.*"
    ).drop("_s")
