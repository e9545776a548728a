"""Scalar function library (SURVEY.md §2.4).

All deterministic functions are native Column expressions (JVM-side, inside
whole-stage codegen) so Catalyst can still push filters/projections around
them; pandas UDFs exist only where semantics genuinely need Python
(token-aware truncation's tokenizer form, model inference).
"""

from dataengineer_spark.functions.cleaning import basic_reg, clean_msg
from dataengineer_spark.functions.dates import format_date, parse_yyyymmdd
from dataengineer_spark.functions.labels import audit_comment_expr, split_label
from dataengineer_spark.functions.sections import (
    SECTION_NAMES,
    compile_section_regex,
    create_sections,
    sectionize,
)
from dataengineer_spark.functions.truncate import truncate_text_chars, truncate_text_tokens

__all__ = [
    "clean_msg",
    "basic_reg",
    "format_date",
    "parse_yyyymmdd",
    "split_label",
    "audit_comment_expr",
    "SECTION_NAMES",
    "compile_section_regex",
    "create_sections",
    "sectionize",
    "truncate_text_chars",
    "truncate_text_tokens",
]
