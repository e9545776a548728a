"""Token-aware truncation (F5/M3).

The reference truncated each report to the classifier's 512-token window:
if over 510 tokens, keep the *last* 510 for 'entire report' (diagnosis
usually ends a report) or the *first* 510 otherwise, using the tokenizer's
offset mapping to cut on token boundaries (reference dx_group.py:49-61;
API variant also returns the cut offset,
diagnostic_group_pipeline_with_api.py:49-69).

Two forms (SURVEY.md §7.4.4):

- ``truncate_text_chars``: character-budget approximation as native
  expressions — deterministic, SQL-expressible, oracle-checked.
- ``truncate_text_tokens``: exact token semantics in an Arrow-batched
  pandas UDF. A HuggingFace tokenizer is used when importable; otherwise a
  regex word tokenizer with offset mapping (same cut contract). The
  tokenizer loads once per executor process, not per row.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_LIMIT = 510  # reference dx_group.py:51 — 512 minus [CLS]/[SEP]


def truncate_text_chars(
    text: Column | str, part_of_report: Column | str, budget: int = 2000
) -> Column:
    """Character-budget truncation (oracle form).

    Keeps the last ``budget`` chars for 'entire report', else the first
    ``budget`` chars; under-budget text passes through unchanged.
    """
    t = F.col(text) if isinstance(text, str) else text
    p = F.col(part_of_report) if isinstance(part_of_report, str) else part_of_report
    n = F.length(t)
    tail = F.substring(t, -budget, budget)
    head = F.substring(t, 1, budget)
    return F.when(n <= budget, t).when(p == "entire report", tail).otherwise(head)


# -- exact token form (pandas UDF) -----------------------------------------

_WORD_RE = re.compile(r"\S+")
_TOKENIZER = None  # per-executor cache


def _load_tokenizer():
    """HF tokenizer if available; else None → regex fallback."""
    global _TOKENIZER
    if _TOKENIZER is None:
        try:  # optional dependency; absent in this container
            from transformers import AutoTokenizer  # type: ignore

            _TOKENIZER = AutoTokenizer.from_pretrained("bert-base-uncased", use_fast=True)
        except Exception:
            _TOKENIZER = False
    return _TOKENIZER or None


def _offsets(text: str) -> list[tuple[int, int]]:
    tok = _load_tokenizer()
    if tok is not None:
        enc = tok(text, return_offsets_mapping=True, add_special_tokens=False)
        return [o for o in enc["offset_mapping"] if o[1] > o[0]]
    return [(m.start(), m.end()) for m in _WORD_RE.finditer(text)]


def _truncate_one(text: str | None, part: str | None, limit: int) -> tuple[str | None, int]:
    if text is None:
        return None, 0
    offs = _offsets(text)
    if len(offs) <= limit:
        return text, 0
    if part == "entire report":
        # keep last `limit` tokens (reference dx_group.py:52-55)
        cut = offs[len(offs) - limit][0]
        return text[cut:], cut
    # 'gross_or_micro' / 'diag_or_add': keep first `limit` tokens
    cut = offs[limit - 1][1]
    return text[:cut], cut


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("filtered_message", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)
def _truncate_udf(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        texts, parts = pdf.iloc[:, 0], pdf.iloc[:, 1]
        out = [_truncate_one(t, p, TOKEN_LIMIT) for t, p in zip(texts, parts)]
        yield pd.DataFrame(
            {"filtered_message": [o[0] for o in out], "offset": [o[1] for o in out]}
        )


def truncate_text_tokens(text: Column | str, part_of_report: Column | str) -> Column:
    """Exact token-boundary truncation → struct<filtered_message, offset>.

    The API variant's 2-column result shape (reference
    diagnostic_group_pipeline_with_api.py:287-293) — expand with
    ``select("*", "t.*")``.
    """
    t = F.col(text) if isinstance(text, str) else text
    p = F.col(part_of_report) if isinstance(part_of_report, str) else part_of_report
    return _truncate_udf(F.struct(t, p))
