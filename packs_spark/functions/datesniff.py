"""Date-format sniffing for arbitrary string columns (SURVEY §2 L4/F9).

The reference detects date columns in untyped data by sampling up to 10
distinct values per column and regex-classifying them
(timeliness_pack/main.py:26-61): a column is ``year_only`` when any sample
is a bare 1900..current-year integer, a date column when any sample
matches one of ten known date shapes.  Here the same sample is a
``distinct().limit(n)`` (no full scan ordering — any n distinct values
satisfy the reference's ``unique()[:10]`` contract), the classification is
driver-side over ≤ n strings, and the *parse* stays fully distributed: the
detected formats become a ``try_to_timestamp`` coalesce cascade (the
existing F9 path), JVM-side, no Python in the data path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

YEAR_MIN = 1900
YEAR_MAX = 2026  # fixed "current year" for determinism

# (python regex, spark datetime pattern) — mirror of the reference's
# pattern table; ambiguous two-digit shapes resolve the way the
# reference's dateutil.parse defaults do (month-first for slash/dash,
# day-first for dots per the existing F9 cascade).
DATE_REGEX_TABLE: list[tuple[str, str]] = [
    (r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$", "yyyy-MM-dd HH:mm:ss"),
    (r"^\d{4}-\d{2}-\d{2}$", "yyyy-MM-dd"),
    (r"^\d{4}/\d{2}/\d{2}$", "yyyy/MM/dd"),
    (r"^\d{4}\.\d{2}\.\d{2}$", "yyyy.MM.dd"),
    (r"^\d{2}-\d{2}-\d{4}$", "MM-dd-yyyy"),
    (r"^\d{2}/\d{2}/\d{4}$", "MM/dd/yyyy"),
    (r"^\d{2}\.\d{2}\.\d{4}$", "dd.MM.yyyy"),
]

_YEAR_RE = re.compile(r"^\d{4}$")


def classify_value(value: str) -> str | None:
    """Reference ``is_date`` semantics for one string: ``"year_only"``,
    a spark datetime pattern, or None."""
    s = str(value)
    if _YEAR_RE.match(s):
        return "year_only" if YEAR_MIN <= int(s) <= YEAR_MAX else None
    for rx, fmt in DATE_REGEX_TABLE:
        if re.match(rx, s):
            return fmt
    return None


def sniff_column(df: DataFrame, col: str, sample: int = 10) -> dict:
    """Sample-classify one column.  Returns
    ``{"kind": "year_only"|"date"|None, "formats": [spark patterns]}``.

    ``distinct().limit(sample)`` collects ≤ ``sample`` strings to the
    driver — the only driver hop, bounded by construction (the reference
    samples ``unique()[:10]`` the same way).
    """
    vals = [
        r[0]
        for r in df.select(F.col(col).cast("string"))
        .where(F.col(col).isNotNull())
        .distinct()
        .limit(sample)
        .collect()
    ]
    kinds = {classify_value(v) for v in vals} - {None}
    if "year_only" in kinds:
        return {"kind": "year_only", "formats": []}
    # preserve table order so the cascade is deterministic
    formats = [fmt for _, fmt in DATE_REGEX_TABLE if fmt in kinds]
    if formats:
        return {"kind": "date", "formats": formats}
    return {"kind": None, "formats": []}


def cascade_for(col: str, formats: list[str]) -> Column:
    """The ``try_to_timestamp`` coalesce cascade (F9 path) for an
    already-sniffed format list — pure JVM expression, codegen, no UDF."""
    c = F.col(col).cast("string")
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in formats]
    )


def sniffed_timestamp(
    df: DataFrame, col: str, sample: int = 10, info: dict | None = None
) -> Column | None:
    """Cascade over the detected formats, or None when the column does
    not look like dates.  Pass ``info`` (a :func:`sniff_column` result)
    to reuse an existing classification — sampling twice costs a second
    driver round-trip AND the two independent samples can disagree."""
    if info is None:
        info = sniff_column(df, col, sample=sample)
    if info["kind"] != "date":
        return None
    return cascade_for(col, info["formats"])


def sniff_all_columns(df: DataFrame, sample: int = 10) -> dict[str, dict]:
    """Classify every column (the reference loops all columns); returns
    only the date-ish ones."""
    out = {}
    for col in df.columns:
        info = sniff_column(df, col, sample=sample)
        if info["kind"]:
            out[col] = info
    return out
