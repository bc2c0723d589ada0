"""Metric envelope — the universal result-record shape of the reference.

The reference emits every result as
``{"key": k, "value": str(v), "scope": {"perimeter": p, "value": s,
"parent_scope": {...}}}`` (profiling_pack/main.py:310-323).  Here the same
shape is a long-format DataFrame ``(key, value, perimeter, scope,
parent_scope)`` so metric streams stay distributed and can be written
per-partition (north rule: per-partition metrics + lineage).

Envelope *values* are stringified with the reference's rounding behavior
(Python ``round`` = banker's rounding, then ``str``) so that metric-level
equality tests against a pandas oracle pass bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("perimeter", T.StringType(), False),
        T.StructField("scope", T.StringType(), False),
        T.StructField("parent_scope", T.StringType(), True),
    ]
)


def format_value(v: Any, ndigits: int | None = None) -> str:
    """Stringify like the reference: ``str(round(x, n))`` for floats
    (banker's rounding — profiling_pack/main.py:336), plain ``str``
    otherwise."""
    if v is None:
        return "null"
    if isinstance(v, float):
        if ndigits is not None:
            v = round(v, ndigits)
        return str(v)
    return str(v)


def metric_rows_to_df(
    spark: SparkSession,
    rows: Iterable[tuple[str, Any, str, str, str | None]],
) -> DataFrame:
    """Build an envelope DataFrame from (key, value, perimeter, scope,
    parent_scope) tuples computed on the driver (results are tiny — the data
    pass itself stays distributed)."""
    data = [
        Row(
            key=k,
            value=format_value(v),
            perimeter=p,
            scope=s,
            parent_scope=ps,
        )
        for (k, v, p, s, ps) in rows
    ]
    return spark.createDataFrame(data, ENVELOPE_SCHEMA)


def wide_row_to_envelopes(
    spark: SparkSession,
    wide: dict[str, Any],
    dataset: str,
    per_column: dict[str, dict[str, Any]] | None = None,
    rounding: dict[str, int] | None = None,
) -> DataFrame:
    """Convert a one-row wide aggregate (dataset-level metrics) plus optional
    per-column metric dicts into the envelope stream."""
    rounding = rounding or {}
    out: list[tuple[str, Any, str, str, str | None]] = []
    for k, v in wide.items():
        out.append((k, format_value(v, rounding.get(k)), "dataset", dataset, None))
    if per_column:
        for col, metrics in per_column.items():
            for k, v in metrics.items():
                out.append(
                    (k, format_value(v, rounding.get(k)), "column", col, dataset)
                )
    return metric_rows_to_df(spark, out)
