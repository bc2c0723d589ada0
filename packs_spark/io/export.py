"""Capped offending-row export sink (SURVEY §2 S8/L2).

The reference exports at most 10k offending rows (duplicates, compare
mismatches) as a human-review artifact — XLSX or a table blob
(duplicates_finder_pack/main.py:12,349-361; data_compare_pack/main.py:27,
369-375).  Here the cap is a Spark ``limit``: it plans as CollectLimit, so
scanning stops as soon as the cap is reached — no full materialization of
the offending set.  The capped result is tiny by construction, so it is
written as ONE file (coalesce(1)) — a deliberate driver-adjacent step for
a human artifact, not a data-path sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DEFAULT_EXPORT_CAP = 10_000  # reference cap on exported rows


def export_rows(
    df: DataFrame,
    path: str,
    cap: int = DEFAULT_EXPORT_CAP,
    fmt: str | None = None,
) -> str:
    """Write at most ``cap`` rows of ``df`` to ``path``.

    ``fmt`` defaults from the path extension: parquet / csv / xlsx
    (xlsx gated on openpyxl, mirroring the reference's pandas writer).
    Row selection under the cap is first-come (the reference's
    ``head(10_000)`` is equally unordered); pass a sorted ``df`` for a
    deterministic excerpt.
    """
    fmt = (fmt or os.path.splitext(path)[1].lstrip(".")).lower() or "parquet"
    capped = df.limit(cap)
    if fmt in ("xlsx", "xls"):
        try:  # pragma: no cover - openpyxl absent in this environment
            import openpyxl  # noqa: F401

            capped.toPandas().to_excel(path, index=False)
            return path
        except ImportError:
            pass
        import pandas as pd

        from packs_spark.io.xlsx import write_xlsx

        def scalar_or_none(v):
            # Arrow-enabled toPandas() returns ArrayType cells as numpy
            # arrays; pd.isna(ndarray) is elementwise, so gate on
            # is_scalar before the NaN check to avoid the ambiguous-truth
            # crash on array-typed columns
            if v is None or not pd.api.types.is_scalar(v):
                return v
            return None if pd.isna(v) else v

        pdf = capped.toPandas()
        rows = [
            [scalar_or_none(v) for v in rec]
            for rec in pdf.itertuples(index=False, name=None)
        ]
        return write_xlsx(path, [str(c) for c in pdf.columns], rows)
    writer = capped.coalesce(1).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    else:
        raise ValueError(f"unknown export format: {fmt!r}")
    return path


def duplicate_rows(
    df: DataFrame, keys: list[str], min_count: int = 2
) -> DataFrame:
    """Full offending rows for duplicated keys (J1 join of the key-count
    aggregate back to the table, duplicates_finder_pack/main.py:161-173),
    ready for :func:`export_rows`."""
    from pyspark.sql import functions as F

    dups = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") >= min_count)
    )
    return df.join(dups, keys, "inner")
