"""Text-validation operator (reference: text_validation_pack/main.py:36-119).

One scan over the table computes every text metric for every requested
column: the per-column pandas loops of the reference collapse into a single
``df.agg`` with ~13 aggregate expressions per column, which Spark executes
as one partial+final hash-aggregate pass (map-side combine, no shuffle of
raw rows).  Reshaping the one-row wide result into per-column rows is a
driver-side ``inline`` of struct literals — zero extra scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from packs_spark.functions import text as TX


def summary(
    df: DataFrame,
    columns: list[str],
    min_length: int | None = None,
    max_length: int | None = None,
) -> DataFrame:
    """Per-column text metrics, one output row per column.

    Output: (column, non_null, min_length, max_length, total_length,
    mean_length, below_min, above_max, in_range_count, in_range_percent,
    empty_count, whitespace_count, placeholder_count, surrounded_count,
    min_word_count, max_word_count).  ``total_length``/``in_range_count``
    are the exact BIGINT numerators behind the two derived doubles —
    cross-engine comparisons should use those (two rounds of driver
    hash-mismatch traced to float round()-tie behavior differing between
    DuckDB builds; integers cannot diverge).
    """
    aggs = []
    for col in columns:
        c = F.col(col)
        ln = F.when(c.isNotNull(), F.length(c))
        wc = F.when(c.isNotNull(), TX.word_count(c))
        below = (
            TX.count_if(ln < F.lit(min_length))
            if min_length is not None
            else F.lit(0).cast("long")
        )
        above = (
            TX.count_if(ln > F.lit(max_length))
            if max_length is not None
            else F.lit(0).cast("long")
        )
        # mean as exact DECIMAL sum / count, not F.avg: a float average's
        # last ulp depends on partition reduction order, which can flip the
        # rounded 2nd decimal vs the oracle on a rounding boundary
        # (mirrors profiling_numeric_stats in queries_packs.py)
        mean_ln = F.round(
            F.sum(ln.cast("decimal(28,4)")).cast("double") / F.count(c), 2
        )
        aggs += [
            F.count(c).alias(f"{col}__non_null"),
            F.min(ln).alias(f"{col}__min_length"),
            F.max(ln).alias(f"{col}__max_length"),
            F.coalesce(F.sum(ln), F.lit(0)).cast("long").alias(f"{col}__total_length"),
            mean_ln.alias(f"{col}__mean_length"),
            below.alias(f"{col}__below_min"),
            above.alias(f"{col}__above_max"),
            TX.count_if(TX.is_empty(c)).alias(f"{col}__empty_count"),
            TX.count_if(TX.is_whitespace_only(c)).alias(f"{col}__whitespace_count"),
            TX.count_if(TX.is_null_placeholder(c)).alias(f"{col}__placeholder_count"),
            TX.count_if(TX.is_surrounded_by_whitespace(c)).alias(
                f"{col}__surrounded_count"
            ),
            F.min(wc).alias(f"{col}__min_word_count"),
            F.max(wc).alias(f"{col}__max_word_count"),
        ]
    wide = df.agg(*aggs)

    structs = []
    for col in columns:
        nn = F.col(f"{col}__non_null")
        in_range = F.round(
            F.when(nn == 0, F.lit(1.0)).otherwise(
                (nn - F.col(f"{col}__below_min") - F.col(f"{col}__above_max")) / nn
            ),
            4,
        )
        structs.append(
            F.struct(
                F.lit(col).alias("column"),
                nn.alias("non_null"),
                F.coalesce(F.col(f"{col}__min_length"), F.lit(0)).alias("min_length"),
                F.coalesce(F.col(f"{col}__max_length"), F.lit(0)).alias("max_length"),
                F.col(f"{col}__total_length").alias("total_length"),
                F.coalesce(F.col(f"{col}__mean_length"), F.lit(0.0)).alias(
                    "mean_length"
                ),
                F.col(f"{col}__below_min").alias("below_min"),
                F.col(f"{col}__above_max").alias("above_max"),
                (nn - F.col(f"{col}__below_min") - F.col(f"{col}__above_max")).alias(
                    "in_range_count"
                ),
                in_range.alias("in_range_percent"),
                F.col(f"{col}__empty_count").alias("empty_count"),
                F.col(f"{col}__whitespace_count").alias("whitespace_count"),
                F.col(f"{col}__placeholder_count").alias("placeholder_count"),
                F.col(f"{col}__surrounded_count").alias("surrounded_count"),
                F.coalesce(F.col(f"{col}__min_word_count"), F.lit(0)).alias(
                    "min_word_count"
                ),
                F.coalesce(F.col(f"{col}__max_word_count"), F.lit(0)).alias(
                    "max_word_count"
                ),
            )
        )
    return wide.select(F.inline(F.array(*structs)))


def score(summary_df: DataFrame) -> DataFrame:
    """Dataset-level validity score: mean over columns of
    1 - (empty+whitespace+placeholder)/non_null
    (text_validation_pack/main.py:224-231,285-290)."""
    valid = 1 - (
        F.col("empty_count") + F.col("whitespace_count") + F.col("placeholder_count")
    ) / F.col("non_null")
    return summary_df.where(F.col("non_null") > 0).agg(
        F.round(F.avg(valid), 2).alias("score"),
        F.sum(
            F.col("empty_count")
            + F.col("whitespace_count")
            + F.col("placeholder_count")
        ).alias("total_text_issues"),
    )


def oracle_sql_for(
    table: str,
    columns: list[str],
    min_length: int | None = None,
    max_length: int | None = None,
    floats: bool = True,
) -> str:
    """DuckDB SQL computing exactly :func:`summary` (one UNION ALL branch per
    column — the oracle need not be single-pass).  ``floats=False`` omits the
    two derived double columns (mean_length, in_range_percent) so a hash
    comparison rests on integers only — the driver-gate configuration."""
    branches = []
    for col in columns:
        below = (
            f"coalesce(sum(CASE WHEN length({col}) < {min_length} THEN 1 ELSE 0 END), 0)"
            if min_length is not None
            else "0"
        )
        above = (
            f"coalesce(sum(CASE WHEN length({col}) > {max_length} THEN 1 ELSE 0 END), 0)"
            if max_length is not None
            else "0"
        )
        wc = (
            f"CASE WHEN trim({col}) = '' THEN 0 "
            f"ELSE length(regexp_split_to_array(trim({col}), '\\s+')) END"
        )
        mean_sql = (
            f"""
  coalesce(round(CAST(sum(CAST(length({col}) AS DECIMAL(28,4))) AS DOUBLE)
                 / count({col}), 2), 0.0) AS mean_length,"""
            if floats
            else ""
        )
        in_range_pct_sql = (
            f"""
  CASE WHEN count({col}) = 0 THEN 1.0
       ELSE round((count({col}) - {below} - {above}) * 1.0 / count({col}), 4)
  END AS in_range_percent,"""
            if floats
            else ""
        )
        branches.append(
            f"""
SELECT
  '{col}' AS "column",
  count({col}) AS non_null,
  coalesce(min(length({col})), 0) AS min_length,
  coalesce(max(length({col})), 0) AS max_length,
  CAST(coalesce(sum(length({col})), 0) AS BIGINT) AS total_length,{mean_sql}
  CAST({below} AS BIGINT) AS below_min,
  CAST({above} AS BIGINT) AS above_max,
  CAST(count({col}) - {below} - {above} AS BIGINT) AS in_range_count,{in_range_pct_sql}
  CAST(coalesce(sum(CASE WHEN {col} = '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS empty_count,
  CAST(coalesce(sum(CASE WHEN trim({col}) = '' AND {col} <> '' THEN 1 ELSE 0 END), 0) AS BIGINT) AS whitespace_count,
  CAST(coalesce(sum(CASE WHEN lower({col}) IN ({_PLACEHOLDER_SQL}) THEN 1 ELSE 0 END), 0) AS BIGINT) AS placeholder_count,
  CAST(coalesce(sum(CASE WHEN {col} <> trim({col}) THEN 1 ELSE 0 END), 0) AS BIGINT) AS surrounded_count,
  coalesce(min(CASE WHEN {col} IS NOT NULL THEN {wc} END), 0) AS min_word_count,
  coalesce(max(CASE WHEN {col} IS NOT NULL THEN {wc} END), 0) AS max_word_count
FROM {table}"""
        )
    return "\nUNION ALL\n".join(branches)


_PLACEHOLDER_SQL = ", ".join(f"'{p}'" for p in TX.NULL_PLACEHOLDERS)
