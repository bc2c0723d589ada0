"""Explicit partitioning / skew handling for the web-text pipeline.

* **url-hash bucketing** — the table's physical partitioning:
  ``bucket = pmod(xxhash64(url), n_buckets)``.  Uniform regardless of host
  skew (url granularity), deterministic across runs → the unit of
  checkpointing/resume (io.lakehouse) and of per-partition metrics.
* **salted per-host aggregation** — host-level metric rollups would shuffle
  every row of a hot host (Zipf head) to one reducer.  Standard fix,
  applied explicitly: two-phase aggregation with a salt key
  (partial per (host, salt) → final per host).  AQE skew-join handling
  stays on as a backstop, but pre-aggregation is what removes the hot-key
  reducer entirely at 10^12-doc scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_bucket(url: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def host_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def salted_host_metrics(
    df: DataFrame,
    agg_exprs: dict[str, Column],
    n_salt: int = 32,
    host_col: str = "host",
) -> DataFrame:
    """Two-phase per-host aggregation of sum/count-decomposable metrics.

    ``agg_exprs`` maps output name → a SUM-decomposable Column (counts and
    sums; averages are finalized from (sum, count) by the caller).  Phase 1
    aggregates per (host, salt) — at most ``n_salt`` partial rows per host
    regardless of how hot it is; phase 2 merges partials per host.
    """
    salt = F.pmod(F.xxhash64(F.col(host_col), F.lit(17)), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(host_col, "__salt")
        .agg(*[e.alias(name) for name, e in agg_exprs.items()])
    )
    return partial.groupBy(host_col).agg(
        *[F.sum(name).alias(name) for name in agg_exprs]
    )
