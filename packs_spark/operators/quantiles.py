"""Quantiles with an explicit exact / approximate mode split.

``exact=True`` — SQL ``percentile`` (sorted exact aggregation).  Bit-parity
with the DuckDB oracle (both use linear interpolation), which is what the
correctness gate needs — but the aggregation buffer holds every distinct
value, so a 100 TB high-cardinality double column is a memory cliff.

``exact=False`` — two-pass binned CDF:

1. one codegen agg for (min, max, count);
2. one fixed-width bucket-count ``groupBy`` — a plain HashAggregate over a
   key space bounded by ``bins`` (default 4096), partial-aggregated
   map-side, so the shuffle moves at most ``bins`` rows per task;
3. linear interpolation inside the hit bucket on the driver
   (``bins`` rows collected, never data rows).

The estimate lands within one bin width, (max-min)/bins, of the
order statistics bracketing the target rank (like any histogram sketch,
the value error additionally absorbs the local inter-value gap when the
exact linear interpolation falls inside a gap between data values);
state is O(bins) regardless of cardinality, and both passes stay inside
whole-stage codegen.  Note that even ``percentile_approx`` would not fix
the plan shape: like exact ``percentile`` it is a TypedImperativeAggregate
(ObjectHashAggregate, codegen barrier); the binned path is the one that
keeps the whole job in HashAggregate + codegen.

This mirrors the reference's own policy of bounded-resource approximations
at scale (profiling_pack/main.py:26-28 caps profiling at 1e6 rows); exact
mode is kept for oracle parity and small data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_values(
    df: DataFrame,
    col: str,
    probs: list[float],
    exact: bool = True,
    bins: int = 4096,
) -> list[float | None]:
    """Driver-side quantile values for ``probs`` (each in [0, 1])."""
    if exact:
        arr = ", ".join(str(p) for p in probs)
        row = df.agg(F.expr(f"percentile({col}, array({arr}))")).collect()[0][0]
        return [None if v is None else float(v) for v in (row or [None] * len(probs))]

    x = F.col(col)
    mn, mx, n = df.agg(
        F.min(x.cast("double")), F.max(x.cast("double")), F.count(x)
    ).collect()[0]
    if n == 0 or mn is None:
        return [None] * len(probs)
    if mn == mx:
        return [float(mn)] * len(probs)
    width = (mx - mn) / bins
    bucket = F.least(
        F.lit(bins - 1), F.floor((x.cast("double") - F.lit(mn)) / F.lit(width))
    )
    counts = dict(
        df.where(x.isNotNull())
        .groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    # cumulative counts once; then each quantile is a scan of <= bins ints
    cum, running = [], 0
    for b in range(bins):
        running += counts.get(b, 0)
        cum.append(running)
    out: list[float | None] = []
    for p in probs:
        # continuous-quantile target rank in [0, n-1] (same convention as
        # percentile/quantile_cont); the value is interpolated inside the
        # bucket containing that rank
        t = p * (n - 1)
        target = int(t) + 1  # 1-based count needed to cover rank t
        b = next(i for i, c in enumerate(cum) if c >= target)
        before = cum[b - 1] if b else 0
        in_bucket = cum[b] - before
        frac = ((t - before) / in_bucket) if in_bucket else 0.0
        frac = min(max(frac, 0.0), 1.0)
        out.append(mn + (b + frac) * width)
    return out


def iqr_summary(
    df: DataFrame, cols: list[str], exact: bool = True, bins: int = 4096
) -> DataFrame:
    """Per-column IQR outlier profile: (column, q1, q3, outlier_count,
    normality_score) with Tukey 1.5×IQR fences
    (outlier_detection_pack/main.py IQR strategy).

    Two jobs regardless of column count: one quantile pass (exact or
    binned per the ``exact`` flag) and one fence-count pass."""
    if exact:
        q = df.agg(
            *[
                e
                for col in cols
                for e in (
                    F.expr(f"percentile({col}, 0.25)").alias(f"q1_{col}"),
                    F.expr(f"percentile({col}, 0.75)").alias(f"q3_{col}"),
                )
            ]
        ).collect()[0]
        quart = {c: (float(q[f"q1_{c}"]), float(q[f"q3_{c}"])) for c in cols}
    else:
        quart = {
            c: tuple(quantile_values(df, c, [0.25, 0.75], exact=False, bins=bins))
            for c in cols
        }

    aggs = []
    for col in cols:
        q1, q3 = quart[col]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        c = F.col(col)
        aggs.append(F.sum(((c < lo) | (c > hi)).cast("long")).alias(f"out_{col}"))
        aggs.append(F.count(c).alias(f"cnt_{col}"))
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(col).alias("column"),
            F.round(F.lit(quart[col][0]), 6).alias("q1"),
            F.round(F.lit(quart[col][1]), 6).alias("q3"),
            F.col(f"out_{col}").alias("outlier_count"),
            F.round(1.0 - F.col(f"out_{col}") / F.col(f"cnt_{col}"), 4).alias(
                "normality_score"
            ),
        )
        for col in cols
    ]
    return wide.select(F.inline(F.array(*structs)))
