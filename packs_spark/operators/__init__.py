"""Pack-equivalent operators.

Each module mirrors one reference pack (SURVEY.md §2) as declarative Spark
aggregation plans: a ``summary(df, ...) -> DataFrame`` returning the
operator's result set (SQL-checkable against the DuckDB oracle), plus
higher-level helpers that emit the reference's metric envelopes.
"""
