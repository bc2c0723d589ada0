"""Recommendation + schemas artifact streams (reference 3-stream contract:
metrics / recommendations / schemas — text_validation_pack/main.py:235-281,
schema_scanner_pack/main.py:61-72, profiling_pack/main.py:468-492)."""

from packs_spark.io.envelope import (
    recommendation_level,
    recommendation_rows_to_df,
    schema_stream,
    text_validation_recommendations,
)
from packs_spark.operators import text_validation


def test_recommendation_level_ladder():
    assert recommendation_level(0.51) == "high"
    assert recommendation_level(0.31) == "warning"
    assert recommendation_level(0.3) == "info"
    assert recommendation_level(0.0) == "info"


def test_text_validation_recommendations_match_reference_shape(spark):
    df = spark.createDataFrame(
        [
            ("",), ("   ",), ("n/a",), ("  padded  ",),
            ("x",), ("a perfectly ordinary sentence of text",),
            ("another fine value",), (None,),
        ],
        ["text"],
    )
    summary = text_validation.summary(df, ["text"], min_length=2, max_length=30)
    recs = {
        (r.type, r.level): r.content
        for r in text_validation_recommendations(
            summary, "ds", min_length=2, max_length=30
        ).collect()
    }
    assert recs[("Empty Text Found", "info")] == (
        "Column 'text' has 1 empty text values."
    )
    assert recs[("Whitespace Only Text", "warning")] == (
        "Column 'text' has 1 whitespace-only values."
    )
    assert recs[("Null Placeholder Found", "warning")] == (
        "Column 'text' has 1 null placeholder values (N/A, None, etc.)."
    )
    # both "   " (whitespace-only) and "  padded  " differ from their trim
    assert recs[("Text Surrounded By Whitespace", "info")] == (
        "Column 'text' has 2 values with leading/trailing whitespace."
    )
    # below_min: "" (0), "x" (1), "n/a"? len 3 >= 2... lengths < 2: "" and "x"
    assert recs[("Text Too Short", "warning")] == (
        "Column 'text' has 2 values shorter than minimum length 2."
    )
    assert recs[("Text Too Long", "warning")] == (
        "Column 'text' has 1 values longer than maximum length 30."
    )
    # scope columns ride along on every row
    row = text_validation_recommendations(
        summary, "ds", min_length=2, max_length=30
    ).first()
    assert row.perimeter == "column" and row.scope == "text"
    assert row.parent_scope == "ds"


def test_no_recommendations_when_clean(spark):
    df = spark.createDataFrame([("fine value",), ("also fine",)], ["text"])
    summary = text_validation.summary(df, ["text"])
    recs = text_validation_recommendations(summary, "ds").collect()
    assert recs == []


def test_schema_stream_rows(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    rows = schema_stream(spark, df, "myds").collect()
    cols = {(r.key, r.value, r.perimeter, r.scope, r.parent_scope) for r in rows}
    assert ("column", "id", "column", "id", "myds") in cols
    assert ("column", "name", "column", "name", "myds") in cols
    assert ("dataset", "myds", "dataset", "myds", None) in cols
    assert len(rows) == 3


def test_recommendation_rows_builder(spark):
    df = recommendation_rows_to_df(
        spark,
        [("msg", "Some Type", "dataset", "ds", None, "high")],
    )
    r = df.first()
    assert (r.content, r.type, r.level) == ("msg", "Some Type", "high")
