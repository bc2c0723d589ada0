"""Date-format sniffing on a messy-strings fixture (reference
timeliness_pack/main.py:26-61 sampling + regex classification)."""

from pyspark.sql import functions as F

from packs_spark.functions.datesniff import (
    classify_value,
    sniff_all_columns,
    sniff_column,
    sniffed_timestamp,
)


def test_classify_value_table():
    assert classify_value("2021-05-03") == "yyyy-MM-dd"
    assert classify_value("2021/05/03") == "yyyy/MM/dd"
    assert classify_value("2021.05.03") == "yyyy.MM.dd"
    assert classify_value("05/03/2021") == "MM/dd/yyyy"
    assert classify_value("05-03-2021") == "MM-dd-yyyy"
    assert classify_value("03.05.2021") == "dd.MM.yyyy"
    assert classify_value("2021-05-03 10:11:12") == "yyyy-MM-dd HH:mm:ss"
    assert classify_value("1999") == "year_only"
    assert classify_value("1850") is None  # out of the validity window
    assert classify_value("3021") is None
    assert classify_value("not a date") is None
    assert classify_value("12345") is None


def test_sniff_messy_column_and_parse(spark):
    rows = [
        ("2020-01-15",), ("02/28/2021",), ("2020-01-15",), ("31.12.2019",),
        ("garbage",), (None,), ("2021-06-01 08:00:00",),
    ]
    df = spark.createDataFrame(rows, ["d"])
    info = sniff_column(df, "d")
    assert info["kind"] == "date"
    assert set(info["formats"]) >= {"yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy"}

    ts = sniffed_timestamp(df, "d")
    parsed = df.select(ts.alias("ts")).agg(
        F.sum(F.col("ts").isNotNull().cast("long")).alias("ok"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("mn"),
        F.date_format(F.max("ts"), "yyyy-MM-dd").alias("mx"),
    ).first()
    # 5 parseable (garbage + NULL fail), span 2019-12-31 .. 2021-06-01
    assert parsed.ok == 5
    assert parsed.mn == "2019-12-31" and parsed.mx == "2021-06-01"


def test_sniff_year_only_and_non_date(spark):
    df = spark.createDataFrame(
        [("1999", "hello", 5), ("2004", "world", 6)], ["y", "s", "n"]
    )
    assert sniff_column(df, "y")["kind"] == "year_only"
    assert sniff_column(df, "s")["kind"] is None
    assert sniffed_timestamp(df, "s") is None
    allc = sniff_all_columns(df)
    assert set(allc) == {"y"}
