"""Source-connector tests (SURVEY §2.1 S1/S2/S9)."""

import os
import time

from packs_spark.io.sources import data_staleness_days, load_source, read_csv


def test_csv_with_skiprows(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "junk preamble line 1\n"
        "junk preamble line 2\n"
        "id,name,score\n"
        "1,alpha,0.5\n"
        "2,beta,1.5\n"
        "3,gamma,2.5\n"
    )
    df = read_csv(spark, str(p), skiprows=2)
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("alpha", 0.5), 2: ("beta", 1.5), 3: ("gamma", 2.5)}
    assert df.schema["id"].dataType.typeName() in ("integer", "long")


def test_csv_skiprows_multi_partition_file(spark, tmp_path):
    """The skip must drop ONLY the leading preamble even when the file is
    read as many splits — rows deep in the file (other partitions) stream
    through untouched and none are lost."""
    p = tmp_path / "big.csv"
    n = 5000
    body = "".join(f"{i},name_{i},{i * 0.25}\n" for i in range(n))
    p.write_text("preamble A\npreamble B\nid,name,score\n" + body)
    df = read_csv(spark, str(p), skiprows=2)
    assert df.count() == n
    got = df.agg({"id": "sum"}).collect()[0][0]
    assert got == n * (n - 1) // 2


def test_csv_no_skiprows(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = load_source(spark, {"type": "csv", "path": str(p)})
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_folder_of_parquet_chunks_is_one_dataset(spark, tmp_path):
    d = tmp_path / "chunks"
    d.mkdir()
    spark.range(0, 5).write.parquet(str(d / "part1.parquet"))
    spark.range(5, 12).write.parquet(str(d / "part2.parquet"))
    df = load_source(spark, {"type": "folder", "paths": [
        str(d / "part1.parquet"), str(d / "part2.parquet")]})
    assert df.count() == 12  # chunk aggregation = plain multi-path scan


def test_staleness_days(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("hi")
    two_days_ago = time.time() - 2 * 86400
    os.utime(p, (two_days_ago, two_days_ago))
    d = data_staleness_days(str(tmp_path))
    assert 1.9 < d < 2.1


def test_export_rows_caps_and_roundtrips(spark, tmp_path):
    from packs_spark.io.export import duplicate_rows, export_rows

    df = spark.range(0, 50_000).withColumnRenamed("id", "k")
    out = str(tmp_path / "excerpt.parquet")
    export_rows(df, out, cap=10_000)
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.columns == ["k"]

    out_csv = str(tmp_path / "excerpt_csv")
    export_rows(df.limit(7), out_csv, cap=10_000, fmt="csv")
    assert spark.read.option("header", "true").csv(out_csv).count() == 7


def test_duplicate_rows_join(spark):
    from packs_spark.io.export import duplicate_rows

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (3, "f")],
        ["k", "v"],
    )
    rows = duplicate_rows(df, ["k"]).collect()
    assert len(rows) == 5  # k=1 twice + k=3 thrice; k=2 excluded
    assert all(r.dup_count in (2, 3) for r in rows)
