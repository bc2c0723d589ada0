"""Source connectors — the engine-native form of the reference's
config-described sources (`source_conf.json` ``type`` ∈ file / folder /
csv / excel / database; profiling_pack/properties.yaml:1-9,
profiling_pack/main.py:140-147).

The reference materializes every source as one pandas frame (or a list of
parquet chunk paths).  Here a source config resolves to a lazy Spark
DataFrame: scans stay distributed, predicate pushdown / column pruning
apply, and the "chunked dataset" case (list of parquet files treated as
ONE logical dataset, profiling_pack/main.py:161-214 +
qalita_core.aggregation) is simply a multi-path ``spark.read.parquet`` —
Spark's partial/final aggregation replaces the reference's manual
chunk aggregators for free.

Excel has no JVM-side reader in stock Spark; it is ingested via pandas on
the driver (reference uses pandas too) and parallelized afterwards — the
import is gated so the engine works without openpyxl installed.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def load_source(spark: SparkSession, conf: dict) -> DataFrame:
    """Resolve a reference-style source config to a DataFrame.

    conf: {"type": "file"|"folder"|"csv"|"parquet"|"excel"|"database",
           "path"|"paths": ..., "skiprows": int, "header": bool,
           "url"/"table_or_query"/"properties": for database}
    """
    stype = conf.get("type", "file")
    if stype in ("file", "csv", "parquet"):
        path = conf["path"]
        ext = os.path.splitext(path)[1].lower()
        if stype == "csv" or ext == ".csv":
            return read_csv(spark, path, skiprows=int(conf.get("skiprows", 0)))
        if ext in (".xlsx", ".xls"):
            return read_excel(spark, path, skiprows=int(conf.get("skiprows", 0)))
        return spark.read.parquet(path)
    if stype == "folder":
        # list-of-chunks = ONE dataset (reference chunk semantics)
        paths = conf.get("paths") or [
            os.path.join(conf["path"], n)
            for n in sorted(os.listdir(conf["path"]))
            if n.endswith(".parquet")
        ]
        return spark.read.parquet(*paths)
    if stype == "excel":
        return read_excel(spark, conf["path"], skiprows=int(conf.get("skiprows", 0)))
    if stype == "database":
        return read_database(spark, conf)
    raise ValueError(f"unknown source type: {stype!r}")


def read_csv(spark: SparkSession, path: str, skiprows: int = 0) -> DataFrame:
    """CSV scan with the reference's ``skiprows`` option
    (profiling_pack/pack_conf.json:2-6).  Header is taken from the first
    non-skipped line; schema is inferred (reference relies on pandas
    inference)."""
    reader = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("mode", "PERMISSIVE")
    )
    if skiprows:
        # Spark's CSV reader has no skipRows; drop the first N physical
        # lines from PARTITION 0 ONLY.  textFile assigns lines to splits by
        # byte range, so the leading skip window always lives in the first
        # partition — no global sort, no exchange, every other partition
        # streams through untouched.  (The lines do take one Python pass
        # for the islice; bounded and shuffle-free, unlike the previous
        # orderBy(monotonically_increasing_id()) plan which sorted the
        # whole file.)
        from itertools import islice

        lines = spark.sparkContext.textFile(path)
        kept = lines.mapPartitionsWithIndex(
            lambda idx, it: islice(it, skiprows, None) if idx == 0 else it,
            preservesPartitioning=True,
        )
        return reader.csv(kept)
    return reader.csv(path)


def read_excel(spark: SparkSession, path: str, skiprows: int = 0) -> DataFrame:
    """Excel ingest: pandas on the driver (requires openpyxl — gated),
    then parallelized.  Excel files are small, human-made artifacts; the
    driver hop matches the reference's pandas read_excel path."""
    try:
        import pandas as pd  # noqa: F401
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover - env without openpyxl
        raise NotImplementedError(
            "excel sources need openpyxl (pip install openpyxl); "
            "not available in this environment"
        ) from e
    import pandas as pd

    pdf = pd.read_excel(path, skiprows=skiprows)  # pragma: no cover
    return spark.createDataFrame(pdf)  # pragma: no cover


def read_database(spark: SparkSession, conf: dict) -> DataFrame:
    """JDBC scan; ``table_or_query`` follows the reference contract
    (profiling_pack/main.py:140-145): a table name, a SQL string, a list
    of tables (caller iterates), or ``*`` (use list_tables first)."""
    toq = conf.get("table_or_query", "*")
    if isinstance(toq, list):
        raise ValueError(
            "list-valued table_or_query: resolve per-table with "
            "read_database({**conf, 'table_or_query': name}) per entry"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", conf["url"])
        .option("driver", conf.get("driver", ""))
    )
    for k, v in conf.get("properties", {}).items():
        reader = reader.option(k, v)
    if isinstance(toq, str) and toq.strip().lower().startswith("select"):
        return reader.option("query", toq).load()
    return reader.option("dbtable", toq).load()


def data_staleness_days(path: str, now: float | None = None) -> float:
    """File/folder mtime staleness probe (timeliness_pack/main.py:150-187):
    days since the newest file under ``path`` changed.  Driver-side by
    design — it is filesystem metadata, not data."""
    now = now if now is not None else time.time()
    if os.path.isfile(path):
        mtimes = [os.path.getmtime(path)]
    else:
        mtimes = [
            os.path.getmtime(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        ]
    if not mtimes:
        return float("inf")
    return (now - max(mtimes)) / 86400.0
