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
import re
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
        # lines by byte-range position.  textFile assigns lines to splits
        # by byte range, so the skip window occupies a PREFIX of the
        # partition sequence — but it may span MORE than partition 0 when
        # the preamble lines are long relative to the split size.  Count
        # lines of prefix partitions incrementally (runJob on exactly the
        # partitions needed — the tail of the file is never read twice)
        # and skip per-partition.  No global sort, no exchange.
        from itertools import islice

        sc = spark.sparkContext
        lines = sc.textFile(path)
        # per-partition skip budget: walk prefix partitions until the
        # cumulative line count covers the window
        skip_by_partition: dict[int, int] = {}
        remaining = skiprows
        for p in range(lines.getNumPartitions()):
            if remaining <= 0:
                break
            (cnt,) = sc.runJob(
                lines, lambda it: [sum(1 for _ in it)], [p]
            )
            take = min(remaining, cnt)
            skip_by_partition[p] = take
            remaining -= take
        if remaining > 0:
            raise ValueError(
                f"skiprows={skiprows} exceeds the file's line count"
            )

        def drop(idx, it, skips=skip_by_partition):
            n = skips.get(idx, 0)
            return islice(it, n, None) if n else it

        kept = lines.mapPartitionsWithIndex(drop, preservesPartitioning=True)
        return reader.csv(kept)
    return reader.csv(path)


def read_excel(spark: SparkSession, path: str, skiprows: int = 0) -> DataFrame:
    """Excel ingest: parsed on the driver, then parallelized.  Excel files
    are small, human-made artifacts; the driver hop matches the
    reference's pandas read_excel path.

    pandas+openpyxl when installed (dates, styles, multi-sheet); otherwise
    the pure-stdlib OOXML reader in io/xlsx.py — executable everywhere."""
    try:  # pragma: no cover - openpyxl absent in this environment
        import openpyxl  # noqa: F401
        import pandas as pd

        return spark.createDataFrame(pd.read_excel(path, skiprows=skiprows))
    except ImportError:
        pass
    from packs_spark.io.xlsx import read_xlsx

    header, rows = read_xlsx(path, skiprows=skiprows)
    if not header:
        raise ValueError(f"empty or headerless xlsx: {path}")
    # per-column type from the data: double if every non-null is numeric,
    # boolean if every non-null is bool, else string (pandas-like inference)
    cols = list(zip(*rows)) if rows else [()] * len(header)
    fields, coerce_str = [], set()
    for i, (name, vals) in enumerate(zip(header, cols)):
        nn = [v for v in vals if v is not None]
        if nn and all(isinstance(v, bool) for v in nn):
            t = "boolean"
        elif nn and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in nn
        ):
            t = "double"
        else:
            t = "string"
            coerce_str.add(i)
        fields.append(f"`{name}` {t}")
    data = [
        [
            (str(v) if i in coerce_str and v is not None else v)
            for i, v in enumerate(r)
        ]
        for r in rows
    ]
    return spark.createDataFrame(data, ", ".join(fields))


def read_database(spark: SparkSession, conf: dict) -> DataFrame:
    """Scan of ONE table or query from a database source.  For list /
    ``*`` valued ``table_or_query`` use :func:`load_database_sources`,
    which resolves to a dict of per-table DataFrames (the reference
    iterates datasets the same way, profiling_pack/main.py:140-145).

    ``sqlite:`` URLs are served in-process by the stdlib ``sqlite3``
    module — a REAL database engine, driver-side like the reference's
    pandas ``read_sql`` hop (dims are small by contract); everything
    else goes through Spark's JDBC source (postgres/mysql/mssql/oracle,
    the scale path — executors partition the scan).  The sandbox ships
    no JDBC driver jars and has no network, so the JDBC branch is
    integration-tested with fakes while the sqlite branch executes the
    full resolution contract against a live engine."""
    toq = conf.get("table_or_query", "*")
    if isinstance(toq, list) or toq == "*":
        raise ValueError(
            "list/'*' table_or_query resolves to MULTIPLE datasets — "
            "use load_database_sources(spark, conf)"
        )
    url = conf["url"]
    if url.startswith(("sqlite:", "jdbc:sqlite:")):
        return _read_sqlite(spark, url, toq)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", conf.get("driver", ""))
    )
    for k, v in conf.get("properties", {}).items():
        reader = reader.option(k, v)
    if isinstance(toq, str) and _is_query(toq):
        return reader.option("query", toq).load()
    return reader.option("dbtable", toq).load()


# a bare identifier can't be a SELECT statement: require a delimiter after
# the keyword so table names like "selections" route as tables, not SQL
_QUERY_RE = re.compile(r"^\s*select[\s(*]", re.IGNORECASE)


def _is_query(toq: str) -> bool:
    return bool(_QUERY_RE.match(toq))


def _sqlite_path(url: str) -> str:
    """'sqlite:/abs/db', 'sqlite:///rel.db' (sqlalchemy style), and
    'jdbc:sqlite:/abs/db' all resolve to the filesystem path."""
    path = url.removeprefix("jdbc:").removeprefix("sqlite:")
    if path.startswith("//"):  # sqlite:///x → x, sqlite:////abs → /abs
        path = path[2:].lstrip("/") if not path.startswith("////") else path[3:]
    return path


def _read_sqlite(spark: SparkSession, url: str, toq: str) -> DataFrame:
    import contextlib
    import sqlite3

    sql = (
        toq
        if _is_query(toq)
        # escape embedded double quotes in the identifier (SQL standard
        # doubling) so odd table names can't break the quoting
        else 'SELECT * FROM "{}"'.format(toq.replace('"', '""'))
    )
    # sqlite3's context manager only scopes the transaction, not the
    # connection — contextlib.closing prevents a leaked file handle per call
    with contextlib.closing(sqlite3.connect(_sqlite_path(url))) as con:
        cur = con.execute(sql)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    # sqlite is dynamically typed per VALUE; infer per column like the
    # excel reader (long when all-int, double when numeric, else string)
    cols = list(zip(*rows)) if rows else [()] * len(names)
    fields, casts = [], {}
    for i, (name, vals) in enumerate(zip(names, cols)):
        nn = [v for v in vals if v is not None]
        if nn and all(isinstance(v, int) for v in nn):
            t = "long"
        elif nn and all(isinstance(v, (int, float)) for v in nn):
            t, casts[i] = "double", float
        else:
            t, casts[i] = "string", str
        fields.append(f"`{name}` {t}")
    data = [
        [
            (casts[i](v) if i in casts and v is not None else v)
            for i, v in enumerate(r)
        ]
        for r in rows
    ]
    return spark.createDataFrame(data, ", ".join(fields))


# information_schema is ANSI SQL and served by postgres/mysql/mssql;
# pushed down as a JDBC subquery so only the name list crosses the wire.
_LIST_TABLES_SQL = (
    "SELECT table_name FROM information_schema.tables "
    "WHERE table_type = 'BASE TABLE' "
    "AND table_schema NOT IN ('pg_catalog', 'information_schema')"
)


_SQLITE_LIST_TABLES_SQL = (
    "SELECT name FROM sqlite_master WHERE type = 'table' "
    "AND name NOT LIKE 'sqlite_%'"
)


def list_tables(spark: SparkSession, conf: dict) -> list[str]:
    """All base-table names of a database source (the reference's ``*``
    expansion, profiling_pack/main.py:140-145).  One tiny metadata query —
    the table list is driver metadata by nature."""
    sql = (
        _SQLITE_LIST_TABLES_SQL
        if conf["url"].startswith(("sqlite:", "jdbc:sqlite:"))
        else _LIST_TABLES_SQL
    )
    names = read_database(spark, {**conf, "table_or_query": sql}).collect()
    return sorted(r[0] for r in names)


def load_database_sources(
    spark: SparkSession,
    conf: dict,
    _read=None,
    _list=None,
) -> dict[str, DataFrame]:
    """Resolve the full reference ``table_or_query`` contract to
    ``{dataset_name: DataFrame}``:

    * a SQL string / table name → one entry;
    * a list of names → one entry per name;
    * ``*`` (or missing) → every table from :func:`list_tables`.

    ``_read`` / ``_list`` are injectable for tests (no JDBC driver in the
    sandbox); production callers leave them default.
    """
    read = _read or read_database
    lister = _list or list_tables
    toq = conf.get("table_or_query", "*")
    if toq == "*":
        toq = lister(spark, conf)
    if isinstance(toq, list):
        return {
            name: read(spark, {**conf, "table_or_query": name}) for name in toq
        }
    name = toq if not toq.strip().lower().startswith("select") else "query"
    return {name: read(spark, conf)}


# Reference sampling policy constants (profiling_pack/main.py:26-28).
MAX_ROWS_FOR_FULL_PROFILE = 1_000_000
SAMPLE_SIZE_FOR_LARGE_DATASETS = 500_000


def head_sample(
    df: DataFrame,
    max_rows: int = MAX_ROWS_FOR_FULL_PROFILE,
    sample_to: int = SAMPLE_SIZE_FOR_LARGE_DATASETS,
    n_rows: int | None = None,
) -> tuple[DataFrame, bool, int]:
    """S5: the reference's deterministic head-sampling policy — datasets
    over ``max_rows`` are processed on the first ``sample_to`` rows
    (``head``, not random; profiling_pack/main.py:26-28,94-116).

    Returns ``(df, sampled, n_rows)``.  ``limit`` plans as CollectLimit
    (scan short-circuits at the cap).  Pass ``n_rows`` when the caller
    already knows the count (parquet footers make ``df.count()`` cheap,
    but not free).  Engine queries default to FULL exact passes; this
    policy is opt-in parity with the reference's behavior.
    """
    n = n_rows if n_rows is not None else df.count()
    if n > max_rows:
        return df.limit(sample_to), True, n
    return df, False, n


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
