"""Phase-level scaling probe: where does the 8→32-core speedup go?

Times three nested slices of the pipeline at one parallelism level
(run under taskset with matching SPARK_GRAFT_CPUS):

  enrich   read → quality columns → fused UDF → agg      (no shuffle)
  shuffle  + repartitionByRange(bucket)                    (adds the shuffle)
  full     run_batch (adds bucketed write + metrics job)

Usage: taskset -c 0-7 python tools/profile_scaling.py 8 500000
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_BUCKETS = 128  # identical at both legs — same job, different cores


def phase_enrich(spark, src, with_shuffle: bool):
    from packs_spark.pipeline.udfs import make_enrich_udf
    from packs_spark.pipeline.partitioning import url_bucket
    from packs_spark.pipeline.webtext import quality_columns

    df = spark.read.parquet(src).withColumn(
        "bucket", url_bucket(F.col("url"), N_BUCKETS)
    )
    if with_shuffle:
        df = df.repartitionByRange(N_BUCKETS, "bucket")
    enrich = make_enrich_udf(spark)
    out = (
        quality_columns(df)
        .withColumn("__e", enrich(F.col("text")))
        .agg(
            F.sum(F.col("keep").cast("long")),
            F.sum("__e.n_hits"),
            F.sum(F.length("__e.scrubbed")),
        )
    )
    out.collect()


def main():
    cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
    from packs_spark.pipeline.generate import write_pages_parquet
    from packs_spark.pipeline.webtext import run_batch
    from packs_spark.session import get_spark

    src = os.path.join(REPO, "BENCH", "data", f"webpages_{n_docs}.parquet")
    if not os.path.exists(src):
        os.makedirs(os.path.dirname(src), exist_ok=True)
        write_pages_parquet(src, n_docs, seed=42, n_hosts=5000)

    spark = get_spark(
        f"profile_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    out = tempfile.mkdtemp(prefix="profile_webtext_")
    res = {"cpus": cpus, "docs": n_docs}
    try:
        # warmup: full pipeline once (codegen, python workers, page cache)
        run_batch(spark, src, os.path.join(out, "warm"),
                  n_buckets=N_BUCKETS, run_id="warm")

        for name, fn in [
            ("enrich", lambda: phase_enrich(spark, src, False)),
            ("shuffle_enrich", lambda: phase_enrich(spark, src, True)),
        ]:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            res[name] = round(best, 2)

        best = float("inf")
        for i in range(2):
            p = os.path.join(out, f"full{i}")
            t0 = time.time()
            run_batch(spark, src, p, n_buckets=N_BUCKETS, run_id=f"p{i}")
            best = min(best, time.time() - t0)
            shutil.rmtree(p, ignore_errors=True)
        res["full"] = round(best, 2)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
