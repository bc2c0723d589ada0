"""spark-submit entry point for the web-text quality-filter pipeline.

The north rule's deployment contract: ``spark-submit --py-files`` on a
multi-executor cluster.  Usage:

    zip -r packs_spark.zip packs_spark                # ship the package
    spark-submit --master <cluster> \\
        --py-files packs_spark.zip \\
        submit_main.py \\
        --input  <parquet/iceberg path of (url, warc_ts, html, text, lang)> \\
        --output <table root> \\
        --buckets 4096 --run-id 2026-08-16 \\
        [--thresholds '{"max_ppl": 900}'] [--wave-size 512]

Everything cluster-shaped lives in the package (bucketing, salting,
checkpointed commit); this file only parses args, builds the session, and
prints the run's stats JSON on stdout.  Re-running with the same
--output/--run-id resumes: committed buckets are skipped via the commit
log, which is what makes a 10^12-doc run restartable.

Tested end-to-end (real ``spark-submit --py-files`` subprocess) in
tests/test_submit.py.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="source parquet path")
    p.add_argument("--output", required=True, help="output table root")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--run-id", default="run-0")
    p.add_argument("--thresholds", default=None,
                   help="JSON dict overriding DEFAULT_THRESHOLDS")
    p.add_argument("--wave-size", type=int, default=None,
                   help="buckets per commit wave (bounds lost work on kill)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    # import AFTER spark-submit has put --py-files on sys.path
    from pyspark.sql import SparkSession

    from packs_spark.pipeline.webtext import run_batch

    spark = SparkSession.builder.appName(
        f"webtext-quality-filter-{args.run_id}"
    ).getOrCreate()
    thresholds = json.loads(args.thresholds) if args.thresholds else None
    stats = run_batch(
        spark,
        args.input,
        args.output,
        n_buckets=args.buckets,
        run_id=args.run_id,
        thresholds=thresholds,
        wave_size=args.wave_size,
    )
    print(json.dumps({"run_id": args.run_id, **stats}))


if __name__ == "__main__":
    main()
