"""Web-text quality-filter pipeline (the north star).

Stages over a Common-Crawl-style table (url, warc_ts, html, text, lang):

  1. extract      — html → text (already extracted in the input contract;
                    the html column is carried as opaque binary + used for
                    byte-parity verification)
  2. langid       — char-ngram language ID, vectorized pandas UDF with a
                    per-executor lazily-loaded broadcast model
  3. perplexity   — char-ngram LM score, same UDF pattern
  4. heuristics   — Gopher/C4-style Column-expression rules (pipeline.rules)
  5. scrub        — Python-`re` PII/toxicity scrub in a pandas UDF
                    (byte-parity with the reference patterns)
  6. keep/drop    — conjunction of rule outcomes + model thresholds
  7. write        — partitioned by url-hash bucket (salted for hot hosts),
                    per-partition metrics + lineage, resumable checkpoints
                    (packs_spark.io.lakehouse)

``run_batch`` is the full pipeline; ``flagship_summary`` is the compact
driver smoke query over the generic ``documents`` testdata table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from packs_spark.pipeline import rules

# default model thresholds (see packs_spark/pipeline/README.md)
DEFAULT_THRESHOLDS = dict(
    min_margin=0.05,  # langid confidence: best-vs-runner-up mean logprob gap
    # char-trigram perplexity ceiling: the sparse-seed trigram LM scores
    # in-distribution prose ~3-4.5k and letter-gibberish ~20k+ (the absolute
    # level is set by Laplace smoothing over 27^3 codes, not by fluency) —
    # the threshold separates the two modes
    max_ppl=8000.0,
)


def run_batch(
    spark: SparkSession,
    source: DataFrame | str,
    output_path: str,
    n_buckets: int = 64,
    run_id: str = "run-0",
    thresholds: dict | None = None,
    wave_size: int | None = None,
) -> dict:
    """Full quality-filter pipeline over a (url, warc_ts, html, text, lang)
    table: langid → perplexity → heuristics → scrub → keep/drop → bucketed,
    checkpointed, resumable parquet write with lineage + per-bucket metrics.

    Returns the CheckpointedWriter stats dict (buckets written/skipped).
    """
    from packs_spark.io.lakehouse import CheckpointedWriter
    from packs_spark.pipeline.partitioning import url_bucket
    from packs_spark.pipeline.udfs import (
        make_langid_udf,
        make_perplexity_udf,
        make_scrub_udf,
    )

    t = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    df = spark.read.parquet(source) if isinstance(source, str) else source

    df = df.withColumn("bucket", url_bucket(F.col("url"), n_buckets))

    langid_udf = make_langid_udf(spark)
    ppl_udf = make_perplexity_udf(spark)
    scrub_udf = make_scrub_udf()

    enriched = (
        quality_columns(df)
        .withColumn("__lid", langid_udf(F.col("text")))
        .withColumn("ppl", ppl_udf(F.col("text")))
        .withColumn("__scrub", scrub_udf(F.col("text")))
        .select(
            "*",
            F.col("__lid.lang").alias("lang_pred"),
            F.col("__lid.margin").alias("lang_margin"),
            F.col("__scrub.scrubbed").alias("text_scrubbed"),
            F.col("__scrub.spans").alias("scrub_spans"),
            F.col("__scrub.n_hits").alias("pii_hits"),
        )
        .drop("__lid", "__scrub")
    )

    labeled = enriched.withColumn(
        "keep",
        F.col("keep")  # heuristic conjunction from quality_columns
        & (F.col("lang_pred") != "unknown")
        & (F.col("lang_margin") >= t["min_margin"])
        & (F.col("ppl") <= t["max_ppl"]),
    ).withColumn("run_id", F.lit(run_id))

    writer = CheckpointedWriter(output_path, n_buckets)
    stats = writer.write_resumable(labeled, wave_size=wave_size)

    # per-bucket rule-level metrics (north rule: per-partition metrics),
    # computed from the committed table so metrics always reflect what was
    # actually written
    written = spark.read.parquet(output_path)
    metrics = written.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
        F.sum((F.col("pii_hits") > 0).cast("long")).alias("n_docs_with_pii"),
        F.sum("pii_hits").alias("total_pii_hits"),
        F.round(F.avg("ppl"), 4).alias("avg_ppl"),
        F.round(F.avg(F.col("q_symbol_ratio")), 6).alias("avg_symbol_ratio"),
    )
    metrics.withColumn("run_id", F.lit(run_id)).write.mode("overwrite").parquet(
        f"{output_path}_metrics"
    )
    return stats


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach heuristic quality-signal columns (all JVM-side expressions)."""
    c = F.col(text_col)
    return (
        df.withColumn("q_n_chars", rules.n_chars(c))
        .withColumn("q_n_words", rules.n_words(c))
        .withColumn("q_symbol_ratio", rules.symbol_ratio(c))
        .withColumn("q_stopword_ratio", rules.stopword_ratio(c))
        .withColumn("q_distinct_ratio", rules.distinct_word_ratio(c))
        .withColumn("keep", rules.keep_mask(c))
    )


def flagship_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep/drop + mean quality signals over `documents`."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = quality_columns(df)
    return (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.round(F.avg(F.col("keep").cast("double")), 4).alias("keep_rate"),
            F.round(F.avg("q_n_chars"), 2).alias("avg_chars"),
            F.round(F.avg("q_symbol_ratio"), 4).alias("avg_symbol_ratio"),
            F.round(F.avg("q_stopword_ratio"), 4).alias("avg_stopword_ratio"),
            F.round(F.avg("q_distinct_ratio"), 4).alias("avg_distinct_ratio"),
        )
        .orderBy("source")
    )
