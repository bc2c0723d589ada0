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
