"""packs_spark — a PySpark-native data-quality / web-text analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the QALITA "packs" reference (18 pandas data-quality jobs,
see SURVEY.md) as an idiomatic Spark engine:

* every quality check is a declarative ``pyspark.sql`` Column expression or
  aggregate, batched into single-pass ``df.agg`` plans that Catalyst can
  prune/push down (reference: imperative pandas loops);
* the chunk-aggregation layer of the reference
  (``qalita_core.aggregation``) disappears entirely — Spark's partial/final
  hash aggregation is the native equivalent;
* model-backed stages (language-ID, perplexity) are vectorized pandas/Arrow
  UDFs with per-executor lazily-initialized broadcast models — no per-row
  Python anywhere;
* the north-star web-text pipeline (langid → quality heuristics →
  PII/toxicity scrub → keep/drop) runs over a Common-Crawl-style table
  ``(url, warc_ts, html, text, lang)`` partitioned by url-hash bucket with
  salting for hot hosts and per-partition resumable checkpoints.

Layout:
    session      SparkSession factory tuned for local[N] and cluster use
    functions/   scalar Column-expression library (text, numeric, patterns)
    operators/   pack-equivalent operators (profiling, duplicates, drift, …)
    pipeline/    the web-text quality-filter pipeline (north star)
    ml/          langid + char-ngram perplexity models (pure numpy/pandas)
    io/          readers, envelope writer, checkpointed lakehouse writer
    streaming/   Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"

from packs_spark.session import get_spark  # noqa: F401
