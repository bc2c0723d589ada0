"""Structured Streaming twins: availableNow runs must match batch results."""

import os

import pytest
from pyspark.sql import functions as F

from packs_spark.streaming.pipeline import (
    stream_webtext,
    stream_windowed_event_counts,
    windowed_event_counts,
)


def test_stream_windowed_matches_batch(spark, sf_dir, tmp_path):
    # file stream sources require a directory
    src = str(tmp_path / "src")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_windowed_event_counts(spark, src, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = windowed_event_counts(spark.read.parquet(src))
    g = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in got.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    # append mode emits only windows finalized by the watermark — the last
    # windows stay in state; everything emitted must match batch exactly
    assert len(g) > 0
    for k, v in g.items():
        assert b[k] == v, (k, v, b[k])
    max_ws = max(ws for ws, _ in b)
    held_back = {k for k in b if k not in g}
    import datetime

    for ws, _ in held_back:
        assert ws >= max_ws - datetime.timedelta(hours=2), (ws, max_ws)


def test_stream_webtext_filters_and_scrubs(spark, tmp_path):
    from packs_spark.pipeline.generate import generate_pages

    srcdir = str(tmp_path / "src")
    os.makedirs(srcdir)
    pdf = generate_pages(500, seed=11, n_hosts=10)
    spark.createDataFrame(pdf).write.parquet(srcdir, mode="overwrite")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_webtext(spark, srcdir, out, ck)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert got.count() == 500
    assert "text_scrubbed" in got.columns and "lang_pred" in got.columns
    # incremental pickup: drop more files, re-trigger
    pdf2 = generate_pages(200, seed=12, n_hosts=10)
    spark.createDataFrame(pdf2).write.parquet(srcdir, mode="append")
    q2 = stream_webtext(spark, srcdir, out, ck)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == 700  # only new rows processed


def test_stream_webtext_keep_labels_match_batch(spark, tmp_path):
    """Stream/batch parity: a document gets the SAME keep/drop decision
    and scrubbed text whether it arrives by streaming ingest or by the
    batch backfill pipeline (both run the fused enrich UDF + the same
    threshold rule)."""
    from packs_spark.pipeline.generate import generate_pages
    from packs_spark.pipeline.webtext import run_batch

    srcdir = str(tmp_path / "src")
    os.makedirs(srcdir)
    pdf = generate_pages(400, seed=21, n_hosts=8)
    spark.createDataFrame(pdf).write.parquet(srcdir, mode="overwrite")

    q = stream_webtext(
        spark, srcdir, str(tmp_path / "s_out"), str(tmp_path / "s_ck")
    )
    q.awaitTermination(180)
    run_batch(spark, srcdir, str(tmp_path / "b_out"), n_buckets=8)

    s = {
        r["url"]: (r["keep"], r["text_scrubbed"])
        for r in spark.read.parquet(str(tmp_path / "s_out")).collect()
    }
    b = {
        r["url"]: (r["keep"], r["text_scrubbed"])
        for r in spark.read.parquet(str(tmp_path / "b_out")).collect()
    }
    assert s == b and len(s) == 400


def test_multimodal_metadata(spark, tmp_path):
    from packs_spark.operators.multimodal import FEATURE_DIM, extract_metadata
    from packs_spark.pipeline.generate import generate_pages

    df = spark.createDataFrame(generate_pages(200, seed=3, n_hosts=5))
    meta = extract_metadata(df, "html", "url")
    rows = meta.collect()
    assert len(rows) == 200
    for r in rows[:20]:
        assert r["format"] == "html"
        assert r["n_bytes"] > 0
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-3  # L1-normalized histogram


def test_multimodal_decode_unsupported_raises():
    # corrupt PNG magic / non-WAVE RIFF fall through the stdlib decoders
    # to the dependency-naming error (real decode paths: tests/test_codecs.py)
    from packs_spark.operators.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF....")


def test_stream_sessionize_matches_batch_closed_sessions(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization emits each CLOSED session
    exactly once; every emitted session must match the batch recomputation
    (each user's final session legitimately stays in state)."""
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from packs_spark.streaming.pipeline import sessionize_stream

    src = str(tmp_path / "src")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id") < 20
    )
    events.write.parquet(src)

    out = str(tmp_path / "out")
    q = (
        sessionize_stream(spark, src, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()

    # batch truth: gap-based sessions per user, drop each user's LAST
    # session (still open in streaming state)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = events.withColumn(
        "sid", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    per = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )
    last = per.groupby("user_id")["sid"].transform("max")
    closed = per[per.sid != last]

    def key(df, s, e, n):
        return {
            (int(r["user_id"]), round(float(r[s]), 6), round(float(r[e]), 6), int(r[n]))
            for _, r in df.iterrows()
        }

    got_keys = key(
        got.assign(
            start_us=got.session_start * 1e6, end_us=got.session_end * 1e6
        ),
        "start_us", "end_us", "n_events",
    )
    want_keys = key(closed, "start_us", "end_us", "n_events")
    assert len(want_keys) > 0
    assert got_keys == want_keys


def test_multimodal_frame_sample_shape(spark):
    """1->N explode shape of a video frame sampler: id rides along, frame
    indices dense from 0, payload-derived frame bytes, typed schema."""
    from packs_spark.operators.multimodal import frame_sample

    rows = [
        ("u1", bytes(range(256)) * 2),  # 512 bytes -> 17 frames, capped 10
        ("u2", b"xy"),                  # too short -> 0 frames
        ("u3", None),                   # null payload -> 0 frames
        ("u4", bytes(100)),             # 100 // 30 = 3 frames
    ]
    df = spark.createDataFrame(rows, ["url", "payload"])
    out = frame_sample(df, "payload", "url", every_n=30, max_frames=10)
    got = out.groupBy("url").count().collect()
    counts = {r.url: r["count"] for r in got}
    assert counts == {"u1": 10, "u4": 3}
    one = out.where("url = 'u4' and frame_idx = 1").first()
    assert one.frame_bytes == bytes(100)[1:17]
    assert dict(out.dtypes)["frame_bytes"] == "binary"


def test_multimodal_resize_fixed_output(spark):
    """1->1 map shape of an image resizer: fixed 64*64-byte output for any
    input size, nulls padded, one row per input."""
    from packs_spark.operators.multimodal import resize_images

    rows = [("a", bytes(range(256)) * 40), ("b", b"abc"), ("c", None)]
    df = spark.createDataFrame(rows, ["url", "payload"])
    out = resize_images(df, "payload", "url", target=(64, 64)).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (64, 64)
        assert len(r.resized) == 64 * 64


def test_stream_dedup_exact_keeps_one_per_text(spark, tmp_path):
    """Streaming exact dedup via dropDuplicatesWithinWatermark: duplicate
    texts within the horizon collapse to one row; distinct texts all
    survive."""
    import datetime

    import pandas as pd

    from packs_spark.streaming.pipeline import stream_dedup_exact

    t0 = datetime.datetime(2025, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        text = f"unique document number {i % 10}"  # 10 distinct texts
        rows.append(
            {
                "url": f"https://h{i}.example.com/",
                "warc_ts": t0 + datetime.timedelta(minutes=i),
                "html": b"<html>",
                "text": text,
                "lang": "en",
            }
        )
    src = str(tmp_path / "src")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = stream_dedup_exact(spark, src, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = [r.text for r in got.collect()]
    assert sorted(set(texts)) == sorted(
        f"unique document number {i}" for i in range(10)
    )
    assert len(texts) == 10  # exactly one survivor per text hash
