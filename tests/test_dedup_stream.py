"""Streaming dedup (dropDuplicatesWithinWatermark): live file-source runs
matching the batch dedup twin."""

import pytest
from pyspark.sql import functions as F


def _run_stream(spark, out_df, ckpt):
    rows = []
    q = (
        out_df.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return rows


def test_dedup_stream_exact_key(spark, tmp_path):
    from kolibrie_spark.streaming.dedup_stream import dedup_stream

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    batch = [
        ("a", 100, "first-a"),
        ("a", 105, "dup-a"),
        ("b", 110, "first-b"),
        ("b", 111, "dup-b"),
        ("c", 120, "only-c"),
    ]
    df = spark.createDataFrame(batch, "k string, t long, payload string").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    rows = _run_stream(
        spark, dedup_stream(stream, ["k"], "ts", watermark="1 minute"), ckpt
    )
    # one survivor per key
    assert sorted(r.k for r in rows) == ["a", "b", "c"]
    with pytest.raises(ValueError):
        dedup_stream(stream, [], "ts")


def test_dedup_stream_by_content_matches_batch_fingerprint(spark, tmp_path):
    from kolibrie_spark.operators.textanalysis import doc_fingerprint
    from kolibrie_spark.streaming.dedup_stream import dedup_stream_by_content

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    batch = [
        (1, 100, "the same   doc"),
        (2, 101, "THE SAME doc"),  # same normalized fingerprint as 1
        (3, 102, "a different doc"),
        (4, 103, "the same doc"),  # also same as 1
    ]
    df = spark.createDataFrame(batch, "id long, t long, text string").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    rows = _run_stream(
        spark, dedup_stream_by_content(stream, "text", "ts"), ckpt
    )
    # exactly one survivor per distinct fingerprint, fingerprints match batch
    n_fp = (
        df.select(doc_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert len(rows) == n_fp == 2
    assert "__fp" not in rows[0].asDict()
