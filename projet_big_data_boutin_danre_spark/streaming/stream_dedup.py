"""Structured Streaming variants (SURVEY.md §2.9 ST1/ST3).

The file-source micro-batch pipeline: read a directory as a stream,
apply event-time watermarking, drop late rows and duplicate ids, and
run windowed aggregations — the managed-state version of the
reference's hand-rolled watermark file + keep-last dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_stream(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """ST1: file-source stream (each new file = one micro-batch input;
    the production swap is Kafka — same downstream plan)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def dedup_stream(
    stream: DataFrame, id_col: str, ts_col: str, lateness: str = "1 hour"
) -> DataFrame:
    """ST3: late rows beyond ``lateness`` dropped by the watermark;
    duplicate ids within the watermark window dropped with managed
    state (``dropDuplicates`` post-``withWatermark`` bounds the state
    store — mandatory at scale, unbounded state otherwise)."""
    return stream.withWatermark(ts_col, lateness).dropDuplicates([id_col])


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "5 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window keyed counts + sum — the streaming analog of the
    usage-layer aggregate, with late data handled by the watermark."""
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
    )


def run_to_completion(agg: DataFrame, query_name: str) -> DataFrame:
    """Drive a bounded file-source stream to completion synchronously
    (memory sink) and return the materialized result — the local-test
    harness for streaming plans."""
    spark = agg.sparkSession
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
