"""Sinks (SURVEY.md §2.1 K1-K5).

- K1 Parquet sink: native, snappy default; partitioned layers use
  ``partitionBy`` + dynamic partition overwrite (the reference's
  manual ``<YYYYMMDD>`` directories become real partitions).
- K2 JSON sink: native.
- K3 ES bulk sink: the reference row-iterates + ``helpers.bulk``
  (``dags/lib/index_to_es.py:81-341``). Here: ``foreachPartition``
  batching behind a pluggable transport so the engine has no hard ES
  dependency (import-gated); document *shape* correctness lives in
  operators/documents.py and is tested on DataFrames.
- K5 state checkpoint: streaming/watermark.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """K1 (+X3/X6): snappy Parquet; with partitions, only touched
    partitions are replaced (dynamic overwrite)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: newline-delimited JSON (the scalable form of the raw
    layer's array files)."""
    df.write.mode(mode).json(path)


def bulk_sink(
    df: DataFrame,
    send_batch: Callable[[list[dict]], None],
    batch_size: int = 1000,
) -> None:
    """K3 generalized: per-partition batched delivery to any bulk
    transport (ES, HTTP, queue). The reference's 1000/5000-doc flush
    thresholds (``index_to_es.py:128,184,271,331``) become the
    ``batch_size``. Executor-side batching — the driver never sees
    rows."""

    def _send(rows: Iterator[Row]) -> None:
        buf: list[dict] = []
        for r in rows:
            buf.append(r.asDict(recursive=True))
            if len(buf) >= batch_size:
                send_batch(buf)
                buf = []
        if buf:
            send_batch(buf)

    df.foreachPartition(_send)


def es_bulk_sink(
    df: DataFrame,
    index: str,
    id_col: str | None = None,
    hosts: str = "http://localhost:9200",
    batch_size: int = 1000,
) -> None:
    """K3/K4: Elasticsearch adapter — import-gated; raises with a clear
    message when the client isn't installed (it isn't in this image).
    Mirrors the reference's action shape (``_index``/``_id``/``_source``,
    ``index_to_es.py:117-127``)."""
    try:
        from elasticsearch import Elasticsearch, helpers  # noqa: F401
    except ImportError as e:  # pragma: no cover - not installed here
        raise NotImplementedError(
            "elasticsearch client not available in this environment; "
            "bulk_sink() with a custom transport is the supported path"
        ) from e

    def _send(batch: list[dict]) -> None:  # pragma: no cover
        es = Elasticsearch(hosts)
        actions = [
            {
                "_index": index,
                **({"_id": str(doc[id_col])} if id_col else {}),
                "_source": doc,
            }
            for doc in batch
        ]
        helpers.bulk(es, actions)

    bulk_sink(df, _send, batch_size=batch_size)
