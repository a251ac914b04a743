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
    store — mandatory at scale, unbounded state otherwise).

    NOTE: ``dropDuplicates`` keeps the FIRST-arriving row per id —
    arrival-order dependent. When the batch layer's deterministic
    keep-last semantics (A2, ``operators/cleaning.keep_last_dedup``)
    must hold on the stream too, use ``dedup_stream_keep_last``."""
    return stream.withWatermark(ts_col, lateness).dropDuplicates([id_col])


def dedup_stream_keep_last(
    stream: DataFrame,
    id_col: str,
    ts_col: str,
    lateness: str = "1 hour",
    tiebreak: tuple[str, ...] = (),
    emit: str = "update",
) -> DataFrame:
    """Deterministic keep-last dedup on a stream — the streaming twin
    of batch A2 (``operators/cleaning.keep_last_dedup``): per id, the
    row with the greatest ``(ts, *tiebreak)`` wins, independent of
    arrival/partition order (where ``dropDuplicates`` keeps an
    arbitrary first arrival).

    Custom stateful operator (``applyInPandasWithState``): per-id
    managed state holds only the current best row (timestamps stored
    as epoch-ms); every state entry carries an event-time timeout at
    ``best_ts + lateness``, so state is bounded by the watermark
    horizon exactly like ``dropDuplicates`` state.

    ``emit="update"`` yields the current winner whenever a batch
    touches the id (run the sink in update mode; the last update per
    id equals the batch keep-last result). ``emit="final"`` yields
    each id's winner exactly once, when its timeout expires — i.e.
    when the watermark guarantees no non-late row can still beat it.

    Scale: one shuffle on the id (same as batch A2), state one row per
    live id, Arrow-batched. Nested struct/array payload columns are
    not supported in state (atomic + timestamp columns are) — project
    them out or serialize before deduping."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .epoch import epoch_ms_to_naive, scalar_to_epoch_ms

    if emit not in ("update", "final"):
        raise ValueError(f"unknown emit mode {emit!r}")
    # Arrow hands timestamps as naive SESSION wall time; state stores
    # TRUE epoch ms so the event-time timeout math lines up with the
    # watermark on a non-UTC session (see streaming/epoch.py)
    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")
    fields = stream.schema.fields
    names = [f.name for f in fields]
    ts_names = {
        f.name
        for f in fields
        if f.dataType.simpleString().startswith("timestamp")
    }
    if ts_col not in ts_names:
        raise ValueError(f"{ts_col!r} must be a timestamp column")
    nested = [
        f.name
        for f in fields
        if f.dataType.simpleString().split("<")[0]
        in ("struct", "array", "map")
    ]
    if nested:
        raise ValueError(
            f"nested columns {nested} cannot ride keep-last state; project "
            "them out (or to_json them) before dedup and join back after"
        )
    state_schema = ", ".join(
        f"`{f.name}` bigint"
        if f.name in ts_names
        else f"`{f.name}` {f.dataType.simpleString()}"
        for f in fields
    )
    lateness_ms = int(pd.Timedelta(lateness).total_seconds() * 1000)
    order_cols = [ts_col, *tiebreak]

    def _order_key(vals: dict) -> tuple:
        # None sorts below any value — desc_nulls_last, like batch A2
        return tuple(
            (vals[c] is not None, vals[c]) for c in order_cols
        )

    def _to_state(row: dict) -> dict:
        out = {}
        for c, v in row.items():
            if v is not None and pd.isna(v):
                v = None
            elif c in ts_names:
                v = scalar_to_epoch_ms(v, tz)
            elif hasattr(v, "item"):  # numpy scalar -> Python scalar
                v = v.item()
            out[c] = v
        return out

    def _emit_frame(vals: dict) -> pd.DataFrame:
        cols = {}
        for c in names:
            v = vals[c]
            if c in ts_names:
                v = pd.NaT if v is None else epoch_ms_to_naive(v, tz)
            cols[c] = [v]
        return pd.DataFrame(cols)

    def _fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # watermark passed best_ts + lateness: the winner is final
            if emit == "final" and state.exists:
                yield _emit_frame(dict(zip(names, state.get)))
            state.remove()
            return
        best = dict(zip(names, state.get)) if state.exists else None
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            pdf = pdf.sort_values(
                order_cols, ascending=False, na_position="last", kind="stable"
            )
            cand = _to_state(pdf.iloc[0].to_dict())
            if best is None or _order_key(cand) > _order_key(best):
                best = cand
        if best is None:
            state.remove()
            return
        state.update(tuple(best[c] for c in names))
        wm = state.getCurrentWatermarkMs()
        ts_ms = best[ts_col] if best[ts_col] is not None else wm
        state.setTimeoutTimestamp(max(ts_ms + lateness_ms, wm + 1))
        if emit == "update" and touched:
            yield _emit_frame(best)

    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(id_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=stream.schema,
            stateStructType=state_schema,
            outputMode=emit if emit == "update" else "append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "5 minutes",
    lateness: str = "10 minutes",
    slide: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Windowed keyed counts + sum — the streaming analog of the
    usage-layer aggregate, with late data handled by the watermark.
    Tumbling by default; pass ``slide`` for hopping windows (an event
    lands in window/slide windows — the streaming twin of the batch
    ``time_windows`` sliding branch). ``value_col`` names the summed
    column (a parameter like the others, not a hardcoded name)."""
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(win, F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total_value"),
        )
    )


def stream_index_documents(
    stream: DataFrame,
    index: str,
    send_actions,
    id_key: str | None = None,
    batch_size: int = 1000,
    checkpoint: str | None = None,
    query_name: str = "stream_index",
):
    """Streaming twin of the pipeline's index fan-out: deliver each
    micro-batch as reference-shaped bulk actions through the pluggable
    transport (``sources/sinks.index_documents``) via ``foreachBatch``.
    Checkpointing makes delivery at-least-once per micro-batch — the
    same guarantee the reference's cron re-runs give, with per-doc
    ``_id`` making replays idempotent on the ES side. Returns the
    started StreamingQuery (caller stops it)."""
    from ..sources.sinks import index_documents

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        index_documents(
            batch_df, index, send_actions, id_key=id_key, batch_size=batch_size
        )

    writer = stream.writeStream.foreachBatch(_sink).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


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
