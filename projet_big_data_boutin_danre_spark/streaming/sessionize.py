"""Streaming sessionization (engine extension; batch analog is
``__spark_entry__.q_sessionize``).

Two implementations with different trade-offs:

- ``session_counts``: the built-in ``session_window`` gap window —
  fully JVM-side, managed state, the default choice.
- ``sessionize_stateful``: the same semantics as a CUSTOM stateful
  operator via ``applyInPandasWithState`` — the pattern for session
  logic the built-in window can't express (per-session derived
  metrics, conditional gaps, session-scoped dedup). Sessions are held
  in managed per-key state and emitted only once the event-time
  watermark passes ``session_end + gap``, so late events within the
  allowed lateness still join their session; the trailing open
  session is flushed by an event-time timeout.

State is bounded: per key, only the timestamps of still-open sessions
(≤ watermark horizon) are buffered; closed sessions leave state the
batch they are emitted.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    lateness: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via the native ``session_window`` — merging
    windows with managed state, watermark-bounded."""
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_stateful(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_sec: int = 1800,
    lateness: str = "30 minutes",
) -> DataFrame:
    """Custom stateful sessionizer (``applyInPandasWithState``).

    Per key, buffer open-session event timestamps in state; on every
    trigger re-split the buffer by gap and emit each session whose
    ``last_event + gap`` the watermark has passed (it can no longer
    change). The trailing session is flushed by an event-time timeout
    at its close point. Output rows: one per CLOSED session.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_sec * 1000

    def _sessions(ts_sorted: list) -> list:
        """Split sorted ms timestamps into [start, last, n] runs."""
        out = []
        for t in ts_sorted:
            if out and t - out[-1][1] <= gap_ms:
                out[-1][1] = t
                out[-1][2] += 1
            else:
                out.append([t, t, 1])
        return out

    def _fn(
        key: Tuple[Any], pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        buf = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000
                buf.extend(int(t) for t in ts)
        buf.sort()
        wm = state.getCurrentWatermarkMs()
        closed, open_sessions, still_open = [], [], []
        for start, last, n in _sessions(buf):
            if last + gap_ms <= wm:
                closed.append((start, last, n))
            else:
                open_sessions.append((start, last, n))
                still_open.extend(
                    t for t in buf if start <= t <= last
                )
        if still_open:
            state.update((still_open,))
            # Flush point = the EARLIEST open session's close point
            # (always > watermark, else it would have closed above).
            # Using the trailing session here would deadlock: an
            # earlier open session would wait on a timeout the
            # watermark may never reach.
            state.setTimeoutTimestamp(open_sessions[0][1] + gap_ms)
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="ms"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="ms"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    key_type = stream.schema[key_col].dataType.simpleString()
    return (
        stream.withWatermark(ts_col, lateness)
        .groupBy(key_col)
        .applyInPandasWithState(
            _fn,
            outputStructType=(
                f"{key_col} {key_type}, session_start timestamp, "
                "session_end timestamp, n_events int"
            ),
            stateStructType="ts_buf array<bigint>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
