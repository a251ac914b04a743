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

State is bounded: per key, only [start, last, n] RUN SUMMARIES of
still-open sessions are held (≤ watermark-horizon/gap runs — NOT one
entry per event, so a continuously-active key can't grow state without
bound); closed sessions leave state the batch they are emitted.
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

    Per key, hold open-session [start, last, n] run summaries in
    state; on every trigger merge in the batch's runs and emit each
    session whose ``last_event + gap`` the watermark has passed (it
    can no longer change). The trailing session is flushed by an
    event-time timeout at its close point. Output rows: one per
    CLOSED session.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .epoch import epoch_ms_to_naive, series_to_epoch_ms

    gap_ms = gap_sec * 1000
    # Captured at plan-build time: Arrow delivers ts as naive SESSION
    # wall time, but GroupState's watermark/timeout are true epoch ms
    # — anchor through the session TZ or a non-UTC session closes
    # sessions offset-early/late (see streaming/epoch.py)
    tz = stream.sparkSession.conf.get("spark.sql.session.timeZone")

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

    def _merge_runs(runs: list) -> list:
        """Merge [start, last, n] runs whose boundary gap is within
        ``gap_ms``. Equivalent to re-splitting the raw sorted event
        list: gap-splitting depends only on sorted adjacency, a run's
        internal gaps are ≤ gap by construction, and an event landing
        inside another run's [start, last] span can never split it —
        so run summaries are a LOSSLESS state representation, bounded
        by (watermark horizon / gap) runs per key instead of one entry
        per buffered event (a continuously-active key would otherwise
        grow state without bound)."""
        runs.sort()
        out: list = []
        for s, last, n in runs:
            if out and s - out[-1][1] <= gap_ms:
                out[-1][1] = max(out[-1][1], last)
                out[-1][2] += n
            else:
                out.append([s, last, n])
        return out

    # State-format version sentinel: the buffer holds [MAGIC, s, last,
    # n, s, last, n, ...]. An earlier format stored raw timestamps in
    # the same array<bigint> column; parsing that as stride-3 triples
    # would emit garbage sessions or crash mid-batch. MAGIC is a value
    # no epoch-ms timestamp can take, so a checkpoint written by the
    # old format is detected and REJECTED loudly (clear the checkpoint
    # or replay the source) instead of being silently misread.
    _STATE_MAGIC = -(2**62)

    def _fn(
        key: Tuple[Any], pdfs: Iterator, state: GroupState
    ) -> Iterator:
        import pandas as pd

        stored = list(state.get[0]) if state.exists else []
        if stored:
            if stored[0] != _STATE_MAGIC or (len(stored) - 1) % 3 != 0:
                raise RuntimeError(
                    "sessionize_stateful: state buffer does not carry "
                    "the run-summary format marker — the checkpoint "
                    "predates the current state layout; clear the "
                    "checkpoint directory and replay the source"
                )
            stored = stored[1:]
        runs = [
            [stored[i], stored[i + 1], stored[i + 2]]
            for i in range(0, len(stored), 3)
        ]
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = sorted(
                    int(t) for t in series_to_epoch_ms(pdf[ts_col], tz)
                )
                runs.extend(_sessions(ts))
        runs = _merge_runs(runs)
        wm = state.getCurrentWatermarkMs()
        closed = [r for r in runs if r[1] + gap_ms <= wm]
        open_sessions = [r for r in runs if r[1] + gap_ms > wm]
        if open_sessions:
            state.update(
                (
                    [_STATE_MAGIC]
                    + [
                        v
                        for s, last, n in open_sessions
                        for v in (s, last, n)
                    ],
                )
            )
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
                    "session_start": epoch_ms_to_naive(
                        [c[0] for c in closed], tz
                    ),
                    "session_end": epoch_ms_to_naive(
                        [c[1] for c in closed], tz
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
