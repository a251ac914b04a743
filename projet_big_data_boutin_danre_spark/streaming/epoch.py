"""Session-TZ ↔ true-epoch anchoring for Arrow-batched stateful
operators.

Arrow hands ``TimestampType`` columns to pandas as tz-NAIVE wall time
in ``spark.sql.session.timeZone``; ``GroupState``'s watermark and
timeout APIs (``getCurrentWatermarkMs`` / ``setTimeoutTimestamp``)
speak true UTC epoch milliseconds. Treating the naive wall time as
epoch is off by the session offset whenever the session is not UTC —
sessions would close hours early/late and event-time timeouts could
land at-or-before the watermark (which Spark rejects). Every stateful
operator here anchors through these helpers with the session timezone
captured at plan-build time.
"""

from __future__ import annotations

import pandas as pd


def series_to_epoch_ms(s, tz: str) -> pd.Series:
    """Naive session-wall-time series → true epoch milliseconds."""
    t = pd.to_datetime(s)
    if t.dt.tz is None:
        t = t.dt.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
    return t.astype("int64") // 1_000_000


def scalar_to_epoch_ms(v, tz: str) -> int:
    """Naive session-wall-time scalar → true epoch milliseconds."""
    t = pd.Timestamp(v)
    if t.tz is None:
        t = t.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
    return int(t.value // 1_000_000)


def epoch_ms_to_naive(ms, tz: str):
    """True epoch milliseconds → naive session-wall-time timestamps
    (what Spark expects back from an Arrow batch)."""
    return (
        pd.to_datetime(ms, unit="ms", utc=True).tz_convert(tz).tz_localize(None)
    )
