"""Watermarked event-time operators: the streaming side of the
``events`` table queries.

Batch twins live in entry_queries.py (`event_windows`,
`event_sessions`, DuckDB-oracled); these functions express the SAME
semantics as long-running streaming operators, which is where
watermarks fit: event windowing has a boundable late-data horizon, so
state can be finalized and dropped (unlike global dedup clustering —
streaming/stream.py module docstring). Each transformation takes a
batch OR streaming DataFrame — the Structured Streaming contract is
one declarative plan for both, with Catalyst choosing the stateful
physical operators under ``readStream``.

Three tiers, most-built-in first (UDFs are the slow path):

- ``windowed_event_counts`` — tumbling window + watermark, pure
  built-ins (whole-stage-codegen'd aggregation, incremental state
  store under streaming).
- ``session_windows`` — gap sessions via native ``session_window``
  (state-store session merge, JVM-side).
- ``sessionize_with_state`` — the same sessions via
  ``applyInPandasWithState``: the custom-stateful-operator escape
  hatch demonstrated on semantics whose built-in twin pins its
  correctness differentially (tests/test_streaming_windows.py). Use
  this shape only when session payloads outgrow ``session_window``
  (per-session structures built-ins cannot fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type — the
    streaming form of entry query `event_windows` (same plan; under
    ``readStream`` + append mode a window emits once, when the
    watermark passes its end, and its state is dropped)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions per user via native ``session_window`` —
    the streaming form of entry query `event_sessions` (the batch
    gaps-and-islands window produces the same sessions; pinned by
    tests). A session finalizes when the watermark passes its close
    (last event + gap)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# state as epoch-microsecond ints: tz-proof across the Arrow boundary
_SESSION_STATE = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_with_state(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap sessions as a CUSTOM stateful operator
    (``applyInPandasWithState``, event-time timeout) — the same
    gap-session semantics as ``session_windows`` (one divergence,
    documented below), emitting one row per CLOSED session.

    Per micro-batch and user: fold the batch's events (sorted by
    event time) into the open session carried in state; a gap inside
    the batch closes-and-emits immediately; the trailing open session
    persists in state with an event-time timeout at ``last_ts + gap``
    — when the watermark passes it, the timed-out group fires with no
    rows and the session closes. Events later than the watermark
    never reach the operator (dropped upstream), so an emitted
    session can never be reopened — the append-mode contract.

    Out-of-order data WITHIN the watermark is folded as interval
    merging (an event earlier than the open session extends it
    backward if within gap, or forms its own earlier session if not —
    the native semantics). The one divergence from native
    ``session_window``: gap-closed sessions are emitted EAGERLY at the
    end of their micro-batch, so a later batch carrying an
    in-watermark event that native would merge into an
    already-emitted session produces a separate session row here
    (native holds every session in state until the watermark passes
    its close). On in-event-time-order arrival the outputs are
    identical — differentially pinned against ``session_window`` in
    tests/test_streaming_windows.py.

    Timestamps cross the Arrow boundary as JVM-computed epoch
    microseconds (``unix_micros``) and come back tz-aware UTC, so the
    fold and its event-time timeout are correct under any
    ``spark.sql.session.timeZone`` (naive pandas datetimes are
    session-local — treating them as epoch shifts the timeout by the
    tz offset)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(key, pdf_iter, state: GroupState):
        import pandas as pd

        user = key[0]

        def emit(start_us: int, n: int):
            return pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start_us, unit="us", tz="UTC")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_us, _last, n = state.get
            state.remove()
            yield emit(start_us, n)
            return

        ivs = []  # (start_us, end_us, n_events), one per batch event
        for pdf in pdf_iter:
            ivs.extend((int(v), int(v), 1) for v in pdf["_ts_us"])
        if state.exists:
            s0, e0, n0 = state.get
            ivs.append((s0, e0, n0))
        if not ivs:  # no rows and no state: nothing to do
            return
        ivs.sort()

        # interval-merge: adjacent sessions within gap coalesce (this
        # is how a late event before the open session extends it
        # backward, and how a far-earlier one stays its own session)
        merged = [ivs[0]]
        for s, e, n in ivs[1:]:
            ps, pe, pn = merged[-1]
            if s - pe <= gap_us:
                merged[-1] = (ps, max(pe, e), pn + n)
            else:
                merged.append((s, e, n))

        for s, _e, n in merged[:-1]:  # gap-closed inside the batch
            yield emit(s, n)
        start_us, last_us, n = merged[-1]
        state.update((start_us, last_us, n))
        # fires once the event-time watermark passes session close
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return (
        events.withWatermark(ts_col, watermark)
        # JVM-side true-epoch micros: tz-proof across Arrow (naive
        # pandas datetimes would be session-local, not epoch)
        .withColumn("_ts_us", F.unix_micros(F.col(ts_col)))
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
