"""Watermarked streaming operators (streaming/windows.py) pinned
differentially against their batch twins.

Strategy: a deterministic event corpus is dropped as ordered parquet
files plus trailing sentinel events whose only job is to advance the
event-time watermark past every real session/window close. The
streaming query (file source, one file per micro-batch, availableNow)
must then emit exactly the batch answer for the real region; sentinel
rows are excluded from comparison because their own
finalization depends on the engine's optional trailing no-data
micro-batch, which is not part of the pinned semantics.
"""

import datetime as dt

import pytest

GAP_MIN = 30
WM = "1 hour"
BASE = dt.datetime(2024, 3, 1, 8, 0, 0)


def _mins(m):
    return BASE + dt.timedelta(minutes=m)


def _events():
    """3 users, sessions with intra-batch and cross-batch gaps; real
    region spans 08:00-10:30."""
    rows = []

    def ev(user, minute, etype, value):
        rows.append(
            {"user_id": user, "ts": _mins(minute), "event_type": etype,
             "value": float(value)}
        )

    # user a: [0,5,10] | [60,62] | [150]
    for m in (0, 5, 10):
        ev("a", m, "click", 1.5)
    for m in (60, 62):
        ev("a", m, "view", 2.0)
    ev("a", 150, "click", 0.5)
    # user b: [3] | [40, 69, 95]  (chained within-gap extensions)
    ev("b", 3, "view", 1.0)
    for m in (40, 69, 95):
        ev("b", m, "click", 3.0)
    # user c: single event
    ev("c", 33, "view", 4.25)
    return rows


def _sentinels():
    return [
        {"user_id": "zz", "ts": _mins(600), "event_type": "sentinel",
         "value": 0.0},
        {"user_id": "zz", "ts": _mins(840), "event_type": "sentinel",
         "value": 0.0},
    ]


def _expected_sessions():
    """Gaps-and-islands over _events() in plain Python."""
    by_user = {}
    for r in _events():
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    out = set()
    for user, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for t in tss[1:]:
            if (t - last) <= dt.timedelta(minutes=GAP_MIN):
                n += 1
                last = t
            else:
                out.add((user, start, n))
                start, last, n = t, t, 1
        out.add((user, start, n))
    return out


@pytest.fixture(scope="module")
def drops(spark, tmp_path_factory):
    """Ordered parquet drops: real events split by ts + 2 sentinels."""
    root = tmp_path_factory.mktemp("ufz_stream_win")
    rows = sorted(_events(), key=lambda r: r["ts"])
    half = len(rows) // 2
    in_dir = root / "in"
    schema = spark.createDataFrame(rows).schema
    for i, chunk in enumerate(
        [rows[:half], rows[half:], _sentinels()[:1], _sentinels()[1:]]
    ):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
    return str(in_dir), schema, root


def _run_stream(spark, drops, transform, name):
    in_dir, schema, root = drops
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(root / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_stream_equals_batch(spark, drops):
    from ufuzzy_spark.streaming.windows import windowed_event_counts

    batch = {
        (r.win_start, r.event_type, r.n, r.total_value)
        for r in windowed_event_counts(
            spark.createDataFrame(_events()), "1 hour", WM
        ).collect()
    }
    got = {
        (r.win_start, r.event_type, r.n, r.total_value)
        for r in _run_stream(
            spark, drops, lambda s: windowed_event_counts(s, "1 hour", WM),
            "win_counts"
        ).collect()
        if r.event_type != "sentinel"
    }
    assert got == batch


def test_session_window_stream_equals_islands(spark, drops):
    from ufuzzy_spark.streaming.windows import session_windows

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in _run_stream(
            spark, drops,
            lambda s: session_windows(s, f"{GAP_MIN} minutes", WM),
            "sess_native",
        ).collect()
        if r.user_id != "zz"
    }
    assert got == _expected_sessions()


def test_session_window_batch_equals_islands(spark):
    from ufuzzy_spark.streaming.windows import session_windows

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_windows(
            spark.createDataFrame(_events()), f"{GAP_MIN} minutes", WM
        ).collect()
    }
    assert got == _expected_sessions()


def test_apply_in_pandas_with_state_equals_islands(spark, drops):
    """The custom stateful sessionizer (applyInPandasWithState,
    event-time timeout) emits exactly the sessions the native
    session_window / batch islands produce."""
    from ufuzzy_spark.streaming.windows import sessionize_with_state

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in _run_stream(
            spark, drops,
            lambda s: sessionize_with_state(s, GAP_MIN, WM),
            "sess_state",
        ).collect()
        if r.user_id != "zz"
    }
    assert got == _expected_sessions()


def test_stateful_sessionizer_out_of_order_within_watermark(spark, tmp_path):
    """Out-of-order events inside the watermark: one within gap of the
    open session extends it BACKWARD (session_start moves earlier);
    one further back forms its OWN earlier session — the interval-merge
    semantics native session_window has. The pre-fix fold absorbed any
    earlier event into the open session (negative delta always passed
    the gap test), yielding one session (start 100, n=4) instead of
    these two.

    Batch 1 opens [100', 102']; watermark after it is 42'. Batch 2
    arrives out of order with 55' (> gap before the session: its own
    island) and 95' (within gap: backward extension). A sentinel then
    advances the watermark past every close."""
    from ufuzzy_spark.streaming.windows import sessionize_with_state

    def mk(user, minute, etype="click"):
        return {"user_id": user, "ts": _mins(minute), "event_type": etype,
                "value": 1.0}

    drops = (
        [mk("d", 100), mk("d", 102)],
        [mk("d", 55), mk("d", 95)],
        [mk("zz", 600, "sentinel")],  # two sentinel batches: a timeout
        [mk("zz", 840, "sentinel")],  # fires against the PREVIOUS
        # batch's watermark, so one advancing batch alone cannot close
        # the open session (same shape as the module fixture)
    )
    in_dir = tmp_path / "in"
    schema = spark.createDataFrame(drops[0]).schema
    for chunk in drops:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in _run_stream(
            spark, (str(in_dir), schema, tmp_path),
            lambda s: sessionize_with_state(s, GAP_MIN, WM),
            "sess_ooo",
        ).collect()
        if r.user_id != "zz"
    }
    assert got == {("d", _mins(55), 1), ("d", _mins(95), 3)}


def test_stateful_sessionizer_non_utc_session_tz(spark, tmp_path):
    """sessionize_with_state must be correct under ANY
    spark.sql.session.timeZone: event times cross the Arrow boundary
    as JVM-computed epoch micros (naive pandas datetimes are
    session-LOCAL — treating them as epoch shifts the event-time
    timeout by the tz offset; under an east-of-UTC session the
    timeout lands hours past the true-epoch watermark and the open
    session never closes)."""
    from ufuzzy_spark.streaming.windows import sessionize_with_state

    def mk(user, minute, etype="click"):
        return {"user_id": user, "ts": _mins(minute), "event_type": etype,
                "value": 1.0}

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        drops = (
            [mk("d", 0), mk("d", 5)],
            [mk("zz", 600, "sentinel")],
            [mk("zz", 840, "sentinel")],
        )
        in_dir = tmp_path / "in"
        schema = spark.createDataFrame(drops[0]).schema
        for chunk in drops:
            spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(in_dir))
        got = {
            (r.user_id, r.session_start, r.n_events)
            for r in _run_stream(
                spark, (str(in_dir), schema, tmp_path),
                lambda s: sessionize_with_state(s, GAP_MIN, WM),
                "sess_tz",
            ).collect()
            if r.user_id != "zz"
        }
        assert got == {("d", _mins(0), 2)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
