"""Streaming semantics tests (SURVEY.md §5.3): batch-vs-stream
equivalence for the window operators, streaming dedup, and
watermark-driven late-data dropping."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from user_feed_cdc_spark.sources.tables import load_table
from user_feed_cdc_spark.streaming.windows import (
    events_file_stream,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """events re-materialized as a 4-file parquet dir so the file stream
    replays it across several micro-batches."""
    d = tmp_path_factory.mktemp("events_stream")
    ev = load_table(spark, sf_dir, "events")
    # write raw long nanos back out so the stream reader exercises the
    # same ns handling as production inputs
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d / "events"))
    return str(d / "events")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_batch_stream_equivalence(spark, sf_dir, events_dir):
    """Same aggregation, batch vs 4-micro-batch incremental run (complete
    mode: every window's final value; append-mode late-drop semantics are
    pinned separately below)."""
    batch = tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")
    stream = run_to_memory(
        spark,
        tumbling_counts(events_file_stream(spark, events_dir), "1 hour"),
        "tumbling_eq",
        output_mode="complete",
    )
    assert _rows(stream) == _rows(batch)


def test_session_batch_stream_equivalence(spark, sf_dir, events_dir):
    """Session windows must merge correctly across micro-batch boundaries —
    the replay files are randomly partitioned, so fragments of one session
    arrive in different batches and the stateful merge has to reassemble
    them."""
    batch = session_counts(load_table(spark, sf_dir, "events"), "30 minutes")
    stream = run_to_memory(
        spark,
        session_counts(events_file_stream(spark, events_dir), "30 minutes"),
        "session_eq",
        output_mode="complete",
    )
    assert _rows(stream) == _rows(batch)


def test_native_timestamp_stream_matches_batch(spark, sf_dir, tmp_path):
    """The stream reader's NATIVE-timestamp branch (parquet TIMESTAMP
    ts, the current driver format — the legacy int64-nanos branch is
    what every other streaming test exercises): re-materialize events
    with a real timestamp column, stream it, and the tumbling rollup
    must equal the batch run."""
    d = tmp_path / "events_native"
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(2).write.mode("overwrite").parquet(str(d))
    batch = tumbling_counts(ev, "1 hour")
    stream = run_to_memory(
        spark,
        tumbling_counts(events_file_stream(spark, str(d)), "1 hour"),
        "native_ts_eq",
        output_mode="complete",
    )
    assert _rows(stream) == _rows(batch)


def _write_spaced_files(spark, d, batches, start=0):
    """Write one parquet file per batch with sequential names AND spaced
    mtimes so the file stream replays them in a deterministic order.
    ``start`` offsets the file numbering: a second call into the same
    directory must NOT reuse names — the file source tracks processed
    files by name, so an overwritten file is silently never re-read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    types = [pa.int64(), pa.int64(), pa.int64(), pa.string(), pa.float64(), pa.string()]
    for i, rows in enumerate(batches, start=start):
        arrays = [
            pa.array([r[j] for r in rows], type=types[j]) for j in range(len(cols))
        ]
        pq.write_table(pa.table(dict(zip(cols, arrays))), str(d / f"{i:04d}.parquet"))
        time.sleep(1.1)  # distinct mtimes → deterministic file order


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicates within the watermark horizon are suppressed exactly once;
    the state stays bounded by the horizon (at-least-once beyond it —
    empirically, dedup state eviction does NOT late-filter inputs, which
    is why stream_dedup documents at-least-once, not exactly-once)."""
    d = tmp_path / "stream"
    d.mkdir()
    t0 = 1704067200000000000  # 2024-01-01 in ns
    m = 60_000_000_000  # one minute in ns
    _write_spaced_files(
        spark,
        d,
        [
            [(1, t0, 1, "click", 1.0, "{}"), (2, t0 + m, 1, "view", 1.0, "{}"),
             (2, t0 + m, 1, "view", 1.0, "{}")],  # same-batch duplicate
            [(2, t0 + m, 1, "view", 1.0, "{}"),   # cross-batch duplicate in horizon
             (3, t0 + 5 * m, 2, "click", 1.0, "{}")],
        ],
    )
    stream = events_file_stream(spark, str(d))
    out = run_to_memory(spark, stream_dedup(stream, "10 minutes"), "dedup_horizon")
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]


def test_windowed_agg_drops_late_rows(spark, tmp_path):
    """Append-mode windowed aggregation with watermark: rows arriving
    older than the watermark are dropped and never re-open their window.

    Note Spark's two-watermark protocol (pinned empirically on 4.1.x):
    batch N filters late input with the watermark computed from batch N-1
    but EVICTS state with the watermark including batch N's own advance.
    So the window must be finalized in one batch and the late row must
    arrive in a strictly later one to observe the drop."""
    d = tmp_path / "stream"
    d.mkdir()
    t0 = 1704067200000000000
    m = 60_000_000_000
    _write_spaced_files(
        spark,
        d,
        [
            # window [00:00, 01:00): 2 events
            [(1, t0, 1, "click", 1.0, "{}"), (2, t0 + m, 1, "click", 1.0, "{}")],
            # jump to 03:00 → watermark (10 min) advances to 02:50
            [(3, t0 + 180 * m, 2, "click", 1.0, "{}")],
            # spacer batch: eviction runs with watermark 02:50, emitting
            # and finalizing window [00:00, 01:00)
            [(5, t0 + 181 * m, 2, "click", 1.0, "{}")],
            # late row for the finalized window → must be dropped
            [(4, t0 + 2 * m, 9, "click", 1.0, "{}")],
        ],
    )
    stream = events_file_stream(spark, str(d))
    q = (
        tumbling_counts(stream, "1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1  # the late row
    first_window = [
        r for r in spark.table("late_drop").collect()
        if r.window_start.isoformat().startswith("2024-01-01T00")
    ]
    assert len(first_window) == 1 and first_window[0].n_events == 2  # late row excluded


def test_stateful_running_user_totals(spark, sf_dir, events_dir):
    """applyInPandasWithState: per-user running totals carried across
    micro-batches. After draining the 4-file replay, each user's LAST
    emitted update must equal the batch groupBy over the whole table —
    state survived batch boundaries and folded every row exactly once."""
    from user_feed_cdc_spark.streaming.stateful import running_user_totals

    out = run_to_memory(
        spark,
        running_user_totals(events_file_stream(spark, events_dir)),
        "user_totals",
        output_mode="update",
    ).collect()
    # the final update per user is the one with the highest n_events
    # (totals only grow)
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r

    batch = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert f.n_events == b.n_events
        assert abs(f.total_value - b.total_value) < 1e-6
        assert f.last_ts == b.last_ts


def test_cdc_feed_feeds_streaming_windows(spark, tmp_path, sf_dir):
    """Full production topology: CDC JSONL → canonical feed table →
    the feed table itself replayed as a stream into a windowed
    aggregation. The downstream agg over the stream must equal the same
    agg run in batch over the materialized feed."""
    from user_feed_cdc_spark.streaming.cdc_pipeline import run_cdc_pipeline
    from tests.test_cdc_pipeline import fixture_lines

    src = tmp_path / "cdc_in"
    feed = str(tmp_path / "feed")
    src.mkdir()
    (src / "b.jsonl").write_text("\n".join(fixture_lines()) + "\n")
    run_cdc_pipeline(spark, str(src), feed, str(tmp_path / "ck")).awaitTermination()

    feed_batch = spark.read.parquet(feed)
    stream = (
        spark.readStream.schema(feed_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = lambda df: (  # noqa: E731
        df.groupBy(F.window("event_timestamp", "1 hour").alias("w"), "activity_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "activity_type", "n")
    )
    streamed = run_to_memory(spark, agg(stream), "feed_windows", output_mode="complete")
    assert _rows(streamed) == _rows(agg(feed_batch))


def test_sliding_each_event_in_two_windows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    windows_sum = (
        sliding_counts(ev, "1 hour", "30 minutes")
        .agg(F.sum("n_events").alias("s"))
        .collect()[0]
        .s
    )
    assert windows_sum == 2 * total


def test_stream_stream_attribution_join(spark, sf_dir, events_dir):
    """Stream-stream interval join: the same attribution_join function
    over two file-replay streams must emit exactly the batch join's
    pairs. The replay files are randomly partitioned (events arrive out
    of order across micro-batches), so a generous watermark keeps
    correctness while the time-range predicate still registers the
    state-eviction policy with the engine."""
    from user_feed_cdc_spark.streaming.windows import attribution_join

    ev = load_table(spark, sf_dir, "events")
    batch = attribution_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    stream_src = events_file_stream(spark, events_dir)
    stream = run_to_memory(
        spark,
        attribution_join(
            stream_src.filter(F.col("event_type") == "click"),
            events_file_stream(spark, events_dir).filter(
                F.col("event_type") == "purchase"
            ),
            watermark="30 days",
        ),
        "attribution_eq",
    )
    assert _rows(stream) == _rows(batch)


class _FakeGroupState:
    """Minimal stand-in for pyspark GroupState: enough surface to drive
    make_ttl_update_fn deterministically (real ProcessingTimeTimeout is
    wall-clock-driven, untestable without sleeps)."""

    def __init__(self):
        self._state = None
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        if self._state is None:
            raise ValueError("state does not exist")
        return self._state

    def update(self, v):
        self._state = tuple(v)

    def remove(self):
        self._state = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_stateful_ttl_evicts_and_restarts(spark):
    """TTL contract: a timed-out key's state is removed and nothing is
    emitted; when the key reappears its totals RESTART from zero."""
    import pandas as pd

    from user_feed_cdc_spark.streaming.stateful import make_ttl_update_fn

    fn = make_ttl_update_fn(ttl_ms=60_000)
    state = _FakeGroupState()
    batch = pd.DataFrame(
        {"value": [2.0, 3.0], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )

    out1 = list(fn((7,), iter([batch]), state))
    assert out1[0]["n_events"].iloc[0] == 2
    assert out1[0]["total_value"].iloc[0] == 5.0
    assert state.exists and state.timeout_set == 60_000

    # idle past TTL → Spark invokes with hasTimedOut, no rows
    state.hasTimedOut = True
    assert list(fn((7,), iter([]), state)) == []  # nothing emitted
    assert not state.exists  # state dropped

    # key reappears → totals restart from zero, not 2/5.0
    state.hasTimedOut = False
    out2 = list(fn((7,), iter([batch]), state))
    assert out2[0]["n_events"].iloc[0] == 2
    assert out2[0]["total_value"].iloc[0] == 5.0


def test_stateful_ttl_streaming_path(spark, sf_dir, events_dir):
    """running_user_totals_ttl executes end-to-end with a real
    ProcessingTimeTimeout (no key idles past the 1 h TTL inside the
    replay, so results equal the lifetime variant's contract).

    Driven with the default continuous trigger + explicit stop():
    availableNow never terminates under ProcessingTimeTimeout (the
    engine keeps scheduling batches so pending timeouts can fire)."""
    from user_feed_cdc_spark.streaming.stateful import running_user_totals_ttl

    n_input = load_table(spark, sf_dir, "events").count()
    q = (
        running_user_totals_ttl(events_file_stream(spark, events_dir))
        .writeStream.format("memory")
        .queryName("user_totals_ttl")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            consumed = sum(p["numInputRows"] for p in q.recentProgress)
            if consumed >= n_input:
                break
            time.sleep(1)
        else:
            raise AssertionError("stream did not drain the input in time")
    finally:
        q.stop()
    out = spark.table("user_totals_ttl").collect()
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r.n_events
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert {u: f.n_events for u, f in final.items()} == batch


def test_stateful_v2_processor_logic(spark):
    """The transformWithState processor's fold logic, driven with a fake
    ValueState (the state-server protocol needs google.protobuf, absent
    in this sandbox): accumulate across calls, restart after clear —
    i.e. after a TTL eviction, which surfaces as get() -> None."""
    import pandas as pd

    from user_feed_cdc_spark.streaming.stateful import _make_user_totals_processor

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def clear(self):
            self._v = None

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeValueState()
            self.ttl_seen = None

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.ttl_seen = ttlDurationMs
            return self.state

    proc = _make_user_totals_processor(ttl_ms=60_000)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttl_seen == 60_000

    batch = pd.DataFrame(
        {"value": [2.0, 3.0], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"])}
    )
    out1 = list(proc.handleInputRows((7,), iter([batch]), None))
    assert out1[0]["n_events"].iloc[0] == 2
    out2 = list(proc.handleInputRows((7,), iter([batch]), None))
    assert out2[0]["n_events"].iloc[0] == 4  # state carried

    handle.state.clear()  # what a TTL expiry looks like to the processor
    out3 = list(proc.handleInputRows((7,), iter([batch]), None))
    assert out3[0]["n_events"].iloc[0] == 2  # restarted, not 6


def test_stateful_v2_transform_with_state(spark, sf_dir, events_dir):
    """transformWithStateInPandas twin: same batch-equivalence contract
    as the v1 applyInPandasWithState operator — the final update per
    user equals the batch groupBy over the whole table. Skipped where
    google.protobuf (the state-server protocol dependency) is absent.
    r10 status check: `import google.protobuf` still fails in this
    sandbox (ModuleNotFoundError, re-verified 2026-08-15) and no
    broker listens on :9092, so both env-gated skips stand; the
    fake-ValueState pytest above pins the processor logic until an
    environment provides protobuf."""
    pytest.importorskip("google.protobuf")
    from user_feed_cdc_spark.streaming.stateful import running_user_totals_v2

    out = run_to_memory(
        spark,
        running_user_totals_v2(events_file_stream(spark, events_dir)),
        "user_totals_v2",
        output_mode="update",
    ).collect()
    final = {}
    for r in out:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    batch = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        f = final[uid]
        assert f.n_events == b.n_events
        assert abs(f.total_value - b.total_value) < 1e-6
        assert f.last_ts == b.last_ts


def test_streaming_incremental_dedup_ingest(spark, tmp_path):
    """Streaming corpus ingestion: within-batch dupes collapse to min
    doc_id, cross-batch dupes are rejected by the ledger anti-join, and
    a full replay (fresh checkpoint, same batch ids) leaves the corpus
    byte-identical — the dynamic-overwrite idempotency contract."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from user_feed_cdc_spark.streaming.ingest import dedup_ingest_stream

    src = tmp_path / "docs_in"
    src.mkdir()
    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")

    def write_file(i, rows):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, str(src / f"{i:04d}.parquet"))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    write_file(0, [(10, "alpha"), (11, "beta"), (12, "alpha")])   # within-batch dupe
    write_file(1, [(20, "beta"), (21, "gamma"), (22, "gamma")])   # cross + within

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    dedup_ingest_stream(stream, corpus, ledger, str(tmp_path / "ck1")).awaitTermination()

    got = {(r.doc_id, r.text) for r in spark.read.parquet(corpus).collect()}
    assert got == {(10, "alpha"), (11, "beta"), (21, "gamma")}
    assert spark.read.parquet(ledger).count() == 3

    # replay everything with a fresh checkpoint → same batch ids → the
    # overwrite replaces each batch's own partitions, zero duplication
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    dedup_ingest_stream(stream2, corpus, ledger, str(tmp_path / "ck2")).awaitTermination()
    again = {(r.doc_id, r.text) for r in spark.read.parquet(corpus).collect()}
    assert again == got
    assert spark.read.parquet(ledger).count() == 3


def test_streaming_sketch_rollup_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """Ingest-time HLL sketching: per-micro-batch sketch rows merged at
    read time must give EXACTLY the batch-computed estimate (register
    merges are associative/commutative/idempotent — batch boundaries
    cannot move the estimate), and a fresh-checkpoint replay must
    reconverge bit-identically."""
    from user_feed_cdc_spark.streaming.sketch_rollup import (
        read_distinct_rollup,
        write_sketch_stream,
    )
    from user_feed_cdc_spark.streaming.windows import events_file_stream

    sk_path = str(tmp_path / "sketches")
    q = write_sketch_stream(
        events_file_stream(spark, events_dir), sk_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    got = {
        r.event_type: r.approx_users
        for r in read_distinct_rollup(spark, sk_path).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    expect = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n"))
        .collect()
    }
    assert got == expect  # exact equality: same registers either way

    # several micro-batches actually contributed sketch rows
    import os

    batches = [d for d in os.listdir(sk_path) if d.startswith("_batch_id=")]
    assert len(batches) >= 2, batches

    # replay with a fresh checkpoint: merged estimates identical
    sk2 = str(tmp_path / "sketches2")
    q2 = write_sketch_stream(
        events_file_stream(spark, events_dir), sk2, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    got2 = {
        r.event_type: r.approx_users
        for r in read_distinct_rollup(spark, sk2).collect()
    }
    assert got2 == got

    # per-day grouping exposes the finer rollup without rescanning events
    by_day = read_distinct_rollup(spark, sk_path, by_day=True)
    assert by_day.count() > len(got)


def test_dedup_within_watermark_state_evicts(spark, tmp_path):
    """The bounded-state claim of streaming_dedup_live, pinned: with
    dropDuplicatesWithinWatermark, a key whose last sighting falls
    behind the advancing watermark is REMOVED from the state store
    (plain dropDuplicates without the event-time column in the key
    never evicts — verified during review with numRowsRemoved=0)."""
    d = tmp_path / "stream"
    d.mkdir()
    t0 = 1704067200000000000  # 2024-01-01 in ns
    m = 60_000_000_000  # one minute in ns
    _write_spaced_files(
        spark,
        d,
        [
            [(1, t0, 1, "click", 1.0, "{}")],
            [(2, t0 + 100 * m, 2, "view", 1.0, "{}")],  # watermark jumps
        ],
    )
    stream = events_file_stream(spark, str(d))
    dd = (
        stream.withWatermark("ts", "10 minutes")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_evict_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    removed = sum(
        op["numRowsRemoved"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    total_left = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert removed >= 1, (removed, total_left)
    assert total_left <= 1


def test_sliding_windows_drop_late_rows_in_both_windows(spark, tmp_path):
    """The sliding-window variant of the late-data contract (the live
    gate streaming_sliding_counts_live runs complete-mode where nothing
    drops; append mode is where the watermark bites): a late row lands
    in TWO overlapping windows, and the watermark must drop it from
    BOTH — the Expand happens before the stateful agg, so one late
    input row counts as one drop but zero contributions anywhere."""
    d = tmp_path / "slide_stream"
    d.mkdir()
    t0 = 1704067200000000000
    m = 60_000_000_000
    _write_spaced_files(
        spark,
        d,
        [
            # windows [00:00,01:00) and [23:30 prev,00:30): 2 events
            [(1, t0, 1, "click", 1.0, "{}"), (2, t0 + m, 1, "click", 1.0, "{}")],
            # jump far ahead → watermark advances past both windows
            [(3, t0 + 180 * m, 2, "click", 1.0, "{}")],
            # spacer to finalize
            [(5, t0 + 181 * m, 2, "click", 1.0, "{}")],
            # late row targeting the finalized windows → dropped
            [(4, t0 + 2 * m, 9, "click", 1.0, "{}")],
        ],
    )
    from user_feed_cdc_spark.streaming.windows import sliding_counts

    stream = events_file_stream(spark, str(d))
    q = (
        sliding_counts(stream, "1 hour", "30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("slide_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped >= 1
    # the [00:00, 00:30-start] windows carry only the 2 on-time events
    counts = {
        r.window_start.isoformat(): r.n_events
        for r in spark.table("slide_late_drop").collect()
        if r.window_start.isoformat().startswith("2024-01-01T00:00")
    }
    assert counts.get("2024-01-01T00:00:00") == 2  # late row in neither


def test_ewma_bounded_by_window_extremes(spark, sf_dir):
    """events_ewma_values invariant: a convex combination of the
    current value and its 3 lags must lie within the min/max of those
    same values — per row, against an independently computed window."""
    import __spark_entry__ as em
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    out = em.queries()["events_ewma_values"](spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    checked = out.select(
        "*",
        F.min("cents").over(w).alias("wmin"),
        F.max("cents").over(w).alias("wmax"),
    ).filter(
        (F.col("ewma_cents") < F.col("wmin") - 1e-6)
        | (F.col("ewma_cents") > F.col("wmax") + 1e-6)
    )
    assert checked.count() == 0


def _drain_to_parquet(spark, df, sink, ckpt):
    q = (
        df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_no_reprocess_and_state_survives(spark, tmp_path):
    """Restart correctness — the property every production streaming
    deployment leans on and no single-run test exercises: a SECOND
    availableNow run against the same checkpoint must (a) not
    reprocess batch-1 files into the append sink (exactly-once via
    source offsets), and (b) resume windowed STATE, so a window whose
    rows span both runs closes with the combined count. Window W2's
    count of 3 is assembled from 2 rows seen before the restart and 1
    after — it only comes out right if the state store was restored
    from the checkpoint."""
    import os

    from pyspark.sql import functions as F

    from user_feed_cdc_spark.streaming.windows import (
        events_file_stream,
        tumbling_counts,
    )

    src = tmp_path / "src"; src.mkdir()
    sink = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")
    t0 = 1704067200000000000  # 2024-01-01T00:00 in ns
    h = 3600 * 1_000_000_000

    # run 1: W1 complete (2 rows) and W2 partial (3 rows, max ts +1.5h).
    # Watermark set by batch 1 (1.5h - 30m = 1h) lets batch 2 close W1;
    # W2 (end 2h) stays open across the restart.
    _write_spaced_files(
        spark, src,
        [
            [(1, t0, 1, "click", 1.0, "{}"),
             (2, t0 + h // 2, 2, "click", 1.0, "{}"),
             (3, t0 + h + h // 4, 1, "click", 1.0, "{}"),
             (4, t0 + h + h // 2, 2, "click", 1.0, "{}")],
            [(5, t0 + h + h // 2, 3, "click", 1.0, "{}")],
        ],
    )
    counts = lambda: tumbling_counts(  # noqa: E731
        events_file_stream(spark, str(src)), "1 hour", watermark="30 minutes"
    )
    _drain_to_parquet(spark, counts(), sink, ckpt)
    first = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    assert first == {("2024-01-01T00:00:00", 2)}  # W1 closed, W2 still open
    n_files_run1 = len(
        [f for f in os.listdir(sink) if f.endswith(".parquet")]
    )

    # run 2: one more W2 row, then two later files — closure always lags
    # one micro-batch behind the watermark (each batch closes against the
    # PREVIOUS batch's watermark), so the 4h row's batch is the one that
    # flushes W2.
    _write_spaced_files(
        spark, src,
        [
            [(9, t0 + h + 3 * h // 4, 3, "click", 1.0, "{}")],
            [(10, t0 + 3 * h, 1, "click", 1.0, "{}")],
            [(11, t0 + 4 * h, 2, "click", 1.0, "{}")],
        ],
        start=2,
    )
    # fresh query object, same checkpoint — a restart, not a continuation
    _drain_to_parquet(spark, counts(), sink, ckpt)
    final = {
        (r["window_start"].isoformat(), r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    # W1 appears ONCE (not reprocessed); W2 = 3 rows from run 1 + 1 from
    # run 2 — the cross-restart state assertion; the 3h window still open.
    assert final == {
        ("2024-01-01T00:00:00", 2),
        ("2024-01-01T01:00:00", 4),
    }
    assert len([f for f in os.listdir(sink) if f.endswith(".parquet")]) > n_files_run1


def test_observe_metrics_account_without_second_scan(spark, sf_dir):
    """df.observe + Observation: per-stage accounting metrics collected
    ON the main action — the production alternative to counting each
    pipeline stage with its own scan (three .count() calls = three
    scans at 100 TB; observe = zero extra). The observed kept/dropped
    split must reconcile exactly with the materialized result."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("gate")
    gated = docs.observe(
        obs,
        F.count(F.lit(1)).alias("seen"),
        F.sum(F.when(F.col("n_chars") >= 200, 1).otherwise(0)).alias("kept"),
    ).filter(F.col("n_chars") >= 200)
    kept_rows = gated.count()
    got = obs.get
    assert got["seen"] == docs.count()
    assert got["kept"] == kept_rows


def test_txn_cdf_ivm_live_empty_refresh_skips_write(spark, sf_dir):
    """The dataChange=false OPTIMIZE commit arrives as a genuinely
    EMPTY micro-batch; the IVM refresh must advance the mv_refresh
    watermark WITHOUT writing a new MV generation — a txn-action-only
    commit in the MV's log (r16 VERDICT item 2), leaving the previous
    generation live — and the final MV must still equal the batch
    twin's full recompute."""
    import json
    import os
    from urllib.parse import unquote, urlparse

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    df = qs["streaming_txn_cdf_ivm_live"](spark, sf_dir)
    files = [unquote(urlparse(f).path) for f in df.inputFiles()]
    assert files, "the MV read must be file-backed"
    mv_root = os.path.dirname(os.path.dirname(files[0]))
    log_dir = os.path.join(mv_root, "_log")

    commits = []
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json") or ".checkpoint." in name:
            continue
        with open(os.path.join(log_dir, name)) as f:
            acts = [json.loads(line) for line in f if line.strip()]
        commits.append(
            {
                "adds": sum(a.get("action") == "add" for a in acts),
                "removes": sum(a.get("action") == "remove" for a in acts),
                "txns": sum(a.get("action") == "txn" for a in acts),
            }
        )
    skip_commits = [
        c for c in commits if c["txns"] and not c["adds"] and not c["removes"]
    ]
    assert len(skip_commits) == 1, (
        "exactly one refresh (the OPTIMIZE batch) must commit "
        f"watermark-only; got {commits}"
    )
    # every OTHER refresh wrote exactly one generation, and the on-disk
    # generation count matches (the skipped refresh wrote nothing)
    n_gen = sum(
        1 for n in os.listdir(mv_root) if n.startswith("mv") and
        os.path.isdir(os.path.join(mv_root, n)) and n != "_ckpt"
    )
    assert n_gen == sum(c["adds"] for c in commits)

    got = {(r.event_type, r.n, r.cents_sum) for r in df.collect()}
    twin = qs["source_txn_log_cdf_ivm"](spark, sf_dir)
    want = {(r.event_type, r.n, r.cents_sum) for r in twin.collect()}
    assert got == want
