"""Event-time streaming semantics over `events` (SURVEY.md §2.3 E6/E7):
tumbling / sliding / session windows with watermarks, and streaming
dedup. The reference has none of this (late data is inserted wherever it
lands, SURVEY.md §2.2) — these are the Spark-native operators the rebuilt
engine adds.

Every aggregation here is expressed once and runs in BOTH batch and
streaming mode (same function) — the batch run is the oracle-checkable
form; the streaming run adds watermark-driven state eviction. Batch-vs-
stream equivalence is pinned by tests/test_streaming.py.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from user_feed_cdc_spark.sources.tables import load_events

DEFAULT_WATERMARK = "10 minutes"

# --- Scale-adaptive streaming state partitioning -------------------------
#
# Structured Streaming has no AQE: stateful operators inherit
# spark.sql.shuffle.partitions at query start and keep that many state
# store instances FOREVER (the count is pinned in the checkpoint).  Every
# micro-batch — including the empty watermark-advance batch availableNow
# appends — pays a per-partition fixed cost (store load, eviction scan,
# delta-file commit) for EVERY state store of EVERY stateful operator, so
# a partition count inherited from the batch default is pure overhead
# whenever the actual state volume doesn't need it (measured here: the
# stream-stream join entry runs 4 stores x N partitions x 2 batches; at
# N=32 on a 2 MB source that is 12.6 s wall, at N=8 it is 3.3 s, with
# row-identical output — guide §2.2/§2.4: fewer, larger partitions, and
# don't shuffle into more partitions than the data warrants).
#
# The partition count is therefore DERIVED FROM INPUT SIZE (the same
# bytes-per-partition logic AQE's coalescing applies to batch shuffles),
# not hard-coded to either the local core count or a cluster constant:
# ~SPARK_GRAFT_STREAM_PART_BYTES of compressed source bytes per state
# partition (default 8 MB ≈ 32-64 MB of in-memory state), floored at
# SPARK_GRAFT_STREAM_PART_MIN (default 4, keeps multi-core locally) and
# capped at SPARK_GRAFT_STREAM_PART_MAX (default 4096, a deployment knob:
# a 100 TB/day topic at 8 MB/partition would otherwise ask for millions —
# production sizes the cap to executor count x a small factor).  All
# three knobs are env-tunable so cluster deployments can size state
# partitioning without touching code.

STREAM_PART_BYTES = int(
    os.environ.get("SPARK_GRAFT_STREAM_PART_BYTES", str(8 << 20))
)
STREAM_PART_MIN = int(os.environ.get("SPARK_GRAFT_STREAM_PART_MIN", "4"))
STREAM_PART_MAX = int(os.environ.get("SPARK_GRAFT_STREAM_PART_MAX", "4096"))


def _path_bytes(path: str) -> int:
    """Recursive on-disk size of a file or directory (symlinks followed:
    the stream-replay dirs are symlink farms over the real parquet)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path, followlinks=True):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def stream_state_partitions(*paths: str) -> int:
    """State-partition count for a streaming query reading ``paths``:
    ceil(source bytes / STREAM_PART_BYTES), clamped to
    [STREAM_PART_MIN, STREAM_PART_MAX]."""
    size = sum(_path_bytes(p) for p in paths)
    return max(
        STREAM_PART_MIN,
        min(STREAM_PART_MAX, math.ceil(size / STREAM_PART_BYTES)),
    )


class stream_partition_scope:
    """Context manager: pin spark.sql.shuffle.partitions to the
    input-derived state-partition count for the duration of a streaming
    query's start+drain, restoring the session default afterwards.  The
    streaming query captures the value at start; batch work outside the
    scope is untouched (and batch work is AQE-coalesced anyway)."""

    def __init__(self, spark: SparkSession, *paths: str, n: int | None = None):
        self.spark = spark
        self.n = n if n is not None else stream_state_partitions(*paths)

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def events_stream_dir(sf_dir: str) -> str:
    """A directory exposing ONLY the events parquet of an sf dir, for
    file-stream replay (see table_stream_dir)."""
    return table_stream_dir(sf_dir, "events")


def table_stream_dir(sf_dir: str, table: str) -> str:
    """A directory exposing ONLY one table's parquet of an sf dir, for
    file-stream replay: FileStreamSource requires a directory (it
    reuses the path as basePath), and pointing it at the whole sf dir
    would sweep other tables into the footer sniff. Built once per
    (sf dir, table) as a symlink under the system temp dir; concurrent
    creators tolerate each other."""
    import hashlib
    import os
    import tempfile

    link_dir = os.path.join(
        tempfile.gettempdir(),
        "ufc_stream_"
        + hashlib.md5(f"{sf_dir}|{table}".encode()).hexdigest()[:10],
    )
    os.makedirs(link_dir, exist_ok=True)
    link = os.path.join(link_dir, f"{table}.parquet")
    target = os.path.join(sf_dir, f"{table}.parquet")
    try:
        os.symlink(target, link)
    except FileExistsError:
        # A pre-existing link must point where we expect: a stale link
        # (md5-prefix collision, or a dead target from a regenerated
        # testdata tree) would silently stream wrong or no data.
        # Replace atomically — symlink to a temp name, then rename over
        # the old one — so concurrent creators still tolerate each other.
        if os.path.realpath(link) != os.path.realpath(target):
            tmp = link + f".tmp{os.getpid()}"
            os.symlink(target, tmp)
            os.replace(tmp, link)
    return link_dir


def events_file_stream(spark: SparkSession, directory: str) -> DataFrame:
    """Replay an events parquet directory as a stream (test stand-in for
    Kafka; same columns as the batch table). The footer-sniffed loader
    handles both native TIMESTAMP files and legacy int64-nanos files."""
    return load_events(
        spark, directory, streaming=True, options={"maxFilesPerTrigger": "1"}
    )


def tumbling_counts(events: DataFrame, width: str = "1 hour", watermark: str | None = None) -> DataFrame:
    """Tumbling event-time window aggregation. In streaming mode the
    watermark bounds state: windows older than max(ts) - watermark are
    finalized and evicted; later-arriving rows for them are dropped."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows. Spark
    plans this as an Expand (one row per containing window) + hash agg —
    state scales with open windows, not events."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows: a session extends while consecutive
    events are < gap apart. In streaming append mode pass a watermark
    (session state must be finalizable); complete mode runs without."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Streaming exact dedup on (event_id, ts): the watermark bounds the
    dedup state — without it, 100 TB of stream would mean unbounded state
    (E7). Honest semantics (verified empirically on Spark 4.1.x, pinned in
    tests/test_streaming.py): duplicates arriving within the watermark
    horizon are suppressed; a duplicate arriving after its key was evicted
    is re-emitted. That is at-least-once — the same guarantee as the
    reference pipeline (README.md:4), with a tunable horizon. Watermark
    late-row FILTERING applies to windowed aggregations, not dedup:
    the state operator reports numRowsDroppedByWatermark there."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return events.dropDuplicates(["event_id", "ts"])


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's clicks in the preceding `horizon` (click ts <= purchase ts <
    click ts + horizon) — the canonical click-attribution shape. Works
    identically on two batch DataFrames (plain interval equi-join) and
    two streaming DataFrames, where the watermarks + the time-range
    predicate are what let Spark EVICT join state: click state older
    than watermark+horizon can never match a future purchase and is
    dropped, so state is bounded by the horizon, not the stream length.
    The join key is user_id → state partitions across executors; the
    range predicate keeps per-key state at |events in horizon|."""
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (c.user_id == p.user_id)
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        c.user_id, "click_id", "purchase_id", "click_ts", "purchase_ts",
        "purchase_value",
    )


def run_to_memory(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    src_paths: tuple[str, ...] = (),
):
    """Drive a streaming DF to completion into an in-memory table
    (availableNow) and return the materialized batch result.

    ``src_paths``: the streamed source files/dirs — when given, the
    query's state partitioning is derived from their size
    (stream_state_partitions) instead of inheriting the batch shuffle
    default; the session conf is restored after the drain."""
    scope = (
        stream_partition_scope(spark, *src_paths)
        if src_paths
        else _null_scope()
    )
    with scope:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # The memory sink is DRIVER-RESIDENT by construction (its size is
    # bounded by driver memory whatever the scale), so fanning its
    # local scan into a session-width shuffle for the downstream
    # aggregate is pure scheduling overhead — measured 0.6 -> 0.2 s on
    # a 5k-row sink agg (guide §2.2: don't shuffle into more
    # partitions than the data warrants). coalesce(1) narrows the
    # local scan only; results are partition-independent.
    return spark.table(name).coalesce(1)


class _null_scope:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
