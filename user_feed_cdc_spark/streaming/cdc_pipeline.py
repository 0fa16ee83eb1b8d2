"""CDC change-event pipeline: Debezium-shaped JSON → canonical activity feed.

Re-architecture of the reference's consumer loop (reference:
event_processor.py:36-113, strategy.py, main.py:25-59) as ONE Structured
Streaming query:

    source (kafka | file JSONL) → parse meta → validate (__op=='c')
    → per-table demux → canonical-record union → foreachBatch sink

Design decisions vs the reference:
- The reference's hand-rolled poll/batch loop (poll(1000), batch_size=1,
  event_processor.py:43-72) is replaced by Spark micro-batches with
  checkpointed offsets — at-least-once like the reference (README.md:4),
  but without its swallow-all error path (event_processor.py:111-113).
- The Strategy/Factory dispatch (strategy.py:137-149) becomes per-table
  `select` branches union'd into one schema: normalize-then-union
  (SURVEY.md §7.3.5). Unknown tables land in a dead-letter output
  instead of raising ValueError.
- uuid1() time-ordering (strategy.py:36) is split into uuid() for
  uniqueness + explicit (event_timestamp, _seq) ordering (SURVEY.md §7.3.1).
- The feed sink is parquet partitioned by activity_date and bucketable
  by user_id — the Cassandra (user_id, ts DESC) layout re-expressed for
  a lake; the actual Cassandra connector is a writeStream format swap.

Transforms are pure column expressions shared verbatim between batch
and streaming (same function, both paths), so the batch oracle check in
operators/cdc.py certifies the streaming semantics too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from user_feed_cdc_spark.schemas import CDC_SCHEMAS, CDC_TABLES

# Minimal schema to route an event before full payload parsing.
META_SCHEMA = T.StructType(
    [
        T.StructField("__op", T.StringType()),
        T.StructField("__table", T.StringType()),
        T.StructField("__source_ts_ms", T.LongType()),
        T.StructField("__source_table", T.StringType()),
    ]
)


def _meta_map(payload) -> Column:
    """Common metadata map (reference: strategy.py:39-46,67-75 — every
    transform carries source_table + primary-key provenance)."""
    return F.create_map(
        F.lit("source_table"), F.coalesce(payload["__table"], F.lit("")),
        F.lit("primary_key_value"), payload["id"].cast("string"),
        F.lit("primary_key_field"), F.lit("id"),
        F.lit("primary_key_type"), F.lit("integer"),
    )


def canonical_columns(table: str, payload) -> list[Column]:
    """The four schema-adapter transforms (reference: strategy.py:21-135),
    as pure column expressions over a parsed payload struct column.

    Returns the canonical activity columns WITHOUT activity_id (added by
    the caller so batch oracles can substitute a deterministic id).
    """
    event_ts = F.timestamp_millis(payload["__source_ts_ms"]).alias("event_timestamp")
    if table == "likes":  # reference: strategy.py:21-47
        return [
            payload["liked_by"].alias("user_id"),
            F.lit("LIKE_SHARD").alias("activity_type"),
            event_ts,
            payload["shard_id"].cast("string").alias("target_id"),
            F.lit("shard").alias("target_type"),
            _meta_map(payload).alias("metadata"),
        ]
    if table == "comments":  # reference: strategy.py:49-76
        return [
            payload["user_id"].alias("user_id"),
            F.lit("COMMENT_SHARD").alias("activity_type"),
            event_ts,
            payload["shard_id"].cast("string").alias("target_id"),
            F.lit("shard").alias("target_type"),
            F.map_concat(
                _meta_map(payload),
                F.create_map(F.lit("message"), F.coalesce(payload["message"], F.lit(""))),
            ).alias("metadata"),
        ]
    if table == "shards":  # reference: strategy.py:78-108
        return [
            payload["user_id"].alias("user_id"),
            F.lit("CREATE_SHARD").alias("activity_type"),
            event_ts,
            payload["id"].cast("string").alias("target_id"),
            F.lit("shard").alias("target_type"),
            F.map_concat(
                _meta_map(payload),
                F.create_map(
                    F.lit("template_type"), F.coalesce(payload["templateType"], F.lit("")),
                    F.lit("mode"), F.coalesce(payload["mode"], F.lit("")),
                    F.lit("type"), F.coalesce(payload["type"], F.lit("")),
                    F.lit("title"), F.coalesce(payload["title"], F.lit("")),
                ),
            ).alias("metadata"),
        ]
    if table == "followers":  # reference: strategy.py:110-135
        return [
            payload["follower_id"].alias("user_id"),
            F.lit("FOLLOW_USER").alias("activity_type"),
            event_ts,
            payload["following_id"].alias("target_id"),
            F.lit("user").alias("target_type"),
            _meta_map(payload).alias("metadata"),
        ]
    raise ValueError(f"unknown CDC table {table!r}")


VALID_OP = "c"  # creates only (reference: strategy.py:14-17)


def is_valid(meta) -> Column:
    """Validation predicate (reference: strategy.py:12-18): required
    metadata present and op == 'c'."""
    return (
        meta["__op"].isNotNull()
        & meta["__table"].isNotNull()
        & meta["__source_ts_ms"].isNotNull()
        & (meta["__op"] == VALID_OP)
    )


def normalize_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value (JSON string) → canonical activity records.

    Works identically on batch and streaming DataFrames: parse the meta
    fields once, then per-table parse + transform branches union'd
    (normalize-then-union, SURVEY.md §7.3.5). All narrow operations —
    zero shuffles; at 100 TB this runs at source parallelism.
    """
    meta = F.from_json(F.col(value_col), META_SCHEMA)
    tagged = raw.withColumn("_meta", meta)
    branches = []
    for table in CDC_TABLES:
        payload = F.from_json(F.col(value_col), CDC_SCHEMAS[table])
        branch = (
            tagged.filter(
                (F.col("_meta")["__source_table"] == table) & is_valid(F.col("_meta"))
            )
            .withColumn("_p", payload)
            .select(
                F.expr("uuid()").alias("activity_id"),
                *canonical_columns(table, F.col("_p")),
            )
            .select(
                "user_id",
                "activity_id",
                "activity_type",
                "event_timestamp",
                "target_id",
                "target_type",
                "metadata",
            )
        )
        branches.append(branch)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def dead_letters(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Events the pipeline drops, with a reason — replaces the reference's
    silent `except: pass` (event_processor.py:111-113) and ValueError on
    unknown tables (strategy.py:148-149)."""
    meta = F.from_json(F.col(value_col), META_SCHEMA)
    tagged = raw.withColumn("_meta", meta)
    known = F.col("_meta")["__source_table"].isin(*CDC_TABLES)
    reason = (
        F.when(F.col("_meta").isNull(), "unparseable_json")
        .when(F.col("_meta")["__source_table"].isNull(), "missing_source_table")
        .when(~known, "unknown_table")
        .when(F.col("_meta")["__op"].isNull(), "missing_op")
        .when(F.col("_meta")["__source_ts_ms"].isNull(), "missing_source_ts")
        .when(F.col("_meta")["__table"].isNull(), "missing_table")
        .when(F.col("_meta")["__op"] != VALID_OP, "non_create_op")
    )
    return (
        tagged.withColumn("reason", reason)
        .filter(F.col("reason").isNotNull())
        .select(F.col(value_col).alias("raw_value"), "reason")
    )


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


def file_json_stream(spark: SparkSession, path: str, max_files: int | None = None) -> DataFrame:
    """File-based stand-in for the Kafka source: one JSON event per line.
    Same `value: string` contract as the Kafka source, so the pipeline is
    source-agnostic."""
    reader = spark.readStream.format("text")
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.load(path).select(F.col("value"))


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | None = None,
) -> DataFrame:
    """Kafka CDC source (reference: services/kafka.py:8-26, main.py:25-31 —
    4 topics postgres.public.{followers,likes,comments,shards}, earliest
    offsets). Offsets ride the checkpoint, not consumer auto-commit.
    Requires the spark-sql-kafka package on the classpath; untestable in
    this container, kept behind this constructor.
    """
    from user_feed_cdc_spark.schemas import CDC_TOPIC_PREFIX

    topics = topics or ",".join(f"{CDC_TOPIC_PREFIX}{t}" for t in CDC_TABLES)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


# ---------------------------------------------------------------------------
# Sink
# ---------------------------------------------------------------------------


def write_feed_stream(
    activities: DataFrame,
    feed_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Feed-table sink: parquet partitioned by activity_date (the lake
    translation of Cassandra's user_id partition + time-DESC clustering,
    cassandra-init.cql:14-15 — date partitions prune time-range reads;
    per-user access is a pushed-down user_id predicate; at real scale
    add bucketing by user_id in a metastore/Delta table).

    foreachBatch writes make the micro-batch append atomic per batch id;
    checkpoint + idempotent re-run gives at-least-once end-to-end
    (same guarantee as the reference, README.md:4, minus its data-loss
    bug event_processor.py:111-113).
    """
    out = activities.withColumn("activity_date", F.to_date("event_timestamp"))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy("activity_date")
            .parquet(feed_path)
        )

    writer = (
        out.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_cdc_pipeline(
    spark: SparkSession,
    source_path: str,
    feed_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """End-to-end: file JSONL source → normalize → partitioned feed table.
    Returns the StreamingQuery (lifecycle: query.stop()/awaitTermination —
    replaces the reference's /start //stop control plane, main.py:84-121)."""
    raw = file_json_stream(spark, source_path)
    activities = normalize_events(raw)
    return write_feed_stream(activities, feed_path, checkpoint, available_now)
