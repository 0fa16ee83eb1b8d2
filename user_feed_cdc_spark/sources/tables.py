"""Batch parquet sources for the driver testdata tables.

Explicit schemas (no footer inference on the hot path) so Catalyst can
prune columns and push predicates into the scan. At 100 TB these reads
become partitioned parquet/Delta directories; nothing here assumes a
single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from user_feed_cdc_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

# events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
# rejects as a timestamp; read it as raw nanos (legacy conf) and truncate
# to microseconds — exactly what DuckDB's µs-native timestamps do, so the
# oracle comparison sees identical values.
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Repartition up to the session's parallelism when the scan produced
    fewer partitions than cores. Small/single-file inputs otherwise pin
    expensive per-row compute (minhash/simhash signatures, Pandas UDFs)
    to ONE task while the other 31 cores idle — the round-2 profile
    showed exactly that on the signature operators. At real scale the
    scan already yields ≥cores partitions and this is a no-op (the
    condition, not just the call, is the contract: never repartition a
    well-partitioned input just to repartition it)."""
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sort-bucketed)
    managed table. Two tables bucketed on their join key with the same
    bucket count join WITHOUT a shuffle — each bucket pair is read
    co-located (SortMergeJoin with no Exchange). At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    shuffling it once at write time; pytest pins the no-Exchange plan
    (tests/test_plans.py::test_bucketed_join_skips_shuffle)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
