"""Mergeable sketch operators (Apache DataSketches HLL via Spark
built-ins). The 100 TB pattern these enable: sketch once per
partition/day at ingest, then MERGE sketches for any rollup — a distinct
count over a year of data becomes a union of 365 tiny sketches instead
of a shuffle of every user id ever seen. Estimates are approximate
(±~2% at default lgK), so these are rows-only entries with a
tolerance-vs-exact property test (tests/test_operators.py) instead of a
hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from user_feed_cdc_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register("sketch_distinct_users", None)  # approximate → rows-only
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user HLL sketches, PLUS the corpus total
    computed by unioning the per-type sketches — no second scan of the
    input, demonstrating sketch mergeability (the reason to store
    sketches, not counts, in a rollup table)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    total = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate("sk").alias("approx_users"),
        )
    )
    return per_est.unionByName(total)


@_register("sketch_value_quantiles", None)  # approximate → rows-only
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-event-type value quantiles via approx_percentile
    (Greenwald-Khanna): the scale companion to agg_percentiles' exact
    buffers. Exact percentiles hold every group value in memory — fine
    for 3 bounded groups, fatal for high-cardinality keys at 100 TB;
    the GK sketch is fixed-size per group and mergeable across
    partitions, so the plan is an ordinary 2-phase hash aggregate.
    Accuracy (rel. error ≤ 1/accuracy=1e-4) is pinned against the exact
    path by tests/test_operators.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
        F.approx_percentile("value", F.lit(0.95), F.lit(10000)).alias("p95_approx"),
        F.count(F.lit(1)).alias("n"),
    )


_HLL_BOUND_ORACLE = """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
"""


@_register("sketch_distinct_users_bounded", _HLL_BOUND_ORACLE)
def sketch_distinct_users_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated error-bound certification for the HLL path: per
    event_type, the EXACT distinct count (matching the oracle's) plus a
    boolean asserting the HLL estimate landed within 5% of it. HLL
    register merges are commutative (per-register max), so the estimate
    is deterministic regardless of partitioning — if a Spark upgrade or
    a conf change ever degraded the sketch beyond the bound, the boolean
    flips and the value-hash gate fails. This is the strongest oracle an
    approximate operator admits: the oracle can't reproduce the
    estimate, but it can hold the estimator to its contract."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("_approx"),
    )
    within = (
        F.abs(F.col("_approx") - F.col("exact_users"))
        / F.col("exact_users")
        <= 0.05
    )
    return agg.select("event_type", "exact_users", within.alias("within_5pct"))
