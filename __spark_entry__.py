"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship feed query on sf0.001 (SURVEY.md §3.2).
queries()     -> every implemented operator from SURVEY.md §2, keyed by name.
oracle_sql()  -> matching DuckDB SQL for the value-hash correctness gate;
                 keys absent here get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: all-users feed top-k (newest 10 activities of followed
    users per follower) on sf0.001."""
    from user_feed_cdc_spark.operators.feed import flagship

    return flagship(spark, SF0001)


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    from user_feed_cdc_spark.operators import (
        asof,
        cdc,
        dedup,
        event_windows,
        feed,
        multimodal,
        pipeline,
        relational,
        similarity,
        sketches,
        textanalysis,
    )

    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    # Registration order is the driver's check order, and the driver only
    # certifies a prefix of the registry (round 2 covered exactly the first
    # 50 entries).  Rotate per round so no query goes two consecutive rounds
    # without a driver row: modules whose entries have never been (or were
    # not last round) driver-checked come FIRST; the large relational block
    # (all green in round 2) comes last.  Round 4 should rotate relational
    # back toward the front.
    for mod in (
        similarity,
        multimodal,
        cdc,
        event_windows,
        asof,
        pipeline,
        sketches,
        dedup,
        textanalysis,
        feed,
        relational,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
