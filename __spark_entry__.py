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

    merged: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
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
        merged.update(mod.QUERIES)
        oracles.update(mod.ORACLES)

    # Registration order is the driver's check order, and the driver only
    # certifies a PREFIX of the registry (rounds 2-3 each covered exactly
    # the first 50 entries). Rotation invariant: no query goes two
    # consecutive rounds without a driver row. Round-4 window = the 7
    # oracle-cast re-fixes (hash-failed r03, fix must be certified) +
    # every entry absent from CORRECTNESS_r03 (feed/relational/text tail,
    # last checked r02) + new round-4 operators; r03-green entries fill
    # the back and rotate in next round.
    priority = [
        # r03 hash-fails, oracles re-cast to BIGINT this round
        "text_lang_rollup", "multimodal_rollup",
        "pipeline_shuffle_shards", "pipeline_source_mixture",
        "pipeline_mixture_weighted", "pipeline_pack_sequences",
        "dedup_simhash_md5",
        # absent from CORRECTNESS_r03 (last driver row: r02)
        "text_winnow_fingerprints", "text_chunk_documents",
        "feed_topk_per_user", "feed_single_user_page",
        "feed_single_user_page_offset",
        "filter_project", "pricing_summary", "agg_distinct",
        "rollup_flag_status", "cube_status_priority",
        "join_inner", "join_broadcast_dim", "join_semi", "join_anti",
        "join_left_outer", "join_full_outer", "null_safe_funcs",
        "join_multiway_region_revenue", "window_topk_per_customer",
        "window_running_analytics", "window_rank_family",
        "sort_limit_topk", "set_ops", "string_funcs", "date_funcs",
        "date_arithmetic", "math_funcs", "case_when_pivot",
        "json_extract", "subquery_scalar_and_correlated",
        "agg_percentiles", "array_funcs", "grouping_sets_revenue",
        "window_range_frame", "agg_salted_hot_keys",
        "events_hourly_rollup", "unpivot_flag_measures",
        # new in round 4 (no driver row yet)
        "events_funnel_conversion", "text_bigram_top_terms",
    ]
    missing = [n for n in priority if n not in merged]
    assert not missing, f"priority list names unknown queries: {missing}"
    queries = {n: merged[n] for n in priority}
    queries.update(merged)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
