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
    # certifies a PREFIX of the registry (round 2 covered exactly the first
    # 50 entries). Entries with no driver row yet — or whose last row needs
    # refreshing (the round-2 text_lang_rollup hash fix, this round's new
    # operators) — are pinned to the front; everything else follows in
    # module order, so the window's tail slots rotate through round-2-green
    # entries. Rotate per round: no query should go two consecutive rounds
    # without a driver row.
    priority = [
        # never driver-checked or new this round
        "similarity_cosine_topk", "similarity_label_centroid_dist",
        "similarity_ivf_topk", "similarity_quantized_topk",
        "similarity_binary_hamming_topk", "similarity_rerank_topk",
        "similarity_ivf_kmeans_topk", "similarity_ann_lsh",
        "multimodal_binary_stats", "multimodal_rollup",
        "multimodal_frame_sample", "multimodal_feature_extract",
        "cdc_canonical_activities", "cdc_upsert_state",
        "cdc_metadata_map_stats", "cdc_dead_letter_stats",
        "events_sliding_counts", "events_session_stats",
        "events_attribution_join", "events_trending_users",
        "range_join_user_pairs", "asof_last_purchase_tolerance",
        "asof_last_purchase",
        "split_stratified_train", "pipeline_corpus_clean",
        "pipeline_decontaminate", "pipeline_shuffle_shards",
        "pipeline_source_mixture", "pipeline_mixture_weighted",
        "pipeline_pack_sequences",
        "sketch_distinct_users", "sketch_value_quantiles",
        "dedup_simhash_md5", "dedup_incremental_new_docs",
        "dedup_embedding_cosine", "dedup_embedding_lsh",
        "text_repetition_scores", "text_lang_rollup",
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
