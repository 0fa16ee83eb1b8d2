"""Property/invariant tests for operators whose correctness the DuckDB
oracle can't fully pin (SURVEY.md §5.4): dedup idempotence, LSH recall
against exact Jaccard ground truth, cosine bounds, feed ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from user_feed_cdc_spark.operators.dedup import (
    dedup_exact_latest_event,
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    lsh_candidate_pairs,
)
from user_feed_cdc_spark.operators.feed import feed_topk_per_user
from user_feed_cdc_spark.operators.similarity import cosine, similarity_cosine_topk
from user_feed_cdc_spark.sources.tables import load_table


def test_dedup_idempotent(spark, sf_dir):
    once = dedup_exact_latest_event(spark, sf_dir)
    # applying the same keep-latest rule to the deduped output is a no-op
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    twice = once.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # exactly one row per (user_id, event_type)
    assert once.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0


def test_lsh_recall_against_exact_jaccard(spark, sf_dir):
    """Every high-similarity pair found by the exact O(n²) baseline must
    be surfaced by the LSH path (recall at jaccard ≥ 0.6 with 8×4 bands
    should be ~1 at this scale; we require 100% on the bounded set)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.8).collect()
    }
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    lsh = {
        (r.id_a, r.id_b) for r in lsh_candidate_pairs(docs.select("doc_id", "text")).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed {len(missed)} of {len(exact)} exact pairs"


def test_minhash_lsh_cluster_invariants(spark, sf_dir):
    """Cluster-assignment output: one row per doc, rep is min of its
    cluster, rep closure holds (rep of a rep is itself), and docs with
    near-identical trigram shingle sets co-cluster."""
    out = dedup_minhash_lsh(spark, sf_dir)
    rows = out.collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    rep = {r.doc_id: r.rep_id for r in rows}
    assert all(rid <= did for did, rid in rep.items())
    assert all(rep[rid] == rid for rid in set(rep.values()))  # closure

    # recall: trigram-jaccard >= 0.9 pairs (bounded exact baseline) must
    # land in the same cluster
    from user_feed_cdc_spark.operators.dedup import shingles

    sh = (
        docs.filter(F.col("doc_id") < 200)
        .select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    )
    a = sh.select(F.col("doc_id").alias("da"), F.col("sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("db"), F.col("sh").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")) / F.size(
        F.array_distinct(F.concat("sa", "sb"))
    )
    close = (
        a.join(b, F.col("da") < F.col("db"))
        .filter(jac >= 0.9)
        .select("da", "db")
        .collect()
    )
    missed = [(p.da, p.db) for p in close if rep[p.da] != rep[p.db]]
    assert not missed, f"{len(missed)}/{len(close)} near-identical pairs split"


def test_cosine_bounds_and_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    sims = emb.select(cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in sims)
    top = similarity_cosine_topk(spark, sf_dir).collect()
    assert len(top) == 10
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in top)
    # descending order
    scores = [r.cos_sim for r in top]
    assert scores == sorted(scores, reverse=True)


def test_feed_topk_ordering(spark, sf_dir):
    feed = feed_topk_per_user(spark, sf_dir).collect()
    per_user: dict = {}
    for r in feed:
        per_user.setdefault(r.follower_id, []).append(r)
    for rows in per_user.values():
        assert len(rows) <= 10
        rows = sorted(rows, key=lambda r: r.rn)
        ts = [(r.ts, r.event_id) for r in rows]
        assert ts == sorted(ts, reverse=True)  # newest first, event_id tiebreak
