"""Feed read path — the reference's one real query, re-expressed in Spark.

Reference semantics (main.py:136-189 + README): a user's feed is the
activities of the users they follow, newest-first, paginated. The
reference reads the follow-edge list from Postgres, then issues a
`user_id IN (...)` query against Cassandra whose clustering order
(activity_id TIMEUUID DESC, cassandra-init.cql:14-15) returns rows
newest-first per user.

Spark design: the edge list stays a DataFrame (never collected to the
driver — at 100 TB a celebrity user's edge list won't fit), the IN-list
becomes a broadcast/shuffle equi-join, and the implicit storage order
becomes an explicit window `row_number() over (partition by follower
order by ts desc)` — Spark's WindowGroupLimit pushes the k-limit below
the shuffle so each map task emits ≤k rows per key.

Testdata stand-ins: `events` plays the activity table
(user_id, ts, event_type ≈ user_id, event_timestamp, activity_type);
the follow-edge table is derived deterministically: every user follows
user_id+1 and user_id+2 (SQL-expressible so the DuckDB oracle can check
it end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from user_feed_cdc_spark.functions.numeric import round_half_up as r2
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


def derived_followers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic follow-edge table over the events user population:
    u follows u+1 and u+2 (when those users exist).

    Shaped as explode + left-semi EQUI-join: the candidate edges are
    generated row-locally (explode of a 2-element array — narrow, no
    shuffle) and the existence check is a hash-joinable equality. The
    naive OR-of-two-equalities join condition cannot hash-partition, so
    Catalyst plans BroadcastNestedLoopJoin — O(users²) at scale — on the
    flagship entry() path. This form plans a broadcast/shuffle hash join."""
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    candidates = users.select(
        F.col("user_id").alias("follower_id"),
        F.explode(
            F.array(F.col("user_id") + 1, F.col("user_id") + 2)
        ).alias("following_id"),
    )
    return candidates.join(
        users.select(F.col("user_id").alias("following_id")),
        "following_id",
        "left_semi",
    )


_FOLLOWERS_CTE = """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    followers AS (
        SELECT a.user_id AS follower_id, b.user_id AS following_id
        FROM users a JOIN users b
          ON b.user_id = a.user_id + 1 OR b.user_id = a.user_id + 2
    )
"""


@_register(
    "feed_topk_per_user",
    _FOLLOWERS_CTE
    + """
    SELECT follower_id, event_id, author_id, event_type, ts, rn
    FROM (
        SELECT f.follower_id, e.event_id, e.user_id AS author_id,
               e.event_type, e.ts,
               ROW_NUMBER() OVER (PARTITION BY f.follower_id
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM followers f JOIN events e ON e.user_id = f.following_id
    )
    WHERE rn <= 10
    """,
)
def feed_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every user's feed at once: newest 10 activities from the users they
    follow. This is the materialized-feed form of the reference's per-user
    endpoint (main.py:136-189) — at scale you compute all feeds in one job
    instead of one point query per user. event_id is the deterministic
    tiebreaker standing in for the reference's TIMEUUID ordering
    (SURVEY.md §7.3.1)."""
    events = load_table(spark, sf_dir, "events")
    followers = derived_followers(spark, sf_dir)
    joined = followers.join(
        events, events.user_id == followers.following_id
    )
    w = W.partitionBy("follower_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        joined.select(
            "follower_id",
            "event_id",
            F.col("user_id").alias("author_id"),
            "event_type",
            "ts",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
    )


@_register(
    "feed_single_user_page",
    _FOLLOWERS_CTE
    + """
    SELECT e.event_id, e.user_id AS author_id, e.event_type, e.ts,
           FLOOR(e.value * 100.0 + 0.5) / 100.0 AS value
    FROM events e
    WHERE e.user_id IN (SELECT following_id FROM followers WHERE follower_id = 3)
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 100
    """,
)
def feed_single_user_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference endpoint verbatim: GET /cassandra/activities?user_id=3
    &limit=100 (main.py:136-168). Broadcast left-semi join against the tiny
    filtered edge list + global top-k (TakeOrderedAndProject)."""
    events = load_table(spark, sf_dir, "events")
    edges = (
        derived_followers(spark, sf_dir)
        .filter(F.col("follower_id") == 3)
        .select(F.col("following_id").alias("user_id"))
    )
    return (
        events.join(F.broadcast(edges), "user_id", "left_semi")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .select(
            "event_id",
            F.col("user_id").alias("author_id"),
            "event_type",
            "ts",
            r2(F.col("value")).alias("value"),
        )
        .limit(100)
    )


@_register(
    "feed_single_user_page_offset",
    _FOLLOWERS_CTE
    + """
    SELECT e.event_id, e.user_id AS author_id, e.event_type, e.ts,
           FLOOR(e.value * 100.0 + 0.5) / 100.0 AS value
    FROM events e
    WHERE e.user_id IN (SELECT following_id FROM followers WHERE follower_id = 3)
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 100 OFFSET 100
    """,
)
def feed_single_user_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference endpoint's second page: limit=100 offset=100
    (main.py:137,164-166 — note CQL has no OFFSET, a reference bug
    SURVEY.md §7.3.4; this implements the documented intent). Plan shape:
    top-(offset+limit) via TakeOrderedAndProject (per-task k-heaps, never
    a global sort), then a row_number slice over that bounded ≤200-row
    set — the single-partition window is safe because its input is
    already limited."""
    limit, offset = 100, 100
    events = load_table(spark, sf_dir, "events")
    edges = (
        derived_followers(spark, sf_dir)
        .filter(F.col("follower_id") == 3)
        .select(F.col("following_id").alias("user_id"))
    )
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    page = (
        events.join(F.broadcast(edges), "user_id", "left_semi")
        .orderBy(*order)
        .limit(offset + limit)
    )
    w = W.orderBy(*order)
    return (
        page.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .select(
            "event_id",
            F.col("user_id").alias("author_id"),
            "event_type",
            "ts",
            r2(F.col("value")).alias("value"),
        )
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: the all-users feed top-k."""
    return feed_topk_per_user(spark, sf_dir)
