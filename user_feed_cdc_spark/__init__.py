"""user_feed_cdc_spark — a PySpark-native analytics engine.

A ground-up Spark rebuild of the query + data-processing capabilities of
``codeshardlabs/user-feed-cdc`` (reference at /root/reference, studied for
semantics only):

- CDC change-event pipeline (Debezium-shaped JSON -> canonical activity
  records -> partitioned feed table) as one Structured Streaming query
  (reference: event_processor.py, strategy.py).
- Feed read path (follow-edge semi-join + per-user newest-first top-k;
  reference: main.py:136-189, cassandra-init.cql:14-15).
- Core relational operators (scan/filter/join/agg/window/sort/set ops)
  expressed declaratively so Catalyst handles pushdown, pruning, join
  selection and AQE.
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH clustering /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search
  (brute-force, hyperplane-LSH, IVF), text analysis (incl. TF-IDF,
  winnowing fingerprints, regex tokenization), multimodal binary
  columns, corpus split/clean pipelines, mergeable HLL sketches,
  as-of + banded range joins, custom stateful streaming — designed for
  100 TB scale (LSH bucketing, no driver-side loops, broadcast only
  for genuinely small sides; see SCALE.md).
"""

__version__ = "0.1.0"
