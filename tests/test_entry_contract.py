"""Driver-contract meta-tests: the __spark_entry__ registry is the
product surface — these guard its invariants so a refactor can't
silently drop or shadow an operator.
"""

from __future__ import annotations

import __spark_entry__ as em


def test_registry_invariants():
    qs, oracles = em.queries(), em.oracle_sql()
    # every oracle has a query; every callable takes (spark, sf_dir)
    assert set(oracles) <= set(qs)
    assert len(qs) >= 82, f"registry shrank to {len(qs)} entries"
    # oracle-checked coverage stays the overwhelming majority
    assert len(oracles) / len(qs) >= 0.85
    # no module-level name collisions silently shadowing operators
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
        tpch,
    )
    from user_feed_cdc_spark.sources import formats

    mods = [
        relational, feed, textanalysis, dedup, similarity,
        multimodal, pipeline, sketches, asof, cdc, event_windows,
        formats, tpch,
    ]
    assert sum(len(m.QUERIES) for m in mods) == len(qs)


def test_oracles_emit_driver_hashable_types():
    """The r03 failure class, pinned at test time instead of
    check-correctness time: DuckDB HUGEINT (un-cast integer SUM /
    list_sum) and DECIMAL hash differently than BIGINT/DOUBLE in the
    driver's normalizer. Bind every oracle against empty views and
    reject those types in the result schema — no data needed, so this
    is fast enough to run on every pytest invocation."""
    import duckdb

    from user_feed_cdc_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

    _SPARK_TO_DUCK = {
        "LongType()": "BIGINT",
        "IntegerType()": "INTEGER",
        "DoubleType()": "DOUBLE",
        "FloatType()": "FLOAT",
        "StringType()": "VARCHAR",
        "TimestampType()": "TIMESTAMP",
        "DateType()": "DATE",
        "BooleanType()": "BOOLEAN",
        "BinaryType()": "BLOB",
    }
    con = duckdb.connect()
    for t in TABLE_NAMES:
        cols = []
        for f in TABLE_SCHEMAS[t].fields:
            duck_t = _SPARK_TO_DUCK.get(repr(f.dataType))
            if duck_t is None:  # array<float> embedding etc.
                duck_t = "FLOAT[]" if "Array" in repr(f.dataType) else "VARCHAR"
            cols.append(f"CAST(NULL AS {duck_t}) AS {f.name}")
        con.execute(
            f"CREATE VIEW {t} AS SELECT {', '.join(cols)} WHERE FALSE"
        )
    offenders = {}
    for name, sql in em.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception as e:  # noqa: BLE001 — surface which oracle broke
            offenders[name] = f"bind error: {type(e).__name__}: {e}"[:160]
            continue
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if "HUGEINT" in str(t).upper()
            or "DECIMAL" in str(t).upper()
            # the r07 failure class: the driver's canonicalizer
            # (pandas sort_values over every column) crashes on
            # unhashable list/dict cells, so NO oracle-backed entry
            # may emit ARRAY/MAP/STRUCT columns — CSV-join or
            # posexplode them to scalars on both sides
            or "[]" in str(t)
            or str(t).upper().startswith(("MAP", "STRUCT", "LIST"))
        ]
        if bad:
            offenders[name] = str(bad)
    assert not offenders, f"driver-unhashable oracle outputs: {offenders}"


def test_reshaped_entries_emit_scalar_columns(spark, sf_dir):
    """Spark-side twin of the array/map oracle gate for the three
    entries the r07 driver window crashed on (unhashable list cells in
    its canonicalizer): their certified output schemas must stay
    scalar-only after the CSV-join reshape. The registry-wide sweep
    lives in tools/check_correctness.py (runs every entry per round);
    these three are the known regression surface."""
    from pyspark.sql import types as T

    qs = em.queries()
    for name in (
        "similarity_pandas_udf_normalize",
        "text_hashed_features",
        "text_inverted_index",
    ):
        schema = qs[name](spark, sf_dir).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        assert not complex_cols, (name, complex_cols)


def test_entry_flagship(spark):
    df = em.entry(spark)
    assert df.columns == ["follower_id", "event_id", "author_id", "event_type", "ts", "rn"]
    assert df.count() > 0


def test_canonical_schemas_immutable_across_registry(spark):
    """The permissive-reader regression class: a query that derives a
    variant schema must COPY, never mutate, the shared TABLE_SCHEMAS
    entries — a mutation silently rides along for every later read in
    the session (and a second derivation duplicates the column and
    fails them all). Run the corrupt-record entry twice and pin the
    canonical schema's field count."""
    import __spark_entry__ as em
    from user_feed_cdc_spark.schemas import TABLE_SCHEMAS

    before = {n: len(s.fields) for n, s in TABLE_SCHEMAS.items()}
    fn = em.queries()["source_json_permissive"]
    fn(spark, "/root/testdata/sf0.01").collect()
    fn(spark, "/root/testdata/sf0.01").collect()
    after = {n: len(s.fields) for n, s in TABLE_SCHEMAS.items()}
    assert before == after, "a registry entry mutated TABLE_SCHEMAS"
