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
    )

    mods = [
        relational, feed, textanalysis, dedup, similarity,
        multimodal, pipeline, sketches, asof, cdc, event_windows,
    ]
    assert sum(len(m.QUERIES) for m in mods) == len(qs)


def test_entry_flagship(spark):
    df = em.entry(spark)
    assert df.columns == ["follower_id", "event_id", "author_id", "event_type", "ts", "rn"]
    assert df.count() > 0
