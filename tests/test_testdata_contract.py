"""Driver-testdata contract (VERDICT r04 item 2).

Every other test runs on synthetic fixtures, so a driver-side format
change to /root/testdata can silently break the oracle-checked queries
while the suite stays green — exactly what happened in round 4 when
events.ts switched from TIMESTAMP(NANOS) to TIMESTAMP(MICROS). This
module pins the real parquet: load_table must yield the canonical
schema, non-empty tables, and value ranges a 2024-vintage TPC-H-ish
generator would produce. A driver format drift fails HERE, loudly.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from user_feed_cdc_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS
from user_feed_cdc_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_schema_and_rows(spark, name):
    df = load_table(spark, SF_DIR, name)
    assert df.schema == TABLE_SCHEMAS[name], (
        f"{name}: driver parquet no longer loads as the canonical schema\n"
        f"  got:      {df.schema.simpleString()}\n"
        f"  expected: {TABLE_SCHEMAS[name].simpleString()}"
    )
    assert df.count() > 0, f"{name}: driver parquet is empty"


def test_events_ts_sane_range(spark):
    """The round-4 failure mode: a wrong physical-type interpretation
    lands every timestamp in 1970. Pin that ts stays in a plausible
    data-generation window."""
    lo, hi = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("min(ts)", "max(ts)")
        .first()
    )
    assert dt.datetime(2020, 1, 1) <= lo <= hi <= dt.datetime(2030, 1, 1), (
        f"events.ts out of sane range: min={lo} max={hi} — "
        "physical-type misread (1970 collapse) or driver drift"
    )
    # and the values must span real activity, not a collapsed sliver
    assert hi - lo > dt.timedelta(days=1)


def test_lineitem_shipdate_sane_range(spark):
    """TPC-H ship dates live in the classic 1992-2002 window."""
    lo, hi = (
        load_table(spark, SF_DIR, "lineitem")
        .selectExpr("min(l_shipdate)", "max(l_shipdate)")
        .first()
    )
    assert dt.datetime(1990, 1, 1) <= lo <= hi <= dt.datetime(2010, 1, 1)


def test_embeddings_shape(spark):
    row = load_table(spark, SF_DIR, "embeddings").first()
    assert len(row.embedding) > 0


# ---------------------------------------------------------------------------
# load_events format matrix: the three physical ts encodings the sniffer
# handles, plus its guard rails (mixed dirs, empty dirs, in-place
# rewrite invalidation, conf hygiene). All on synthetic files — the
# driver only ever ships one format at a time, but the reader must keep
# handling all of them (the round-4 lesson).
# ---------------------------------------------------------------------------

_TS = [1704456000000000, 1704456060000000]  # 2024-01-05 12:00/12:01 UTC, µs


def _write_events(path, unit):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(_TS)
    if unit == "int64":
        ts_arr = pa.array([t * 1000 for t in _TS], pa.int64())  # raw nanos
    else:
        ts_arr = pa.array(_TS if unit == "us" else [t * 1000 for t in _TS]).cast(
            pa.timestamp(unit)
        )
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(table, path, version="2.6")


@pytest.mark.parametrize("unit", ["us", "ns", "int64"])
def test_load_events_handles_every_physical_type(spark, tmp_path, unit):
    """Same wall-clock values out of all three encodings."""
    from user_feed_cdc_spark.sources.tables import load_events

    p = str(tmp_path / f"events_{unit}.parquet")
    _write_events(p, unit)
    got = sorted(r.ts for r in load_events(spark, p).select("ts").collect())
    assert [t.isoformat() for t in got] == [
        "2024-01-05T12:00:00",
        "2024-01-05T12:01:00",
    ], (unit, got)


def test_load_events_ns_read_restores_conf(spark, tmp_path):
    """The legacy nanosAsLong conf must not leak past the one read that
    needs it — and the read itself must still produce correct values
    after the restore (the conf is bound at plan analysis)."""
    from user_feed_cdc_spark.sources.tables import load_events

    key = "spark.sql.legacy.parquet.nanosAsLong"
    assert spark.conf.get(key, None) in (None, "false")
    p = str(tmp_path / "events_ns.parquet")
    _write_events(p, "ns")
    df = load_events(spark, p)
    assert spark.conf.get(key, None) in (None, "false"), "conf leaked"
    assert df.select("ts").count() == 2  # executes AFTER the restore
    assert min(r.ts for r in df.collect()).year == 2024


def test_load_events_rejects_mixed_directory(spark, tmp_path):
    """A directory mixing physical ts types must error loudly, not read
    half the files as 1970."""
    from user_feed_cdc_spark.sources.tables import load_events

    d = tmp_path / "events_mixed"
    d.mkdir()
    _write_events(str(d / "a.parquet"), "us")
    _write_events(str(d / "b.parquet"), "int64")
    with pytest.raises(ValueError, match="mixes ts physical types"):
        load_events(spark, str(d))


def test_load_events_empty_directory_names_path(spark, tmp_path):
    from user_feed_cdc_spark.sources.tables import load_events

    d = tmp_path / "events_empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="events_empty"):
        load_events(spark, str(d))


def test_load_events_resniffs_after_inplace_rewrite(spark, tmp_path):
    """Regenerating a file in place with a different physical type must
    invalidate the cached sniff (mtime-keyed cache)."""
    import os as _os
    import time as _time

    from user_feed_cdc_spark.sources.tables import load_events

    p = str(tmp_path / "events.parquet")
    _write_events(p, "us")
    assert load_events(spark, p).count() == 2
    _time.sleep(0.01)
    _write_events(p, "int64")
    _os.utime(p)  # ensure a new mtime even on coarse filesystems
    got = [r.ts.year for r in load_events(spark, p).collect()]
    assert got == [2024, 2024], f"stale sniff misread rewritten file: {got}"


def test_argmax_packed_key_preconditions(spark):
    """agg_argmax_funcs packs (value_cents, user_id) into one bigint
    ordering key: cents * 10^9 + user_id. That is a valid lexicographic
    order only while user_id < 10^9 (no bleed into the cents bits) and
    cents < ~9.2*10^9 (bigint headroom). Pin both on the driver data so
    a generator change that violates the packing fails HERE, not as a
    silent wrong-argmax."""
    from pyspark.sql import functions as F

    row = (
        load_table(spark, SF_DIR, "events")
        .agg(
            F.max("user_id").alias("max_uid"),
            F.min("user_id").alias("min_uid"),
            F.max(F.floor(F.col("value") * 100.0 + F.lit(0.5))).alias(
                "max_cents"
            ),
            F.min(F.floor(F.col("value") * 100.0 + F.lit(0.5))).alias(
                "min_cents"
            ),
        )
        .first()
    )
    assert row.max_uid < 1_000_000_000, (
        f"user_id {row.max_uid} >= 10^9: agg_argmax_funcs packed ordering "
        "key would bleed into the value bits — switch to the struct form"
    )
    assert row.min_uid >= 0, (
        f"user_id {row.min_uid} < 0: negative ids bleed into the cents bits"
    )
    assert row.max_cents < 9_200_000_000, (
        f"value_cents {row.max_cents} risks bigint overflow in the packed key"
    )
    assert row.min_cents > -9_200_000_000, (
        f"value_cents {row.min_cents} risks bigint underflow in the packed key"
    )
