"""Isolate one or more queries: time the noop sink N times, dump the
formatted plan, and (for streaming entries) the per-batch durationMs
breakdown from every streaming query's recentProgress.

Usage: python tools/profile_query.py name1,name2 [--sf DIR] [--n 3]
       [--plans OUTDIR]

Timing methodology matches bench.py (noop sink, min over passes);
plans go to OUTDIR/<name>_<tag>.txt when --plans is given.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from user_feed_cdc_spark.session import get_spark


def main() -> None:
    argv = list(sys.argv[1:])
    names = argv[0].split(",") if argv else []
    sf_dir = "/root/testdata/sf0.1"
    n_pass = 3
    plans_dir = None
    tag = "before"
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--n" in argv:
        n_pass = int(argv[argv.index("--n") + 1])
    if "--plans" in argv:
        plans_dir = argv[argv.index("--plans") + 1]
    if "--tag" in argv:
        tag = argv[argv.index("--tag") + 1]

    spark = get_spark("profile")
    qs = entry_mod.queries()
    from user_feed_cdc_spark.operators.cdc import cdc_fixture_json

    try:
        cdc_fixture_json(spark, sf_dir).count()  # untimed shared fixture
    except Exception:
        pass

    # Streaming breakdown: a listener accumulates every progress event
    # (durationMs per micro-batch) so live entries can be attributed to
    # addBatch / getBatch / walCommit / stateStore time, not guessed at.
    progress_log: list[dict] = []
    try:
        from pyspark.sql.streaming import StreamingQueryListener

        class _ProgListener(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                progress_log.append(
                    {
                        "name": p.name,
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "durationMs": dict(p.durationMs),
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        spark.streams.addListener(_ProgListener())
    except Exception as e:
        print(f"no streaming listener: {e}", file=sys.stderr)

    from user_feed_cdc_spark.operators.cdc import evict_fixture_cache

    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for i in range(n_pass):
            # bench.py pass hygiene: accumulated persisted blocks and
            # local checkpoints otherwise crowd the storage pool and
            # later passes degrade (BENCH_r04 finding)
            spark.catalog.clearCache()
            evict_fixture_cache(spark)
            spark.sparkContext._jvm.System.gc()
            progress_log.clear()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            if i == 0 and plans_dir:
                os.makedirs(plans_dir, exist_ok=True)
                with open(
                    os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
        # Methodology note (r16 ADVICE item 3): unlike bench.py, the
        # cache flush + GC here runs before EVERY pass, so every pass
        # is cold — these numbers measure isolated cold latency and
        # are NOT like-for-like with bench.py's min-of-3 (which
        # flushes once per suite pass). Recorded in the JSON so later
        # rounds don't cross-compare them as equivalents.
        out[name] = {
            "times": times,
            "min": min(times),
            "methodology": "cold_per_pass_flush",
        }
        if progress_log:
            out[name]["progress"] = list(progress_log)
        print(name, times, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
