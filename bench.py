"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line:

    {"metric": "suite_total_sec", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": sf, "n_queries": N,
     "other_sec": S}

``value`` covers ALL queries. The per-query breakdown in ``queries`` is
limited to the 50-query headline window (the driver's correctness
window) so the final line stays under the driver's 2000-char stdout
capture — round 1's full 110-query line exceeded it and the driver
recorded ``parsed: null``. The remaining queries are aggregated in
``other_sec``; the full per-query breakdown is written to
``BENCH_DETAIL.json`` next to this script for the judge.

Each query is timed to full materialization (collect — all registered
queries return small results by construction). A JVM/session warmup
query runs first so startup cost is not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="spark-graft-bench")
    queries = registry.get_queries()
    # Headline = the driver's correctness window, pinned to
    # registry._PRIORITY — restored to == now the round-9 window is
    # full at 50 explicit slots (ADVICE r8: while a window is
    # mid-round short of 50, the tail auto-fills in registration order
    # under test_priority_window_integrity's previously-green rule,
    # and this assert relaxes to <=).
    assert len(registry._PRIORITY) == registry.PRIORITY_WINDOW
    headline = set(list(queries)[: registry.PRIORITY_WINDOW])

    # Warmup: touch the session + parquet footers once, then build the
    # session-memoized shared frames (LSH pairs, cluster labels, ANN
    # bucket/IVF assignments, co-supply edges, daily event rollups) so
    # no timed query is charged a whole family's pipeline build just
    # for running first (VERDICT r8 task 4).
    queries["word_count"](spark, sf_dir).limit(1).collect()
    registry.warm_shared_frames(spark, sf_dir)
    # ... and the mtime-guarded derived layouts (bucketed tables,
    # IVF-PQ index, partitioned/z-ordered events, dirty JSONL feed), so
    # probe-side queries measure reads, not one-off layout builds
    # (VERDICT r9 task 6).
    registry.warm_derived_layouts(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query should not zero the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0
        # Drop caches a query persisted for intra-plan reuse (e.g. the
        # LSH shingle-set frame) so blocks never accumulate across the
        # 120+ query run and timings stay independent.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump({"sf": sf, "total_sec": total, "queries": timings}, f, indent=1, sort_keys=True)
    other = round(
        sum(t for n, t in timings.items() if t >= 0 and n not in headline), 3
    )

    # Emit ONE JSON line, hard-capped under the driver's 2000-char stdout
    # capture. Start from the headline window sorted slowest-first and
    # drop the fastest entries until the line fits — `value` always
    # covers the full suite and BENCH_DETAIL.json always has every
    # query, so truncation loses only per-query display, not data.
    shown = sorted(
        ((n, t) for n, t in timings.items() if n in headline),
        key=lambda kv: -kv[1],
    )
    while True:
        payload = {
            "metric": "suite_total_sec",
            "value": total,
            "unit": "sec",
            "queries": dict(shown),
            "sf": sf,
            "n_queries": len(timings),
            "other_sec": other,
        }
        if len(shown) < len(headline):
            payload["queries_omitted"] = len(headline) - len(shown)
        line = json.dumps(payload, separators=(",", ":"))
        if len(line) <= 1900 or not shown:
            break
        shown = shown[:-1]
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
