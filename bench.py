"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Each query is timed to full materialization (collect — all registered
queries return small results by construction). A JVM/session warmup query
runs first so startup cost is not attributed to the first query.
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

    # Warmup: touch the session + parquet footers once.
    queries["word_count"](spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query should not zero the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
