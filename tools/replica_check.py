"""Standalone replica of the driver's correctness gate at any SF.

Usage: python tools/replica_check.py [sf_dir] [name_filter ...]

Runs every registered query that has a DuckDB oracle against the given
parquet dir (default the driver's sf0.01) and prints one line per query:
OK / FAIL(reason). Exit code 1 if any query fails. This is the
pre-flight for CORRECTNESS_r{N}.json — the pytest suite runs the same
compare at sf0.001 (tests/test_oracle_parity.py); this tool exists to
catch scale-surfaced divergence (rounding boundaries, 2^53 float sums)
at the driver's actual SF before the driver does.
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb

from hadoop_cs4225_spark import registry
from hadoop_cs4225_spark.session import get_spark
from hadoop_cs4225_spark.sources.tables import TABLES


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return repr(value)
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, list):
        return tuple(_normalize(v) for v in value)
    return str(value)


def compare(spark_df, duck_rel):
    # The driver reads the oracle side via pandas, where DuckDB
    # HUGEINT/DECIMAL degrade to float64 and can never hash-match
    # Spark's bigint/Decimal — fail fast on those types (round-2
    # post-mortem: 6 red rows were exactly this, invisible to the
    # old fetchall() path which yields exact Python ints).
    bad = [
        (c, str(t))
        for c, t in zip(duck_rel.columns, duck_rel.types)
        if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
    ]
    if bad:
        return f"oracle emits driver-hostile types (pandas->float64): {bad}"
    sp_cols = sorted(spark_df.columns)
    du_cols = sorted(duck_rel.columns)
    if sp_cols != du_cols:
        return f"columns {sp_cols} vs {du_cols}"
    sp_rows = [tuple(_normalize(r[c]) for c in sp_cols) for r in spark_df.collect()]
    order = [duck_rel.columns.index(c) for c in du_cols]
    du_rows = [tuple(_normalize(r[i]) for i in order) for r in duck_rel.fetchall()]
    if len(sp_rows) != len(du_rows):
        return f"rows {len(sp_rows)} vs {len(du_rows)}"
    a, b = sorted(sp_rows), sorted(du_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"values differ, first: {diffs}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    registry.load_all()
    names = sorted(registry.ORACLES)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]
    spark = get_spark(app_name="replica-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name in names:
        try:
            err = compare(registry.QUERIES[name](spark, sf_dir), con.sql(registry.ORACLES[name]))
        except Exception as e:  # noqa: BLE001 — report and continue
            traceback.print_exc()
            err = f"exception: {e}"
        if err:
            failed.append(name)
            print(f"FAIL {name}: {err[:400]}")
        else:
            print(f"OK   {name}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green at {sf_dir}")
    if failed:
        print("failed:", failed)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
