"""Pin the approx profile (registered default) against its exact twin.

`orders_profile` has no DuckDB oracle — HLL estimates are
engine-specific — so its accuracy contract lives here: every stat except
n_distinct must be IDENTICAL to `orders_profile_exact`, and n_distinct
must sit within the configured rsd bound (0.05, pinned with headroom at
3 sigma) of the exact count. The exact twin itself is oracle-verified in
tests/test_oracle_parity.py, so this transitively anchors the approx
path to DuckDB too.
"""

from __future__ import annotations

from hadoop_cs4225_spark.operators.pipeline_ops import (
    orders_profile,
    orders_profile_exact,
)
from tests.conftest import SF_ORACLE


def test_approx_profile_matches_exact_within_rsd(spark):
    approx = {r["column_name"]: r for r in orders_profile(spark, SF_ORACLE).collect()}
    exact = {
        r["column_name"]: r for r in orders_profile_exact(spark, SF_ORACLE).collect()
    }
    assert sorted(approx) == sorted(exact)
    for col, ex in exact.items():
        ap = approx[col]
        for field in ("n_rows", "n_null", "min_s", "max_s"):
            assert ap[field] == ex[field], (col, field, ap[field], ex[field])
        rel_err = abs(ap["n_distinct"] - ex["n_distinct"]) / max(ex["n_distinct"], 1)
        assert rel_err <= 3 * 0.05, (col, ap["n_distinct"], ex["n_distinct"])
