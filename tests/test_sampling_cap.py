"""Algebraic self-check for `per_source_doc_cap`.

The oracle parity test proves Spark == DuckDB on the registered
aggregate; this pins the CLAIM the operator's docstring makes — that
the bucket-arithmetic formulation selects EXACTLY the same kept set as
the naive per-source window rank — by running both formulations in the
same Spark session and diffing per-source aggregates. If someone
breaks the boundary-bucket logic in a way that the (coarse) oracle
aggregate happens to mask, this catches it at the kept-set level.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.functions.hashing import hash60_seeded
from hadoop_cs4225_spark.operators.sampling import _CAP_SEED, DOC_CAP_K
from hadoop_cs4225_spark.registry import get_queries
from hadoop_cs4225_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def naive_rows(spark):
    docs = load_table(spark, SF, "documents")
    h = hash60_seeded(F.col("doc_id").cast("string"), _CAP_SEED)
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("rk")
    )
    kept = F.col("rk") <= DOC_CAP_K
    return {
        r["source"]: r
        for r in ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(kept.cast("long")).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .collect()
    }


def test_bucketed_cap_matches_naive_window_rank(spark, naive_rows):
    got = get_queries()["per_source_doc_cap"](spark, SF).collect()
    assert len(got) == len(naive_rows)
    for r in got:
        ref = naive_rows[r["source"]]
        assert (r["n_docs"], r["n_kept"], r["kept_chars"]) == (
            ref["n_docs"],
            ref["n_kept"],
            ref["kept_chars"],
        ), r["source"]
        assert r["cap_binds"] == int(ref["n_docs"] > DOC_CAP_K)


def test_cap_actually_binds_at_test_sf(spark, naive_rows):
    # guards the "K binds at every test SF" docstring claim — if the
    # testdata grows sparser, an unbinding cap silently stops
    # exercising the boundary ranking
    assert all(r["n_docs"] > DOC_CAP_K for r in naive_rows.values())
    assert all(r["n_kept"] == DOC_CAP_K for r in naive_rows.values())


def test_waterfill_matches_greedy_reference(spark):
    """Water-fill must match the textbook iterative reference (raise
    the level until the budget is spent, freezing saturated sources)
    and satisfy the allocation invariants."""
    import pandas as pd

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    sup = docs.groupby("source")["n_chars"].sum().astype("int64")
    budget = int(sup.sum()) // 2
    # iterative reference: repeatedly split the remaining budget
    # equally; any source whose supply is below its share saturates
    alloc = {}
    remaining = dict(sup)
    b = budget
    while remaining:
        level = b / len(remaining)
        sat = {s: v for s, v in remaining.items() if v <= level}
        if not sat:
            alloc.update({s: level for s in remaining})
            break
        for s, v in sat.items():
            alloc[s] = float(v)
            b -= v
            del remaining[s]
    got = (
        get_queries()["source_token_waterfill"](spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("source")
    )
    assert set(got.index) == set(sup.index)
    for s in sup.index:
        assert got.loc[s, "supply_chars"] == sup[s]
        assert abs(got.loc[s, "alloc_chars"] - alloc[s]) < 0.02
        assert bool(got.loc[s, "saturated"]) == (alloc[s] == float(sup[s]) and alloc[s] < budget)
        assert got.loc[s, "alloc_chars"] <= sup[s] + 0.01
    # the whole budget is spent (sum of allocations == budget)
    assert abs(got["alloc_chars"].sum() - budget) < 0.05
