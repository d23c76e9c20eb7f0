"""Invariants of the sequence-packing family (operators/packing.py).

The oracle hash-match (tests/test_oracle_parity.py) pins exact values;
these tests pin the PROPERTIES that make the layout a valid packing —
conservation, contiguity, bounded straddle — which would stay true
under any refactor of the bin geometry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_cs4225_spark.operators.dedup import _toks
from hadoop_cs4225_spark.operators.packing import (
    PACK_BUDGET,
    curriculum_phase_bins,
    sequence_pack_bins,
)
from hadoop_cs4225_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_pack_bins_conserve_tokens(spark):
    """Every token lands in exactly one bin: per-source bin totals must
    equal the raw corpus token count (nothing dropped, nothing double-
    counted)."""
    bins = sequence_pack_bins(spark, SF_ORACLE)
    packed = {
        r["source"]: r["t"]
        for r in bins.groupBy("source")
        .agg(F.sum("bin_tokens").alias("t"))
        .collect()
    }
    raw = {
        r["source"]: r["t"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(_toks())).alias("t"))
        .collect()
    }
    assert packed == raw


def test_pack_bins_contiguous_and_bounded(spark):
    """Bin ids per source are 0..n-1 with no gaps; every bin except
    possibly the last starts before the budget boundary it owns, so a
    bin's doc count is ≥ 1 and bins are non-empty by construction."""
    rows = sequence_pack_bins(spark, SF_ORACLE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        ids = [r["bin_id"] for r in rs]
        assert ids == list(range(len(ids))), source
        for r in rs:
            assert r["n_docs"] >= 1
            assert r["n_straddle"] <= 1, (
                "at most one doc per bin can cross its upper cut "
                "(only the doc spanning the boundary)",
                source,
                r,
            )
            assert r["first_doc"] <= r["last_doc"]


def test_curriculum_phases_partition_corpus(spark):
    """The NTILE phases cover every doc exactly once and phase sizes
    differ by at most one (NTILE's contract)."""
    rows = curriculum_phase_bins(spark, SF_ORACLE).collect()
    n_total = load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert [r["phase"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_bins"] >= 1


def test_ntile_expr_matches_sql_ntile(spark):
    """The window-free NTILE formula must equal SQL NTILE for a grid of
    (n, k) including k > 3 and n < k — the linear (r-1)*k div n + 1
    approximation coincides with NTILE only for k <= 3 (k=4, n=10:
    linear deals 3,2,3,2 vs NTILE's 3,3,2,2), so this pin is what
    licenses any future N_PHASES change."""
    import duckdb

    from hadoop_cs4225_spark.operators.packing import ntile_expr

    con = duckdb.connect()
    for n in (1, 2, 3, 7, 10, 11, 500, 503):
        for k in (2, 3, 4, 5, 7):
            want = [
                r[0]
                for r in con.sql(
                    f"SELECT NTILE({k}) OVER (ORDER BY r) FROM range(1, {n + 1}) t(r) ORDER BY r"
                ).fetchall()
            ]
            got = [
                r["tile"]
                for r in spark.sql(
                    f"SELECT r, {ntile_expr('r', 'n', k)} AS tile "
                    f"FROM (SELECT id + 1 AS r, {n}L AS n FROM range({n})) "
                    f"ORDER BY r"
                ).collect()
            ]
            assert got == want, (n, k, got[:20], want[:20])
    con.close()
