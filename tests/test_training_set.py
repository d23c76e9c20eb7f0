"""Pins for the end-to-end pipeline composition (training_set.py).

The cross-engine value check itself is covered by the registry-wide
oracle replica (test_oracle_parity runs every oracle); these tests pin
what that comparison cannot: consistency with the CONSTITUENT
registered stages, the non-vacuity of every stage at the test SF, and
the capped_keep helper's equivalence to the plain window-rank
formulation it replaces.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hadoop_cs4225_spark.operators.sampling import capped_keep
from hadoop_cs4225_spark.operators.training_set import (
    TRAIN_CAP_K,
    corpus_to_training_set,
)
from hadoop_cs4225_spark.registry import get_queries
from tests.conftest import SF_SMOKE


def test_stage_funnel_monotone_and_consistent(spark):
    rows = {
        r["source"]: r
        for r in corpus_to_training_set(spark, SF_SMOKE).collect()
    }
    qs = get_queries()

    # per-source totals must equal the raw documents table
    totals = {
        r["source"]: r["n"]
        for r in qs["dedup_exact_summary"](spark, SF_SMOKE)
        .sparkSession.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {s: r["n_total"] for s, r in rows.items()} == totals

    for r in rows.values():
        seq = [
            r["n_total"],
            r["n_after_dedup"],
            r["n_after_quality"],
            r["n_after_decon"],
            r["n_kept"],
        ]
        assert seq == sorted(seq, reverse=True), r
        assert r["n_kept"] <= TRAIN_CAP_K
        assert r["n_straddle"] <= r["n_kept"]
        # concat-and-chunk: first-token bins can never exceed doc count
        # nor the token stream's window count + 1
        assert r["n_bins"] <= r["n_kept"]

    # the dedup stage must agree with dedup_canonical_keep's drop count
    dropped = (
        qs["dedup_canonical_keep"](spark, SF_SMOKE)
        .agg(F.sum("n_dropped").alias("d"))
        .collect()[0]["d"]
    )
    n_total = sum(r["n_total"] for r in rows.values())
    n_dedup = sum(r["n_after_dedup"] for r in rows.values())
    assert n_total - n_dedup == dropped


def test_every_stage_binds_at_smoke_sf(spark):
    """The zorder lesson: a stage whose predicate never fires proves
    nothing. At every test SF each stage must actually drop documents
    and the packing must actually cut windows."""
    rows = corpus_to_training_set(spark, SF_SMOKE).collect()
    tot = lambda c: sum(r[c] for r in rows)  # noqa: E731
    assert tot("n_after_dedup") < tot("n_total")
    assert tot("n_after_quality") < tot("n_after_dedup")
    assert tot("n_after_decon") < tot("n_after_quality")
    assert tot("n_kept") < tot("n_after_decon")  # the cap binds somewhere
    assert any(r["n_kept"] == TRAIN_CAP_K for r in rows)
    assert any(r["n_kept"] < TRAIN_CAP_K for r in rows)  # ...not everywhere
    assert tot("n_bins") > len(rows)  # some source spans multiple windows
    assert tot("n_straddle") > 0


def test_materialize_training_set_layout_and_consistency(spark, tmp_path):
    """The written shards must agree with the report query (same kept
    docs, same window layout), lay out partitionBy(source) directories,
    and honor the exists-check write contract."""
    import os

    import pytest
    from pyspark.sql.utils import AnalysisException

    from hadoop_cs4225_spark.operators.training_set import (
        TRAIN_PACK_BUDGET,
        materialize_training_set,
    )

    out = str(tmp_path / "shards")
    shards = materialize_training_set(spark, SF_SMOKE, out)
    report = {
        r["source"]: r for r in corpus_to_training_set(spark, SF_SMOKE).collect()
    }
    got = {
        r["source"]: (r["n_kept"], r["n_bins"])
        for r in shards.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.countDistinct("window_id").alias("n_bins"),
        )
        .collect()
    }
    want = {
        s: (r["n_kept"], r["n_bins"])
        for s, r in report.items()
        if r["n_kept"] > 0
    }
    assert got == want
    # window_pos is the offset within the window
    bad = shards.where(
        (F.col("window_pos") != F.col("off") % TRAIN_PACK_BUDGET)
        | (F.col("window_pos") < 0)
        | (F.col("window_pos") >= TRAIN_PACK_BUDGET)
    ).count()
    assert bad == 0
    # physical layout: one directory per source (directory-prunable)
    dirs = {d for d in os.listdir(out) if d.startswith("source=")}
    assert dirs == {f"source={s}" for s in want}
    # exists-check contract: a re-run must refuse, overwrite must work
    n_first = shards.count()  # before overwrite invalidates these files
    with pytest.raises(AnalysisException):
        materialize_training_set(spark, SF_SMOKE, out)
    again = materialize_training_set(spark, SF_SMOKE, out, mode="overwrite")
    assert again.count() == n_first


def test_capped_keep_equals_plain_window_rank(spark):
    """capped_keep's bounded-bucket plan must select exactly the rows
    the naive whole-source ROW_NUMBER formulation selects (bucket order
    refines hash order; doc_id breaks ties)."""
    from hadoop_cs4225_spark.functions.hashing import hash60_seeded
    from hadoop_cs4225_spark.operators.sampling import _CAP_SEED

    base = (
        spark.range(500)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias(
                "source"
            ),
        )
    )
    k = 30
    got = {
        (r["source"], r["doc_id"])
        for r in capped_keep(base, k).collect()
    }
    w = Window.partitionBy("source").orderBy(
        hash60_seeded(F.col("doc_id").cast("string"), _CAP_SEED), "doc_id"
    )
    want = {
        (r["source"], r["doc_id"])
        for r in base.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .collect()
    }
    assert got == want and len(got) == 7 * k
