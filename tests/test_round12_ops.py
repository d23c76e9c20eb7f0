"""Round-12 operator invariants (the 4 net-new registrations, within
the <=15/round rotation pace — driver rows come with the r13 window).
Each is oracled, so test_oracle_parity.py hash-checks all four on every
pytest run; these tests pin the algorithmic contracts."""

from __future__ import annotations

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_keyword_tagging_contract(spark):
    """Every dictionary tag surfaces; hit counts reconcile with a
    direct token-membership count; top_source really is the modal
    source (count desc, source asc)."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.operators.text_analysis import _TAG_DICT, _toks
    from hadoop_cs4225_spark.sources.tables import load_table

    rows = {r.tag: r for r in _rows(spark, "doc_keyword_tag_counts")}
    assert set(rows) == {tag for tag, _ in _TAG_DICT}
    docs = load_table(spark, SF_ORACLE, "documents")
    toks = docs.select("doc_id", "source", F.explode(_toks()).alias("t"))
    for tag, terms in _TAG_DICT:
        direct = toks.where(F.col("t").isin(*terms))
        n_hits = direct.count()
        n_docs = direct.select("doc_id").distinct().count()
        assert rows[tag].n_hits == n_hits, tag
        assert rows[tag].n_docs == n_docs, tag
        per_src = {
            r.source: r.c
            for r in direct.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        best = sorted(per_src.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert rows[tag].top_source == best, tag


def test_seasonal_naive_mase_contract(spark):
    """Test window is exactly the trailing 12 months per priority, MAEs
    are positive cents, and MASE reconciles with the two MAE columns
    (to rounding)."""
    rows = _rows(spark, "orders_seasonal_naive_mase")
    assert len(rows) == 5  # TPC-H priorities
    # the window is the trailing 12 CALENDAR months of the global
    # series; a priority missing an observation in one of them (sparse
    # month at small SF) tests on the remainder
    assert max(r.n_test_months for r in rows) == 12
    for r in rows:
        assert 1 <= r.n_test_months <= 12, r
        assert r.test_mae_cents > 0 and r.scale_mae_cents > 0, r
        approx = r.test_mae_cents / r.scale_mae_cents
        assert abs(r.mase - approx) < 0.01, (r.mase, approx)


def test_residual_quant_audit_honest_negative(spark):
    """With deterministic PSEUDO-centroids the residual is LARGER than
    the raw vector, so the audit must report plain int8 winning for
    every label — the gate that stops a bad RQ rollout. Errors are
    bounded by half the quantization step (scale/2 <= absmax/254...
    actually err <= scale/2 by construction of round-to-nearest)."""
    rows = _rows(spark, "embedding_residual_quant_audit")
    assert rows
    for r in rows:
        assert r.avg_err_residual > r.avg_err_plain, r
        assert 0 < r.avg_err_plain < r.worst_err_residual or r.n_vecs == 1


def test_dedup_survivorship_reconciles_with_canonical_keep(spark):
    """Per-source drop counts must sum to the cluster-level n_dropped
    total of dedup_canonical_keep (same keeper rule), totals must cover
    every source, and fractions stay in [0, 1]."""
    surv = _rows(spark, "dedup_survivorship_report")
    keep = _rows(spark, "dedup_canonical_keep")
    assert sum(r.n_dropped for r in surv) == sum(r.n_dropped for r in keep)
    from hadoop_cs4225_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(surv) == n_sources
    assert sum(r.n_docs for r in surv) == docs.count()
    for r in surv:
        assert 0 <= r.doc_drop_frac <= 1 and 0 <= r.char_drop_frac <= 1, r
        assert r.n_dropped <= r.n_clustered <= r.n_docs, r
