"""Round-10 operator invariants (the 10 new registrations; each also
has a DuckDB oracle run by test_oracle_parity.py on every pytest run —
these tests pin the ALGORITHMIC contracts the hash compare cannot see:
monotonicity, conservation identities, bound ranges)."""

from __future__ import annotations

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()


def _rows(spark, name, sf=SF_ORACLE):
    return registry.QUERIES[name](spark, sf).collect()


def test_kaplan_meier_monotone_and_conserved(spark):
    rows = _rows(spark, "orders_kaplan_meier")
    assert rows, "empty KM table"
    # survival starts <= 1 and never increases
    surv = [r.survival for r in rows]
    assert surv[0] <= 1.0 + 1e-9
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    # at-risk bookkeeping: n_risk decreases by exactly the previous
    # row's exits; the first row is at-risk for the whole cohort
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_risk == prev.n_risk - prev.n_events - prev.n_censored
    # censoring only happens at the horizon row
    for r in rows[:-1]:
        assert r.n_censored == 0 or r.t_days == 60
    assert rows[-1].t_days <= 60


def test_theil_decomposition_identities(spark):
    rows = _rows(spark, "lineitem_theil_decomposition")
    assert rows
    # revenue shares partition the total
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
    # within-group Theil is non-negative (Jensen), up to grid epsilon
    for r in rows:
        assert r.theil_within_g >= -1e-6, r
    # between terms sum to the between-group Theil, which is >= 0
    assert sum(r.between_term for r in rows) >= -1e-6


def test_unpivot_measure_counts_align(spark):
    rows = _rows(spark, "lineitem_unpivot_profile")
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    for flag, group in by_flag.items():
        # every flag contributes all four measures with identical n
        assert sorted(g.measure for g in group) == [
            "l_discount", "l_extendedprice", "l_quantity", "l_tax",
        ], flag
        assert len({g.n for g in group}) == 1, flag
        for g in group:
            assert g.min_val <= g.mean <= g.max_val


def test_chi2_topk_per_source_and_positive_assoc(spark):
    rows = _rows(spark, "token_chi2_feature_topk")
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    for src, group in per_src.items():
        assert len(group) <= 10, src
        scores = [g.chi2 for g in group]
        assert scores == sorted(scores, reverse=True), src
        for g in group:
            assert g.chi2 >= 0.0
            assert 0 < g.df_in_source <= g.df_global
            assert g.df_global >= 10  # min-df prune


def test_repetition_scores_ranges_and_flag(spark):
    rows = _rows(spark, "doc_repetition_scores")
    assert rows
    for r in rows:
        for v in (r.dup_bigram_frac, r.dup_trigram_frac, r.top_bigram_share):
            assert -1e-9 <= v <= 1.0 + 1e-9, r
        # the mode's share can never be below 1/n_bigrams
        assert r.top_bigram_share >= 1.0 / r.n_bigrams - 1e-6
        # flag consistency with the documented thresholds (grid-safe
        # strictly-above comparisons; allow the quantized boundary)
        expect = r.top_bigram_share > 0.18 + 1e-9 or r.dup_trigram_frac > 0.30 + 1e-9
        boundary = (
            abs(r.top_bigram_share - 0.18) < 1e-6
            or abs(r.dup_trigram_frac - 0.30) < 1e-6
        )
        assert r.repetition_flag == expect or boundary, r


def test_winnowing_pairs_shape(spark):
    rows = _rows(spark, "winnowing_dup_pairs")
    seen = set()
    for r in rows:
        assert r.doc_id_a < r.doc_id_b
        assert (r.doc_id_a, r.doc_id_b) not in seen
        seen.add((r.doc_id_a, r.doc_id_b))
        assert r.shared_fps >= 2
        assert 0.0 < r.containment <= 1.0 + 1e-9
    # the corpus has exact duplicates -> winnowing must find pairs
    assert rows, "winnowing found no pairs on a corpus with known dups"


def test_winnowing_catches_exact_dups(spark):
    """Every exact-duplicate doc pair long enough to fingerprint must
    appear: a shared full text shares ALL selected fingerprints (the
    winnowing guarantee at its strongest)."""
    import pandas as pd

    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    toks = docs.text.str.split().map(tuple)
    docs = docs.assign(k=toks, nt=toks.map(len))
    longdup = docs[docs.nt >= 6].groupby("k").doc_id.apply(list)
    expected = set()
    for ids in longdup:
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    got = {
        (r.doc_id_a, r.doc_id_b) for r in _rows(spark, "winnowing_dup_pairs")
    }
    # exact-dup pairs may still be dropped ONLY by the boilerplate
    # bucket cap; at this SF the cap never binds (dedup.py:120)
    missing = {p for p in expected if p not in got}
    assert not missing, f"exact dups missed: {sorted(missing)[:5]}"


def test_signq_hamming_bounds(spark):
    rows = _rows(spark, "embedding_signq_hamming_topk")
    assert len(rows) == 10
    hams = [r.hamming for r in rows]
    assert hams == sorted(hams)
    for r in rows:
        assert 0 <= r.hamming <= 64
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9
        assert r.vec_id != 0


def test_signq_words_match_numpy(spark):
    """Packed sign words must equal the numpy sign pattern bit for bit."""
    import numpy as np
    import pandas as pd

    from hadoop_cs4225_spark.operators.similarity import (
        _SIGNQ_WORD,
        _sign_word_col,
    )
    from hadoop_cs4225_spark.sources.tables import load_table

    emb = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select(
            "vec_id",
            _sign_word_col("embedding", 0).alias("w0"),
            _sign_word_col("embedding", 32).alias("w1"),
        )
        .limit(50)
        .collect()
    )
    pdf = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet").set_index("vec_id")
    for r in emb:
        v = np.asarray(pdf.loc[r.vec_id].embedding, dtype=np.float64)
        w0 = sum(1 << d for d in range(_SIGNQ_WORD) if v[d] > 0)
        w1 = sum(1 << (d - 32) for d in range(32, 64) if v[d] > 0)
        assert (r.w0, r.w1) == (w0, w1), r.vec_id


def test_knn_graph_degree_conservation(spark):
    rows = _rows(spark, "ann_lsh_knn_graph_stats")
    assert rows
    n_edges = rows[0].n_edges
    assert sum(r.degree * r.n_nodes for r in rows) == n_edges
    for r in rows:
        assert 1 <= r.degree <= 5
        assert 0.0 <= r.reciprocity <= 1.0 + 1e-9
        assert -1.0 <= r.mean_knn_cos <= 1.0
        assert r.n_mutual <= r.n_edges
        assert r.n_isolated >= 0


def test_ktruss_monotone_shrink(spark):
    rows = _rows(spark, "supplier_ktruss_peeling")
    assert [r.round for r in rows] == [1, 2]
    r1, r2 = rows
    assert r1.n_edges_out == r1.n_edges_in - r1.n_removed
    assert r2.n_edges_in == r1.n_edges_out  # rounds chain
    assert r2.n_edges_out <= r2.n_edges_in
    assert r1.n_removed >= 0 and r2.n_removed >= 0


def test_t_closeness_bounds(spark):
    (r,) = _rows(spark, "customer_t_closeness_audit")
    assert r.t == 0.4
    assert 0.0 <= r.max_tvd <= 1.0 + 1e-6  # TVD is a [0,1] metric
    assert 0 <= r.n_groups_above_t <= r.n_groups
    assert 0.0 <= r.pct_at_risk <= 1.0
    # a group above t must exist iff records are at risk
    assert (r.n_groups_above_t > 0) == (r.n_records_at_risk > 0)
