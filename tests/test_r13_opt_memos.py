"""Round-13 optimization pins: every session-memoized shared frame
introduced this round must equal the inline computation it replaced.

The r13 optimization round moved repeated subtrees into ``dedup._memo``
frames (guide §2.4) and pointed index-definition queries at their written
layouts. Results are already oracle-pinned (test_oracle_parity /
replica_check); these tests pin the EQUIVALENCES the rewrites rely on, so
a future edit to one side cannot silently drift from the other:

- the audit composers' memoized ANN method frames == the registered
  method queries' live results;
- ``_bigram_doc_scores`` == the inline per-doc aggregate of
  ``_bigram_terms``;
- the memoized k-means fixpoint == one more in-line assignment against
  the memoized centroids (self-consistency of the Lloyd fixpoint split);
- ``minhash_signatures`` (now an index read) == ``signature_frame``
  computed from scratch;
- ``doc_winnowing_fingerprints`` (now an index fold) == the from-scratch
  winnowing map (via the shared ``_winnow_fp_rows`` definition).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_audit_method_frames_equal_live_queries(spark):
    from hadoop_cs4225_spark.operators.pq import pq_adc_query_topk
    from hadoop_cs4225_spark.operators.similarity import (
        ann_lsh_multiprobe_topk,
        ann_lsh_query_topk,
        ann_rerank_topk,
        audit_method_frames,
        ivf_ann_query_topk,
    )

    live = {
        "lsh": ann_lsh_query_topk,
        "lsh_multi": ann_lsh_multiprobe_topk,
        "ivf": ivf_ann_query_topk,
        "pq": pq_adc_query_topk,
        "rerank": ann_rerank_topk,
    }
    frames = audit_method_frames(spark, SF_SMOKE)
    assert set(frames) == set(live)
    for label, frame in frames.items():
        assert _rows(frame) == _rows(live[label](spark, SF_SMOKE)), label


def test_bigram_doc_scores_equal_inline_aggregate(spark):
    from hadoop_cs4225_spark.operators.text_analysis import (
        _bigram_doc_scores,
        _bigram_terms,
    )

    inline = (
        _bigram_terms(spark, SF_SMOKE)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t_s").cast("long").alias("s"),
        )
    )
    assert _rows(_bigram_doc_scores(spark, SF_SMOKE)) == _rows(inline)


def test_kmeans_assign_memo_is_fixpoint_of_cent_memo(spark):
    from hadoop_cs4225_spark.operators.clustering import (
        _assign,
        _kmeans_assign_frame,
        _kmeans_cent_frame,
        _ql_frame,
    )

    re_assigned = _assign(
        _ql_frame(spark, SF_SMOKE), _kmeans_cent_frame(spark, SF_SMOKE)
    )
    assert _rows(_kmeans_assign_frame(spark, SF_SMOKE)) == _rows(re_assigned)


def test_minhash_signatures_index_read_equals_from_scratch(spark):
    from hadoop_cs4225_spark.operators.dedup import signature_frame
    from hadoop_cs4225_spark.sources.tables import load_table

    scratch = signature_frame(load_table(spark, SF_SMOKE, "documents"))
    got = registry.QUERIES["minhash_signatures"](spark, SF_SMOKE)
    assert _rows(got) == _rows(scratch)


def test_winnowing_fingerprints_index_fold_equals_from_scratch(spark):
    from hadoop_cs4225_spark.operators.dedup import _winnow_fp_rows
    from hadoop_cs4225_spark.operators.text_analysis import WINNOW_W, _toks
    from hadoop_cs4225_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    fp = _winnow_fp_rows(docs)
    scratch = (
        fp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.min("fp").alias("sel_min"),
        )
        .join(
            docs.select(
                "doc_id",
                (F.size(_toks()) - 2).cast("long").alias("n_shingles"),
            ).where(F.col("n_shingles") >= WINNOW_W),
            "doc_id",
        )
    )
    got = registry.QUERIES["doc_winnowing_fingerprints"](spark, SF_SMOKE)
    assert _rows(got.select("doc_id", "n_selected", "sel_min", "n_shingles")) == _rows(
        scratch.select("doc_id", "n_selected", "sel_min", "n_shingles")
    )
