"""The Pandas-UDF cosine variant must agree with the JVM-expression path
(modulo last-ulp summation order, hence 4-decimal comparison)."""

from __future__ import annotations

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_pandas_udf_cosine_matches_jvm(spark):
    jvm = registry.QUERIES["cosine_topk_brute"](spark, SF_SMOKE).collect()
    arrow = registry.QUERIES["cosine_topk_pandas"](spark, SF_SMOKE).collect()
    assert [r.vec_id for r in jvm] == [r.vec_id for r in arrow]
    for a, b in zip(jvm, arrow):
        assert abs(a.cos_sim - b.cos_sim) < 1e-4
        assert a.label == b.label
