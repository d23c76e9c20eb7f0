"""The Pandas-UDF cosine variant must agree with the JVM-expression path
(modulo last-ulp summation order, hence 4-decimal comparison)."""

from __future__ import annotations

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_grouped_map_centroids_match_numpy_reference(spark):
    import numpy as np

    from hadoop_cs4225_spark.sources.tables import load_table

    got = {
        r.label: r
        for r in registry.QUERIES["label_centroid_stats"](spark, SF_SMOKE).collect()
    }
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        m = np.array(vecs, dtype=np.float64)
        c = m.mean(axis=0)
        d = np.sqrt(((m - c) ** 2).sum(axis=1))
        assert got[label].n_vecs == len(vecs)
        assert abs(got[label].centroid_norm - float(np.sqrt(c @ c))) < 1e-4
        assert abs(got[label].mean_dist - float(d.mean())) < 1e-4
        assert abs(got[label].max_dist - float(d.max())) < 1e-4


def test_pandas_udf_cosine_matches_jvm(spark):
    jvm = registry.QUERIES["cosine_topk_brute"](spark, SF_SMOKE).collect()
    arrow = registry.QUERIES["cosine_topk_pandas"](spark, SF_SMOKE).collect()
    assert [r.vec_id for r in jvm] == [r.vec_id for r in arrow]
    for a, b in zip(jvm, arrow):
        assert abs(a.cos_sim - b.cos_sim) < 1e-4
        assert a.label == b.label


def test_ivf_pq_index_probe_matches_inline_twin(spark):
    """The materialized-index probe (DPP over the partitioned code
    table) and the inline IVF-PQ query are two physical paths to the
    SAME logical answer — rows must match exactly, codes included."""
    inline = registry.QUERIES["ivf_pq_query_topk"](spark, SF_SMOKE).collect()
    probe = registry.QUERIES["ivf_pq_index_probe"](spark, SF_SMOKE).collect()
    assert inline == probe


def test_arrow_grouped_map_norms_match_jvm_fold(spark):
    """`label_norm_stats_arrow` (applyInArrow) must agree with the JVM
    expression fold to 4 decimals (numpy reassociates the square sums;
    the quantized outputs absorb last-ulp drift)."""
    from pyspark.sql import functions as F

    from hadoop_cs4225_spark.sources.tables import load_table

    got = {
        r.label: r
        for r in registry.QUERIES["label_norm_stats_arrow"](
            spark, SF_SMOKE
        ).collect()
    }
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    ref = {
        r.label: r
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.avg("nrm").alias("mean_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for label in ref:
        assert got[label].n_vecs == ref[label].n_vecs
        for c in ("mean_norm", "min_norm", "max_norm"):
            assert abs(got[label][c] - ref[label][c]) < 1e-4, (label, c)


def test_rp_distortion_matches_numpy_projection(spark):
    """The JL distortion histogram must equal a direct numpy projection
    with the same ±1 matrix, and concentrate around 1."""
    import math

    import numpy as np
    import pandas as pd

    from hadoop_cs4225_spark.operators.similarity import RP_OUT, RP_SIGNS

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64)
    S = np.asarray(RP_SIGNS)  # (16, 64)
    y2 = ((X @ S.T) ** 2).sum(axis=1) / RP_OUT
    x2 = (X**2).sum(axis=1)
    bins = np.floor(y2 / x2 * 100 + 0.5) / 100
    want = pd.Series(bins).value_counts().to_dict()
    got = {
        r["distortion_bin"]: r["n_vecs"]
        for _, r in registry.QUERIES["embedding_rp_distortion"](
            spark, SF_SMOKE
        )
        .toPandas()
        .iterrows()
    }
    # numpy reassociates the fold, so a ratio landing on a 0.005 bin
    # edge may bin one step off — allow per-bin neighbour slack but
    # require identical support and total mass
    assert sum(got.values()) == len(X)
    for b, n in got.items():
        near = sum(want.get(round(b + d, 2), 0) for d in (-0.01, 0.0, 0.01))
        assert n <= near, (b, n)
    # JL concentration: at k=16 the sketch variance is ~2/k, so the
    # bulk (not all) of the mass sits in a wide band around 1
    mass_near_1 = sum(n for b, n in got.items() if 0.3 <= b <= 2.0)
    assert mass_near_1 / len(X) > 0.9
    # mean distortion ~ 1 (unbiasedness of the ±1 sketch)
    mean = sum(b * n for b, n in got.items()) / len(X)
    assert abs(mean - 1.0) < 0.1
