"""Third-derivation pins for the association/observability queries
(kappa, Kendall tau-b, observe metrics).

The oracle replica proves Spark==DuckDB; these derive each statistic a
THIRD way (brute force in numpy / composition of other registered
queries / a plain JVM aggregate) so a shared cross-engine mistake in
the formula itself cannot hide.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from hadoop_cs4225_spark.operators.algo_ops import (
    _KENDALL_BIN,
    orders_priority_price_kendall,
)
from hadoop_cs4225_spark.operators.observability import orders_scan_observed
from hadoop_cs4225_spark.operators.text_analysis import (
    lang_confusion_matrix,
    lang_id_agreement_kappa,
)
from tests.conftest import SF_SMOKE


def test_kendall_matches_bruteforce_pairs(spark):
    """Grid-collapsed C/D/tau must equal O(n^2) brute-force pair
    counting over the raw (priority, bin) rows at sf0.001."""
    got = orders_priority_price_kendall(spark, SF_SMOKE).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("i"),
            F.floor(F.col("o_totalprice") / _KENDALL_BIN)
            .cast("long")
            .alias("j"),
        )
        .collect()
    )
    i = np.array([r["i"] for r in rows])
    j = np.array([r["j"] for r in rows])
    n = len(i)
    di = np.sign(i[:, None] - i[None, :])
    dj = np.sign(j[:, None] - j[None, :])
    prod = di * dj
    conc = int((prod > 0).sum() // 2)
    disc = int((prod < 0).sum() // 2)
    assert got["n_orders"] == n
    assert got["n_concordant"] == conc
    assert got["n_discordant"] == disc
    n0 = n * (n - 1) / 2.0
    t1 = sum(c * (c - 1) / 2.0 for c in np.bincount(i) if c > 1)
    t2 = sum(
        c * (c - 1) / 2.0 for c in np.bincount(j.astype(int)) if c > 1
    )
    tau = (conc - disc) / math.sqrt((n0 - t1) * (n0 - t2))
    assert abs(got["tau_b"] - tau) < 1e-6


def test_kappa_matches_confusion_matrix_composition(spark):
    """kappa recomputed from the REGISTERED confusion matrix's cell
    counts must agree — the two queries share lang_id_heuristic, so a
    drift here means the kappa algebra itself broke."""
    got = lang_id_agreement_kappa(spark, SF_SMOKE).collect()[0]
    cells = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in lang_confusion_matrix(spark, SF_SMOKE).collect()
    }
    n = sum(cells.values())
    diag = sum(v for (a, p), v in cells.items() if a == p)
    rm: dict[str, int] = {}
    cm: dict[str, int] = {}
    for (a, p), v in cells.items():
        rm[a] = rm.get(a, 0) + v
        cm[p] = cm.get(p, 0) + v
    s = sum(rm[k] * cm.get(k, 0) for k in rm)
    assert got["n_docs"] == n and got["n_agree"] == diag
    assert abs(got["kappa"] - (n * diag - s) / (n * n - s)) < 1e-6
    # chance-corrected: kappa must sit strictly below raw agreement
    # whenever the classifier beats chance
    assert got["kappa"] < got["p_observed"]


def test_corr_matrix_matches_numpy(spark):
    """One-pass moment-sum correlations must equal np.corrcoef over
    the same quantized columns at sf0.001."""
    from hadoop_cs4225_spark.operators.algo_ops import (
        lineitem_correlation_matrix,
    )

    got = {
        (r["col_a"], r["col_b"]): (r["n_rows"], r["corr"])
        for r in lineitem_correlation_matrix(spark, SF_SMOKE).collect()
    }
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select(
            F.col("l_quantity").cast("long").alias("qty"),
            F.floor(F.col("l_extendedprice") / 10.0)
            .cast("long")
            .alias("price10"),
            F.floor(F.col("l_discount") * 100 + 0.5)
            .cast("long")
            .alias("disc100"),
            F.floor(F.col("l_tax") * 100 + 0.5).cast("long").alias("tax100"),
        )
        .collect()
    )
    feats = ("qty", "price10", "disc100", "tax100")
    mat = np.array([[r[f] for f in feats] for r in rows], dtype=np.float64)
    cc = np.corrcoef(mat, rowvar=False)
    assert len(got) == 6
    for (a, b), (n, corr) in got.items():
        assert n == len(rows)
        want = cc[feats.index(a), feats.index(b)]
        assert abs(corr - want) < 1e-6, (a, b, corr, want)


def test_spearman_matches_pandas_rank_corrcoef(spark):
    """Histogram-midrank Spearman must equal pandas average ranks +
    np.corrcoef at sf0.001 (scipy-free third derivation)."""
    import pandas as pd

    from hadoop_cs4225_spark.operators.algo_ops import doc_len_tok_spearman
    from hadoop_cs4225_spark.operators.dedup import _toks

    got = doc_len_tok_spearman(spark, SF_SMOKE).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(
            F.col("n_chars").alias("x"), F.size(_toks()).cast("long").alias("y")
        )
        .collect()
    )
    x = pd.Series([r["x"] for r in rows], dtype="float64")
    y = pd.Series([r["y"] for r in rows], dtype="float64")
    assert got["n_docs"] == len(x)
    pear = np.corrcoef(x, y)[0, 1]
    spear = np.corrcoef(x.rank(method="average"), y.rank(method="average"))[
        0, 1
    ]
    assert abs(got["pearson_r"] - pear) < 1e-6
    assert abs(got["spearman_rho"] - spear) < 1e-6
    # lengths and token counts should correlate strongly and the ranks
    # at least as tightly — non-vacuity of both statistics
    assert got["pearson_r"] > 0.5 and got["spearman_rho"] > 0.5


def test_auc_matches_bruteforce_pairs(spark):
    """Histogram rank-sum AUC must equal brute-force pair counting
    (pos>neg + 0.5*ties over all pos x neg pairs) at sf0.001, and the
    calibration/AUC queries must score the same docs."""
    from hadoop_cs4225_spark.operators.text_analysis import (
        _en_scored,
        quality_score_auc,
    )

    got = quality_score_auc(spark, SF_SMOKE).collect()[0]
    rows = _en_scored(spark, SF_SMOKE).collect()
    pos = np.array([r["p_s"] for r in rows if r["y"] == 1])
    neg = np.array([r["p_s"] for r in rows if r["y"] == 0])
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    assert abs(got["auc"] - auc) < 1e-6
    assert abs(got["gini_coef"] - (2 * auc - 1)) < 1e-6
    # non-vacuity: both classes populated and score actually varies
    # (synthetic lang labels barely correlate with markers at sf0.001,
    # so the AUC value itself is near chance — the exactness pin above
    # is the real claim)
    assert len(pos) > 0 and len(neg) > 0
    assert len(np.unique(np.concatenate([pos, neg]))) > 1
    assert 0.0 <= got["auc"] <= 1.0


def test_observe_metrics_equal_plain_aggregate(spark):
    got = orders_scan_observed(spark, SF_SMOKE).collect()[0]
    want = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("long")
            .alias("n_open"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("total_cents"),
            F.min("o_orderkey").cast("long").alias("min_key"),
            F.max("o_orderkey").cast("long").alias("max_key"),
        )
        .collect()[0]
    )
    assert got.asDict() == want.asDict()
