"""Registry-level audit of the 11 terminal rows-only queries
(VERDICT r10 task 7): every registered query WITHOUT a DuckDB oracle
must land inside the error band of an EXACT twin — a registered
oracled query, an exact DuckDB aggregate over the same parquet, or a
byte-level Python replica — so the no-oracle set is machine-checked as
a set, not just documented per-query in scattered test files.

One parametrized test, one case per rows-only query. The parametrize
list is asserted equal to the registry's actual no-oracle set, so a
future rows-only registration without a twin case here fails loudly.
"""

from __future__ import annotations

import math

import pytest

from hadoop_cs4225_spark import registry
from tests.conftest import SF_ORACLE

registry.load_all()

#: rows-only query -> twin check implemented below. Must stay equal to
#: the registry's no-oracle set (asserted in test_no_oracle_set_is_covered).
_CASES = (
    "approx_distinct_parts",
    "sketch_distinct_users_by_type",
    "topk_users_approx",
    "event_freq_cms",
    "order_value_percentiles_approx",
    "orders_profile",
    "cosine_topk_pandas",
    "label_centroid_stats",
    "label_norm_stats_arrow",
    "media_byte_features",
    "media_byte_features_arrow",
)


def test_no_oracle_set_is_covered():
    no_oracle = {q for q in registry.QUERIES if q not in registry.ORACLES}
    assert no_oracle == set(_CASES), (
        "rows-only registry drifted from the twin-audit cases: "
        f"missing={no_oracle - set(_CASES)}, stale={set(_CASES) - no_oracle}"
    )


def _rows(spark, name):
    return registry.QUERIES[name](spark, SF_ORACLE).collect()


# --- per-case twin checks ---------------------------------------------------


def _check_approx_distinct_parts(spark, duck):
    """HLL++ rsd=0.05: estimate within 4*rsd of the exact distinct."""
    (row,) = _rows(spark, "approx_distinct_parts")
    exact_p, exact_s = duck.sql(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_suppkey)"
        " FROM lineitem"
    ).fetchone()
    assert abs(row.approx_parts - exact_p) <= 0.20 * exact_p + 2
    assert abs(row.approx_supps - exact_s) <= 0.20 * exact_s + 2


def _check_sketch_distinct_users_by_type(spark, duck):
    """Datasketches HLL lgK=12 (rsd ~1.6%): per-type and union
    estimates within a 10% band of the exact distincts."""
    rows = {r.event_type: r.approx_users for r in
            _rows(spark, "sketch_distinct_users_by_type")}
    exact = dict(duck.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events"
        " GROUP BY event_type"
    ).fetchall())
    exact["ALL"] = duck.sql(
        "SELECT COUNT(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert set(rows) == set(exact)
    for t, est in rows.items():
        assert abs(est - exact[t]) <= 0.10 * exact[t] + 2, (t, est, exact[t])


def _check_topk_users_approx(spark, duck):
    """approx_top_k with maxItemsTracked=10000: EXACT below the bound.
    The test data's per-type distinct users sit far below 10000, so
    the returned (user_id, n) must equal the true top-3 under the
    (n desc, user_id) total order."""
    per_type_distinct = dict(duck.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events"
        " GROUP BY event_type"
    ).fetchall())
    assert max(per_type_distinct.values()) < 10000, "band no longer exact"
    truth = {}
    for t, uid, n, rk in duck.sql(
        "SELECT event_type, user_id, n, rk FROM ("
        "  SELECT event_type, user_id, COUNT(*) AS n,"
        "    ROW_NUMBER() OVER (PARTITION BY event_type"
        "      ORDER BY COUNT(*) DESC, user_id) AS rk"
        "  FROM events GROUP BY event_type, user_id) WHERE rk <= 3"
    ).fetchall():
        truth[(t, rk)] = (uid, n)
    for r in _rows(spark, "topk_users_approx"):
        uid, n = truth[(r.event_type, r.rank)]
        assert r.n == n, (r, n)
        # a count tie at the boundary may legally return either user
        if r.user_id != uid:
            tied = duck.sql(
                "SELECT COUNT(*) FROM (SELECT user_id, COUNT(*) AS n"
                " FROM events WHERE event_type = ? GROUP BY user_id)"
                " WHERE n = ?", params=[r.event_type, n]
            ).fetchone()[0]
            assert tied > 1, (r, uid)


def _check_event_freq_cms(spark, duck):
    """CMS (eps=1%, conf=95%, seed 42): n_events exactly matches the
    per-type counts; the sketch blob is deterministic; point queries
    decoded through the JVM CountMinSketch respect the one-sided CMS
    bound exact <= estimate <= exact + eps*N on the 5 hottest users."""
    rows = {r.event_type: r for r in _rows(spark, "event_freq_cms")}
    exact_n = dict(duck.sql(
        "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
    ).fetchall())
    assert {t: r.n_events for t, r in rows.items()} == exact_n
    rows2 = {r.event_type: r for r in _rows(spark, "event_freq_cms")}
    assert {t: r.cms_hex for t, r in rows.items()} == {
        t: r.cms_hex for t, r in rows2.items()
    }
    jvm = spark.sparkContext._jvm
    for t, r in rows.items():
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes.fromhex(r.cms_hex)
        )
        hot = duck.sql(
            "SELECT user_id, COUNT(*) AS n FROM events WHERE event_type = ?"
            " GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5",
            params=[t],
        ).fetchall()
        for uid, n in hot:
            est = cms.estimateCount(int(uid))
            assert n <= est <= n + math.ceil(0.01 * r.n_events), (t, uid, n, est)


def _check_order_value_percentiles_approx(spark, duck):
    """approx_percentile(accuracy=10000): the returned value's true
    quantile rank must sit within 1/accuracy (+1 rank slack) of the
    requested percentile, per status group."""
    for r in _rows(spark, "order_value_percentiles_approx"):
        n = duck.sql(
            "SELECT COUNT(*) FROM orders WHERE o_orderstatus = ?",
            params=[r.o_orderstatus],
        ).fetchone()[0]
        for p, v in ((0.5, r.p50_approx), (0.9, r.p90_approx)):
            le, lt = duck.sql(
                "SELECT SUM(CASE WHEN o_totalprice <= ? THEN 1 ELSE 0 END),"
                "       SUM(CASE WHEN o_totalprice <  ? THEN 1 ELSE 0 END)"
                " FROM orders WHERE o_orderstatus = ?",
                params=[v, v, r.o_orderstatus],
            ).fetchone()
            slack = n / 10000.0 + 1
            assert lt <= p * n + slack and le >= p * n - slack, (
                r.o_orderstatus, p, v, lt, le, n
            )


def _check_orders_profile(spark, duck):
    """HLL profile vs the oracled exact twin: exact columns equal,
    n_distinct within 4*rsd (rsd=0.05)."""
    approx = {r.column_name: r for r in _rows(spark, "orders_profile")}
    exact = {r.column_name: r for r in _rows(spark, "orders_profile_exact")}
    assert set(approx) == set(exact)
    for c, a in approx.items():
        e = exact[c]
        assert (a.n_rows, a.n_null, a.min_s, a.max_s) == (
            e.n_rows, e.n_null, e.min_s, e.max_s
        ), c
        assert abs(a.n_distinct - e.n_distinct) <= 0.20 * e.n_distinct + 2, c


def _check_cosine_topk_pandas(spark, duck):
    """Arrow-UDF variant vs the oracled JVM fold: same vec_ids in the
    same order, cosine equal to 4 decimals (numpy reassociation)."""
    pand = _rows(spark, "cosine_topk_pandas")
    brute = _rows(spark, "cosine_topk_brute")
    assert [r.vec_id for r in pand] == [r.vec_id for r in brute]
    for a, b in zip(pand, brute):
        assert abs(a.cos_sim - b.cos_sim) < 1e-4


def _numpy_embeddings():
    import numpy as np
    import pandas as pd

    pdf = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return pdf, m


def _check_label_centroid_stats(spark, duck):
    """applyInPandas grouped map vs a driver-side numpy replica."""
    import numpy as np

    pdf, m = _numpy_embeddings()
    rows = {r.label: r for r in _rows(spark, "label_centroid_stats")}
    for lbl in sorted(pdf["label"].unique()):
        g = m[(pdf["label"] == lbl).to_numpy()]
        c = g.mean(axis=0)
        d = np.sqrt(((g - c) ** 2).sum(axis=1))
        r = rows[int(lbl)]
        assert r.n_vecs == len(g)
        assert abs(r.centroid_norm - math.sqrt(c @ c)) < 1e-5
        assert abs(r.mean_dist - d.mean()) < 1e-5
        assert abs(r.max_dist - d.max()) < 1e-5


def _check_label_norm_stats_arrow(spark, duck):
    """applyInArrow grouped map vs a driver-side numpy replica."""
    import numpy as np

    pdf, m = _numpy_embeddings()
    norms = np.sqrt((m * m).sum(axis=1))
    rows = {r.label: r for r in _rows(spark, "label_norm_stats_arrow")}
    for lbl in sorted(pdf["label"].unique()):
        g = norms[(pdf["label"] == lbl).to_numpy()]
        r = rows[int(lbl)]
        assert r.n_vecs == len(g)
        assert abs(r.mean_norm - g.mean()) < 1e-5
        assert abs(r.min_norm - g.min()) < 1e-5
        assert abs(r.max_norm - g.max()) < 1e-5


def _media_replica():
    """Byte-exact Python replica of the synthetic media features:
    content = UTF-8 text bytes, hist_bin7 = count of bytes in
    [112, 128) (bin 7 of 16 over 0..255), n_frames = ceil(len/FRAME)."""
    import pandas as pd

    from hadoop_cs4225_spark.functions.multimodal import FRAME_BYTES

    pdf = pd.read_parquet(f"{SF_ORACLE}/documents.parquet")
    pdf = pdf[pdf["doc_id"] <= 100]
    out = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        b = str(text).encode("utf-8")
        mt = ("image", "audio", "video")[int(doc_id) % 3]
        hist7 = sum(1 for x in b if 112 <= x < 128)
        out[int(doc_id)] = (mt, len(b), -(-len(b) // FRAME_BYTES), hist7)
    return out


def _check_media_byte_features(spark, duck):
    """mapInPandas features vs the byte-exact Python replica."""
    replica = _media_replica()
    rows = _rows(spark, "media_byte_features")
    assert {r.doc_id for r in rows} == set(replica)
    for r in rows:
        assert (
            r.media_type, r.content_len, r.n_frames, r.hist_bin7
        ) == replica[r.doc_id], r


def _check_media_byte_features_arrow(spark, duck):
    """mapInArrow twin must match the mapInPandas path EXACTLY (same
    integers; no float surface at all)."""
    a = sorted(map(tuple, _rows(spark, "media_byte_features")))
    b = sorted(map(tuple, _rows(spark, "media_byte_features_arrow")))
    assert a == b and a


_CHECKS = {name: globals()[f"_check_{name}"] for name in _CASES}


@pytest.mark.parametrize("name", _CASES)
def test_rows_only_query_matches_exact_twin(spark, duck, name):
    _CHECKS[name](spark, duck)
